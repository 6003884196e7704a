"""Temporal batching: same-second records annotated together (SURVEY.md W4/W5).

The reference keys valid records by the first 19 chars of the timestamp
string (second granularity), opens a 1 s tumbling event-time window, and
re-emits every element annotated with ``temporal_batch_size`` (the
number of same-timestamp records), ``timestamp_key`` and
``temporal_ordering='compliant'`` (flink_process/flink_process.py:23-54,
298-316). Invalid records bypass the window and are unioned back (:319).

Batch analog: an analytic count over the key -- one shuffle, no
``collect_list`` materialization (at 100 TB a collect_list of a hot
second would OOM an executor; a count never does). The streaming analog
(streaming/pipeline.py) uses ``window(event_time, '1 second')`` +
watermark with the same annotation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temporal_batch(valid: DataFrame) -> DataFrame:
    """Annotate each valid row with its same-second batch size."""
    key = F.substring(F.col("timestamp"), 1, 19)
    w = Window.partitionBy(key)
    return (
        valid.withColumn("timestamp_key", key)
        .withColumn("temporal_batch_size", F.count(F.lit(1)).over(w))
        .withColumn("temporal_ordering", F.lit("compliant"))
    )


def union_with_invalid(batched_valid: DataFrame, invalid: DataFrame) -> DataFrame:
    """W5: invalids bypass temporal ordering and rejoin the stream."""
    return batched_valid.unionByName(invalid, allowMissingColumns=True)
