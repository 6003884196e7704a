"""Structured Streaming pipeline builders (SURVEY.md section 2.5).

The SAME silver operators used in batch (operators/validate.py etc.)
applied to a streaming DataFrame -- the declarative plan is identical;
only the source and the stateful dedup/window operators differ:

- dedup (D1): ``dropDuplicates`` on the composite key = the reference's
  unbounded ValueState semantics; ``dropDuplicatesWithinWatermark`` =
  the bounded-state mode that survives 100 TB/day (documented delta:
  duplicates farther apart than the watermark are NOT suppressed).
- temporal batch (W4): 1 s tumbling event-time window over the 5 s
  watermark; emits each record annotated with its same-second batch
  size, invalids bypass and union back (W5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.validate import validate_enrich


def silver_stream(
    bronze: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    bounded_state: bool = True,
) -> DataFrame:
    """bronze stream -> validated+deduped silver stream."""
    silver = validate_enrich(bronze, cfg)
    # dedup needs the watermark column when bounded; invalid rows have
    # null event_time so they are deduped on the shared invalid_key in
    # the unbounded mode (the reference's D1 quirk) -- in bounded mode
    # we exclude them from dedup and union back (documented delta).
    if bounded_state:
        valid = (
            silver.filter(F.col("status") == "valid")
            .withWatermark("event_time", f"{cfg.watermark_seconds} seconds")
            .dropDuplicatesWithinWatermark(["dedup_key"])
        )
        invalid = silver.filter(F.col("status") == "invalid")
        return valid.unionByName(invalid)
    return silver.dropDuplicates(["dedup_key"])


def temporal_batch_stream_annotated(
    silver: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Reference-faithful streaming W4: when the watermark closes a 1 s
    window, re-emit EVERY record annotated with its same-second batch
    size (flink_process/flink_process.py:23-54 collects the window then
    emits each element).

    Shape: window agg collecting the row structs, then explode after
    the window closes. Scale note: the buffered state is bounded by
    one second of arrivals per key -- at extreme per-second rates use
    ``temporal_batch_stream`` (count-only, no row buffering) and join
    the size back downstream.
    """
    valid = silver.filter(F.col("status") == "valid")
    cols = [c for c in valid.columns]
    agg = (
        valid.withWatermark("event_time", f"{cfg.watermark_seconds} seconds")
        .groupBy(
            F.window("event_time", f"{cfg.temporal_window_seconds} seconds"),
            F.substring("timestamp", 1, 19).alias("timestamp_key"),
        )
        .agg(
            F.collect_list(F.struct(*cols)).alias("_rows"),
            F.count(F.lit(1)).alias("temporal_batch_size"),
        )
    )
    exploded = agg.select(
        "timestamp_key",
        "temporal_batch_size",
        F.explode("_rows").alias("_r"),
    )
    return exploded.select(
        "_r.*",
        "timestamp_key",
        "temporal_batch_size",
        F.lit("compliant").alias("temporal_ordering"),
    )


def temporal_counts_to_files(
    silver: DataFrame,
    path: str,
    checkpoint: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """Phase 1 of the scale-safe annotated W4: write the per-second
    count aggregate (no row buffering) to a parquet directory that
    phase 2 re-reads as a stream. Returns the started StreamingQuery.

    The window struct is flattened to (window_start, window_end) so the
    file-stream schema round-trips."""
    counts = temporal_batch_stream(silver, cfg).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "timestamp_key",
        "temporal_batch_size",
        "temporal_ordering",
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_temporal_counts(spark, path: str) -> DataFrame:
    """Phase-2 reader for the counts directory written by
    `temporal_counts_to_files`."""
    schema = (
        "window_start timestamp, window_end timestamp, timestamp_key string, "
        "temporal_batch_size bigint, temporal_ordering string"
    )
    return spark.readStream.schema(schema).parquet(path)


def temporal_annotated_rejoin(
    silver: DataFrame,
    counts: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Scale-safe annotated W4: stream-stream join of the record
    stream with the closed-window count stream (from
    `stream_temporal_counts`) -- every record re-emitted with its final
    same-second batch size, NO ``collect_list``.

    Why this shape: Spark cannot join an aggregated streaming DF with
    another stream inside one query, so the count aggregate runs as its
    own query into an intermediate sink (parquet here; a compacted
    Kafka topic at scale) and joins back as a plain append stream.
    Versus `temporal_batch_stream_annotated` (reference-faithful
    collect_list) the state story changes from ONE monolithic array
    value per hot second -- which must deserialize as a single object
    and can spike an executor -- to per-row join-state entries in the
    state store (RocksDB-spillable, evicted by the watermark once the
    window passes). The join carries the canonical event-time RANGE
    condition (row.event_time in [window_start, window_end)) on top of
    the timestamp_key equality -- a derived window-struct column would
    be a second event-time column on the row side, which Spark rejects;
    the range form is what the symmetric hash join uses to compute the
    state watermark and clean up."""
    valid = silver.filter(F.col("status") == "valid")
    rows = valid.withWatermark(
        "event_time", f"{cfg.watermark_seconds} seconds"
    ).withColumn("timestamp_key", F.substring("timestamp", 1, 19))
    c = counts.withWatermark(
        "window_start", f"{cfg.watermark_seconds} seconds"
    ).select(
        "window_start",
        "window_end",
        F.col("timestamp_key").alias("_ck"),
        "temporal_batch_size",
        "temporal_ordering",
    )
    joined = rows.join(
        c,
        (rows["timestamp_key"] == c["_ck"])
        & (rows["event_time"] >= c["window_start"])
        & (rows["event_time"] < c["window_end"]),
        "inner",
    )
    out_cols = [col for col in valid.columns] + [
        "timestamp_key",
        "temporal_batch_size",
        "temporal_ordering",
    ]
    return joined.select(*out_cols)


def full_stream(
    bronze: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    bounded_state: bool = False,
) -> DataFrame:
    """The reference's complete dataflow as ONE streaming query:
    validate -> dedup -> temporal annotation (W4, watermark-gated) ->
    union with the invalid bypass (W5) -> route (F3/F4).

    The union joins an aggregated (window-closed) branch with a plain
    append branch -- both append-mode, so the combined query stays
    append. Invalid rows flow through with null temporal columns,
    exactly like the batch `operators/pipeline.batch_pipeline`.
    """
    from ..operators.route import route

    silver = silver_stream(bronze, cfg, bounded_state=bounded_state)
    annotated = temporal_batch_stream_annotated(silver, cfg)
    invalid = silver.filter(F.col("status") == "invalid")
    merged = annotated.unionByName(invalid, allowMissingColumns=True)
    return route(merged)


def session_stream(
    silver: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    gap_seconds: int = 3,
) -> DataFrame:
    """Activity bursts per severity level via streaming session_window.

    A session = consecutive valid readings of the same level with gaps
    < ``gap_seconds``. The watermark closes a session once event time
    moves past last_ts + gap + watermark; state per open session is one
    (start, end, count) triple -- bounded by the number of ACTIVE keys,
    not history, so it scales with key cardinality only. Batch-mode
    `session_window` (plans/relational2.session_window_events) is the
    oracle-paired ground truth for the merge semantics; the streaming
    form is checked against a batch run over the same fixture.
    """
    valid = silver.filter(F.col("status") == "valid")
    return (
        valid.withWatermark("event_time", f"{cfg.watermark_seconds} seconds")
        .groupBy(
            "level",
            F.session_window("event_time", f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "level",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def temporal_batch_stream(
    silver: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """W4 streaming analog: per (1 s window, timestamp_key) counts.

    Streaming append mode cannot re-emit individual rows with their
    final batch size before the watermark closes the window, so the
    streaming shape is the closed-window aggregate (timestamp_key,
    temporal_batch_size, window) -- the batch operator
    (operators/temporal.py) annotates rows 1:1 like the reference and
    is cross-checked against the oracle; this streaming variant is
    checked for agreement with it in tests/test_streaming.py.
    """
    valid = silver.filter(F.col("status") == "valid")
    return (
        valid.withWatermark("event_time", f"{cfg.watermark_seconds} seconds")
        .groupBy(
            F.window("event_time", f"{cfg.temporal_window_seconds} seconds"),
            F.substring("timestamp", 1, 19).alias("timestamp_key"),
        )
        .agg(F.count(F.lit(1)).alias("temporal_batch_size"))
        .withColumn("temporal_ordering", F.lit("compliant"))
    )
