"""Event-time normalization + parse (SURVEY.md P4/W1).

The reference strips a ``+TZ`` suffix, a trailing ``Z``, and fractional
seconds, then parses ``%Y-%m-%d %H:%M:%S`` returning None on failure
(flink_process/flink_process.py:56-84). We do the same with one
regexp_replace + try_to_timestamp -- null-on-fail, no exceptions, stays
in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strip, in one pass: fractional seconds, +TZ suffix, trailing Z
_STRIP_RE = r"(\.\d*)|(\+.*$)|(Z$)"
TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def normalize_event_time(captured_time: Column) -> Column:
    cleaned = F.regexp_replace(captured_time, _STRIP_RE, "")
    return F.try_to_timestamp(cleaned, F.lit(TS_FORMAT))
