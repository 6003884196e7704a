"""SparkSession factory.

Local test/bench sessions run on ``local[N]`` (one JVM); the same config
block is what we would ship to a 1000-executor cluster, with the two
local-only knobs (master, driver memory) supplied by the submitter.

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned partition counts at any SF.
- ``spark.sql.shuffle.partitions`` is a *seed* for AQE, set to ~2-3x the
  core count locally; on a real cluster it should be ~2-3x total cores
  and AQE coalesces down per stage.
- Arrow enabled so the deliberate Pandas-UDF islands (alert cooldown,
  multimodal decode) batch-transfer instead of pickling row-at-a-time.
- Session timezone pinned UTC so event-time semantics match the DuckDB
  oracle and are cluster-location independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "big_data_streaming_dashboard_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    n = cpus or cpu_count()
    shuffle = shuffle_partitions or max(n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # the driver fixtures store events.ts as TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as long + convert in
        # tables.load_table (DuckDB truncates the same way -> micros parity)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # r12 (r11 verdict item 3): when a deployment selects the RocksDB
        # state-store provider (the stateful operators' documented posture
        # for large key sets), commit a per-batch CHANGELOG instead of a
        # full snapshot upload -- measured on the sf0.1 funnel/anomaly
        # operators split into 8 micro-batches: summed per-partition
        # commitTimeMs halves (11-19 s -> 5-8.5 s/batch across 32 stores),
        # wall ~0.2-0.3 s/batch better; snapshots still happen, async, at
        # the maintenance cadence. No-op under the default HDFS provider.
        # Full measurement table in PLANS.md ("State-store fixed cost").
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
