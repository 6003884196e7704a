"""Batch source adapters (SURVEY.md S1-S5).

The reference replays a ~30 GB Safecast CSV in 50k-row pandas chunks
(data_provider/data_provider.py:107); Spark's CSV scan splits and
parallelizes the same file automatically, so the adapter is one
declarative read with an EXPLICIT permissive schema (stringly bronze --
validation happens in silver, never at parse time; inferSchema would
both scan twice and guess types the validator must own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# raw Safecast columns accessed by the reference
# (data_provider/data_provider.py:110,127-130)
CSV_SCHEMA = T.StructType(
    [
        T.StructField("Captured Time", T.StringType(), True),
        T.StructField("Latitude", T.StringType(), True),
        T.StructField("Longitude", T.StringType(), True),
        T.StructField("Value", T.StringType(), True),
        T.StructField("Unit", T.StringType(), True),
    ]
)

BRONZE_COLUMNS = [
    "captured_time",
    "latitude",
    "longitude",
    "value",
    "unit",
    "ingestion_timestamp",
]


def read_csv_bronze(spark: SparkSession, path: str) -> DataFrame:
    """CSV -> bronze: project/rename (S4), all-null row drop (S3),
    ingest-time enrich. Column pruning + filters push into the scan."""
    raw = spark.read.csv(path, header=True, schema=CSV_SCHEMA)
    raw = raw.na.drop(how="all")  # S3
    return raw.select(
        F.col("Captured Time").alias("captured_time"),
        F.col("Latitude").alias("latitude"),
        F.col("Longitude").alias("longitude"),
        F.col("Value").alias("value"),
        F.col("Unit").alias("unit"),
        F.unix_millis(F.current_timestamp()).alias("ingestion_timestamp"),
    )


def chunk_time_sort(bronze: DataFrame, ts_col: str = "captured_time") -> DataFrame:
    """S2: the reference sorts each 50k-row chunk by captured time
    before sending (partial order only within a chunk,
    data_provider/data_provider.py:109-110). Spark analog with the same
    semantics: per-partition sort, no global shuffle."""
    return bronze.sortWithinPartitions(ts_col)


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# the reference's Kafka record shape (data_provider/data_provider.py:127-130
# produces exactly these five fields as JSON) -- same stringly bronze
# contract as the CSV path: validation owns all typing in silver
JSONL_SCHEMA = T.StructType(
    [
        T.StructField("captured_time", T.StringType(), True),
        T.StructField("latitude", T.StringType(), True),
        T.StructField("longitude", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def read_jsonl_bronze(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines -> bronze (the reference's wire format as a batch
    file source): explicit schema (no inference double-scan),
    PERMISSIVE parse with malformed lines captured in
    ``_corrupt_record`` and routed to the invalid path as an
    all-null-fields record (the F1 "Missing fields" slot -- a broken
    wire line and an empty record fail validation identically, so the
    error ledger counts them without a separate code path). All-null
    rows (empty JSON objects) are dropped like S3.

    At scale: JSONL splits by newline exactly like CSV, so a 30 GB
    dump parallelizes across executors with no custom chunker; column
    pruning reaches the scan (Jackson parses only requested fields).
    """
    raw = spark.read.schema(JSONL_SCHEMA).option("mode", "PERMISSIVE").json(path)
    data_cols = [f.name for f in JSONL_SCHEMA.fields if f.name != "_corrupt_record"]
    raw = raw.na.drop(how="all", subset=data_cols + ["_corrupt_record"])
    return raw.select(
        *[
            F.when(F.col("_corrupt_record").isNull(), F.col(c)).alias(c)
            for c in data_cols
        ],
        F.unix_millis(F.current_timestamp()).alias("ingestion_timestamp"),
    )


def write_bronze_orc(bronze: DataFrame, path: str) -> None:
    """Columnar ORC sink for the bronze layer -- Spark-native (no
    extra jars), same predicate-pushdown + column-pruning contract as
    parquet; the interchange format when the downstream warehouse is
    Hive/Trino-flavored. (Avro would need the external spark-avro
    package -- absent from this container, so it stays a documented
    env-gated slot, like the Kafka jars.)"""
    bronze.write.mode("overwrite").orc(path)


def read_orc_bronze(spark: SparkSession, path: str) -> DataFrame:
    """ORC -> bronze: schema travels with the files; filters and
    column selection push into the ORC scan exactly like parquet
    (pinned by tests/test_sources.py::test_orc_bronze_roundtrip)."""
    return spark.read.orc(path)
