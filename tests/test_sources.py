"""Source-adapter tests: Kafka JSON edge parse (P1), rate source (S7),
RocksDB state store (W10 scale state)."""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import functions as F

from big_data_streaming_dashboard_spark.operators.validate import validate_enrich
from big_data_streaming_dashboard_spark.sources.streams import (
    parse_kafka_json,
    stream_rate_bronze,
)


def test_parse_kafka_json_once(spark):
    """P1: one from_json at the edge; malformed payloads become all-null
    structs that the validator routes to dirty (Missing fields)."""
    good = json.dumps(
        {
            "captured_time": "2024-01-01 10:00:00",
            "latitude": "10.0",
            "longitude": "20.0",
            "value": "100.0",
            "unit": "cpm",
            "ingestion_timestamp": 1704100000000,
        }
    )
    raw = spark.createDataFrame(
        [("10.0|20.0|100.0|2024-01-01 10:00:00|cpm", good), ("k2", "{not json")],
        "key string, value string",
    )
    bronze = parse_kafka_json(raw)
    rows = {r["kafka_key"]: r for r in bronze.collect()}
    assert rows["10.0|20.0|100.0|2024-01-01 10:00:00|cpm"]["latitude"] == "10.0"
    assert rows["k2"]["captured_time"] is None  # malformed -> nulls
    silver = validate_enrich(
        bronze.withColumn("event_id", F.monotonically_increasing_id())
    )
    got = sorted((r["status"], r["error"]) for r in silver.collect())
    assert got == [("invalid", "Missing fields"), ("valid", None)]


def test_kafka_producer_consumer_round_trip(spark):
    """S6 <-> S9 contract, broker-independent: the producer projection
    (key = composite dedup key, value = to_json(struct)) fed back
    through parse_kafka_json reproduces every bronze record exactly --
    including the dirty rows (nulls, non-numerics) the fixture plants.
    to_json omits null fields; from_json yields null for absent ones,
    so null round-trips hold."""
    from collections import Counter

    from big_data_streaming_dashboard_spark.functions.keys import dedup_key
    from big_data_streaming_dashboard_spark.tables import bronze_radiation

    bronze = bronze_radiation(spark, "/root/testdata/sf0.001")
    cols = [
        "captured_time",
        "latitude",
        "longitude",
        "value",
        "unit",
        "ingestion_timestamp",
    ]
    wire = bronze.select(
        dedup_key(
            F.col("latitude"),
            F.col("longitude"),
            F.col("value"),
            F.col("captured_time"),
            F.col("unit"),
        ).alias("key"),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    back = parse_kafka_json(wire)
    orig = Counter(tuple(r[c] for c in cols) for r in bronze.select(*cols).collect())
    got = Counter(tuple(r[c] for c in cols) for r in back.collect())
    assert got == orig
    # D3: every wire record carries a non-null partition-alignment key
    # (unparseable rows share INVALID_KEY, never null)
    assert back.filter(F.col("kafka_key").isNull()).count() == 0


def test_rate_source_bronze(spark):
    """S7: the rate-source replay produces schema-complete bronze rows
    that flow through the validator."""
    stream = stream_rate_bronze(spark, rows_per_second=500)
    silver = validate_enrich(
        stream.withColumn("event_id", F.col("ingestion_timestamp"))
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        silver.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(1)
    finally:
        q.stop()
    out = spark.table(name)
    assert out.count() > 0
    assert out.filter(F.col("status") == "valid").count() > 0


def test_rocksdb_state_store_dedup(spark, tmp_path):
    """W10: streaming dedup runs on the RocksDB state store provider
    (the reference's state backend; Spark's scale-state equivalent)."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        for lo, hi in [(0, 50), (25, 75)]:  # overlapping ids -> dups
            spark.range(lo, hi).select(
                F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("dedup_key")
            ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("id long, dedup_key string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        name = f"t_{uuid.uuid4().hex[:8]}"
        q = (
            stream.dropDuplicates(["dedup_key"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r["id"] for r in spark.table(name).collect())
        assert got == list(range(75))  # each id exactly once across batches
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_jsonl_bronze_source(spark, tmp_path):
    """JSONL batch source: explicit schema, malformed lines become
    all-null bronze rows (-> F1 'Missing fields' in silver), empty
    objects dropped, and the happy path validates end-to-end."""
    import json

    from big_data_streaming_dashboard_spark.operators.validate import (
        validate_enrich,
    )
    from big_data_streaming_dashboard_spark.sources.batch import (
        read_jsonl_bronze,
    )

    p = tmp_path / "bronze.jsonl"
    lines = [
        json.dumps(
            {
                "captured_time": "2023-11-15 06:33:19",
                "latitude": "35.00",
                "longitude": "139.00",
                "value": "42.00",
                "unit": "cpm",
            }
        ),
        "{not valid json at all",
        "{}",  # empty object -> dropped (S3)
        json.dumps({"captured_time": "2023-11-15 06:33:20"}),  # partial
    ]
    p.write_text("\n".join(lines) + "\n")
    bronze = read_jsonl_bronze(spark, str(p))
    rows = bronze.collect()
    assert len(rows) == 3  # empty object dropped
    assert set(bronze.columns) == {
        "captured_time", "latitude", "longitude", "value", "unit",
        "ingestion_timestamp",
    }
    silver = validate_enrich(bronze).collect()
    by_status = {}
    for r in silver:
        by_status.setdefault(r["status"], []).append(r)
    assert len(by_status["valid"]) == 1
    assert by_status["valid"][0]["value"] == 42.0
    # corrupt line and partial record both land in Missing fields
    assert len(by_status["invalid"]) == 2
    assert all(r["error"] == "Missing fields" for r in by_status["invalid"])


def test_orc_bronze_roundtrip_and_pushdown(spark, tmp_path):
    """ORC source/sink: byte-faithful bronze round trip and the same
    scan-level optimization contract as parquet (PushedFilters +
    pruned ReadSchema visible in the executed plan)."""
    from big_data_streaming_dashboard_spark.sources.batch import (
        read_orc_bronze,
        write_bronze_orc,
    )
    from big_data_streaming_dashboard_spark.tables import bronze_radiation

    from .conftest import SF_ORACLE

    bronze = bronze_radiation(spark, SF_ORACLE).limit(500)
    path = str(tmp_path / "bronze_orc")
    write_bronze_orc(bronze, path)
    back = read_orc_bronze(spark, path)
    assert sorted(back.columns) == sorted(bronze.columns)
    assert back.count() == 500
    # filter + projection reach the ORC scan
    q = back.filter(F.col("unit") == "cpm").select("event_id", "unit")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(unit), EqualTo(unit,cpm)]" in plan
    assert "ReadSchema: struct<event_id:bigint,unit:string>" in plan
    # values survive the round trip (same validation results)
    from big_data_streaming_dashboard_spark.operators.validate import (
        validate_enrich,
    )

    a = {r["event_id"]: r for r in validate_enrich(bronze).collect()}
    b = {r["event_id"]: r for r in validate_enrich(back).collect()}
    assert set(a) == set(b)
    mismatches = [k for k in a if a[k]["status"] != b[k]["status"]]
    assert not mismatches
