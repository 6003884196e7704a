"""Opt-in live-Kafka end-to-end test (S6/S9/S10).

Skipped unless ``SPARK_KAFKA_BOOTSTRAP`` points at a reachable broker.
The container this repo is developed in has neither a broker nor the
spark-sql-kafka connector jar, so the default suite exercises the
exact JSON wire contract brokerless
(test_sources.test_kafka_producer_consumer_round_trip); this file is
the real-broker path for environments that have one:

    SPARK_KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py

Connector resolution: set ``SPARK_KAFKA_PACKAGES`` to override the
default spark-sql-kafka maven coordinate (needs network or a local
ivy/maven cache), or pre-place the jars in ``$SPARK_HOME/jars``.

Run this file on its own: it builds a dedicated SparkSession with the
connector package, which cannot coexist with the shared suite session.

Covers the reference's spine: producer publishes raw JSON readings to
the data topic (data_provider/data_provider.py:125-132), the engine
consumes them (flink_process/flink_process.py:230-236), validates,
routes, and writes the three routed topics
(flink_process/flink_process.py:354-390), and a follow-up consumer
reads the routed topics back.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP")
PACKAGES = os.environ.get(
    "SPARK_KAFKA_PACKAGES", "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
)

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="SPARK_KAFKA_BOOTSTRAP not set (no Kafka broker in this environment)",
)


@pytest.fixture(scope="module")
def kspark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars.packages", PACKAGES)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_kafka_end_to_end_produce_route_consume(kspark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_streaming_dashboard_spark.operators.route import ROUTES, route
    from big_data_streaming_dashboard_spark.sources.streams import (
        stream_kafka_bronze,
    )
    from big_data_streaming_dashboard_spark.streaming.sinks import (
        kafka_route_writer,
        route_foreach_batch,
    )
    from big_data_streaming_dashboard_spark.operators.validate import validate_enrich
    from big_data_streaming_dashboard_spark.tables import bronze_radiation

    run = uuid.uuid4().hex[:8]
    data_topic = f"radiation-data-{run}"
    route_topics = {name: f"radiation-{name}-{run}" for name in ROUTES}

    # 1. produce: raw JSON payloads, the data_provider wire format
    bronze = bronze_radiation(kspark, "/root/testdata/sf0.001").limit(500)
    payload = bronze.select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                "captured_time",
                "latitude",
                "longitude",
                "value",
                "unit",
                "ingestion_timestamp",
            )
        ).alias("value"),
    )
    (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", data_topic)
        .save()
    )

    # 2. consume -> validate -> route -> 3 routed topics (availableNow)
    raw = stream_kafka_bronze(
        kspark, BOOTSTRAP, topic=data_topic, starting_offsets="earliest"
    )
    silver = validate_enrich(raw.withColumn("event_id", F.monotonically_increasing_id()))
    q = (
        silver.writeStream.foreachBatch(
            route_foreach_batch(kafka_route_writer(BOOTSTRAP, route_topics))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # 3. read the routed topics back; totals must conserve and match
    # the batch routing of the same bronze slice
    batch_routed = route(validate_enrich(bronze)).groupBy("route").count()
    expected = {r["route"]: r["count"] for r in batch_routed.collect()}
    got = {}
    for name, topic in route_topics.items():
        got[name] = (
            kspark.read.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
            .count()
        )
    for name in ROUTES:
        assert got.get(name, 0) == expected.get(name, 0), (name, got, expected)
