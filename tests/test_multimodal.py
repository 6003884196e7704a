"""Multimodal plumbing tests: schema, Arrow batch shape, determinism
(the codec itself is stubbed -- llmdata/multimodal.py)."""

from __future__ import annotations

import pytest

from big_data_streaming_dashboard_spark.llmdata.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    synthetic_media,
)


def test_extract_features_stub(spark):
    media = synthetic_media(spark, n=48)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    by_id = {r["media_id"]: r for r in rows}
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for x in by_id[0]["feature"])
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again == {k: r["feature"] for k, r in by_id.items()}


def test_extract_features_real_codec_unimplemented(spark):
    media = synthetic_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        extract_features(media, decode_stub=False).collect()


def test_frame_sample(spark):
    media = synthetic_media(spark, n=9)
    got = frame_sample(media, every_n=30).collect()
    # videos are media_id % 3 == 2 with n_frames = 30*(1 + i%10)
    vids = {r["media_id"] for r in got if r["kind"] == "video"}
    assert vids == {2, 5, 8}
    per_vid = {}
    for r in got:
        per_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    # media_id=2 -> n_frames=90 -> frames [0, 30, 60]
    assert sorted(per_vid[2]) == [0, 30, 60]
    # non-video rows contribute exactly one row each
    assert all(len(v) == 1 for k, v in per_vid.items() if k not in vids)


def test_media_fixture_roundtrip(spark, tmp_path):
    """Binary payloads survive the parquet round trip byte-exactly."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        read_media,
        write_media_fixture,
    )

    path = str(tmp_path / "media")
    write_media_fixture(spark, path, n=32)
    back = read_media(spark, path)
    assert [f.name for f in back.schema.fields] == [
        "media_id",
        "kind",
        "payload",
        "meta",
    ]
    orig = {r["media_id"]: bytes(r["payload"]) for r in synthetic_media(spark, 32).collect()}
    got = {r["media_id"]: bytes(r["payload"]) for r in back.collect()}
    assert got == orig


def test_media_fixture_inflation_byte_exact(spark, tmp_path):
    """payload_kb inflation goes through JVM-side repeat (binary->string
    ->binary); sha256 bytes contain invalid UTF-8 sequences, so this
    asserts the cast chain never mangles them."""
    import hashlib

    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        read_media,
        write_media_fixture,
    )

    path = str(tmp_path / "media_kb")
    write_media_fixture(spark, path, n=6, payload_kb=64)
    reps = (64 * 1024) // 32
    back = {r["media_id"]: bytes(r["payload"]) for r in read_media(spark, path).collect()}
    for i in range(6):
        base = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 8)
        assert back[i] == base * reps, f"media_id={i} mangled"


def test_media_fixture_max_partition_bytes(spark, tmp_path):
    """Scan splits track spark.sql.files.maxPartitionBytes on heavy
    binary cells: a small cap yields many more scan partitions than a
    big one (the knob that bounds per-task memory at 100 TB)."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        write_media_fixture,
    )

    path = str(tmp_path / "media_big")
    write_media_fixture(spark, path, n=32, payload_kb=64)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
        many = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        few = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert many > few, (many, few)


def test_media_feature_census_query(spark):
    """Driver-contract entry: end-to-end plumbing census is stable and
    covers all three kinds."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        media_feature_census,
    )

    rows = {r["kind"]: r for r in media_feature_census(spark).collect()}
    assert set(rows) == {"image", "audio", "video"}
    for r in rows.values():
        assert r["n_media"] > 0 and r["total_bytes"] > 0
        assert 0.0 <= r["min_f0"] <= r["max_f0"] <= 1.0
    # twice -> identical (rows-only check must be stable)
    again = {r["kind"]: r for r in media_feature_census(spark).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
