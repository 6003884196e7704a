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
