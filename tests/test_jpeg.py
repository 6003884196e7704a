"""Baseline JFIF codec tests (llmdata/jpeg.py): per-pixel round trips
against the hand-built encoder, subsampling, restart markers, and the
documented failure modes (progressive -> NotImplementedError,
truncation/garbage -> ValueError)."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_streaming_dashboard_spark.llmdata.jpeg import (
    jpeg_codec_kernel,
    make_is_jpeg,
)

decode, encode = jpeg_codec_kernel()
is_jpeg = make_is_jpeg()


def _gradient(h, w, seed=0):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xs * 3 + seed) % 256, (ys * 5) % 256, (xs + ys) % 256], axis=-1
    ).astype(np.uint8)


def test_q100_roundtrip_near_exact_all_shapes():
    """quality=100 (all-ones quant tables): encode->decode error is
    bounded by float DCT/color rounding alone (<= 2 per channel),
    including non-multiple-of-8 dims and the 1x1 edge case."""
    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (16, 24), (13, 19), (1, 1), (9, 7), (64, 33)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        enc = encode(img, quality=100)
        assert is_jpeg(enc)
        dec = decode(enc)
        assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2, (h, w)


def test_lossy_quality_ladder_smooth_image():
    """On a smooth (no mod-256 wrap) gradient, error grows with
    compression but stays small in the mean -- codec behaves like a
    real quantizing JPEG, not a pass-through."""
    img = _gradient(40, 56)
    sizes, prev_mean = [], -1.0
    for q in (100, 95, 75, 50):
        enc = encode(img, quality=q)
        dec = decode(enc)
        err = np.abs(dec.astype(int) - img.astype(int))
        sizes.append(len(enc))
        assert err.mean() >= prev_mean - 0.05  # monotone-ish degradation
        prev_mean = err.mean()
        assert err.mean() <= 4.0, q
    assert sizes[0] > sizes[-1]  # harsher quant really compresses


def test_subsampled_420_roundtrip():
    img = _gradient(24, 40, seed=3)
    dec = decode(encode(img, quality=95, subsample=True))
    assert dec.shape == img.shape
    # luma is full-res; chroma is box-averaged + replicated -> small err
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 4.0


def test_restart_markers_roundtrip_and_reset():
    """DRI/RSTn path: predictors reset per interval, stream re-aligns
    at byte boundaries; q100 keeps the round trip near-exact for
    every interval that divides the MCU count unevenly too."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)  # 15 MCUs
    for ri in (1, 2, 4, 7):
        enc = encode(img, quality=100, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI segment present
        dec = decode(enc)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2, ri


def test_arithmetic_rejected_loudly():
    """Arithmetic-coded frames (SOF9) raise NotImplementedError -- the
    documented remaining stub slot, never a wrong decode."""
    enc = bytearray(encode(_gradient(8, 8), quality=95))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode(bytes(enc))


def test_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) decode is bit-identical to the baseline
    decode of the same image at the same quality -- both entropy-code
    the SAME quantized coefficients, so any pixel difference is a scan
    bug. Covers successive approximation (DC and AC), spectral
    selection, EOB runs, 4:2:0, and restart markers."""
    rng = np.random.default_rng(11)
    imgs = [
        _gradient(40, 56),
        rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8),
        np.full((16, 24, 3), 130, dtype=np.uint8),
    ]
    for img in imgs:
        for q in (95, 75, 50):
            for sub in (False, True):
                for dri in (0, 3):
                    base = decode(encode(img, quality=q, subsample=sub))
                    prog = decode(
                        encode(
                            img, quality=q, subsample=sub,
                            progressive=True, restart_interval=dri,
                        )
                    )
                    assert np.array_equal(base, prog), (q, sub, dri)


def test_progressive_custom_scan_scripts():
    """Alternative scan scripts -- spectral-selection-only and
    DC-successive-approximation-only -- land on the same pixels as the
    default 10-scan script (script choice is presentation order, not
    content)."""
    img = _gradient(24, 24, seed=5)
    want = decode(encode(img, quality=90, progressive=True))
    scripts = [
        [  # spectral selection only, no successive approximation
            ("dc_first", (0, 1, 2), 0, 0, 0, 0),
            ("ac_first", (0,), 1, 63, 0, 0),
            ("ac_first", (1,), 1, 63, 0, 0),
            ("ac_first", (2,), 1, 63, 0, 0),
        ],
        [  # DC successive approximation + single AC band per comp
            ("dc_first", (0, 1, 2), 0, 0, 0, 2),
            ("dc_refine", (0, 1, 2), 0, 0, 2, 1),
            ("dc_refine", (0, 1, 2), 0, 0, 1, 0),
            ("ac_first", (0,), 1, 63, 0, 0),
            ("ac_first", (1,), 1, 63, 0, 0),
            ("ac_first", (2,), 1, 63, 0, 0),
        ],
    ]
    for script in scripts:
        got = decode(encode(img, quality=90, progressive=True, scans=script))
        assert np.array_equal(got, want)


def test_progressive_partial_scan_decodes():
    """A progressive stream truncated after its DC scan still decodes
    (the whole point of progressive rendering): right shape, and the
    per-8x8-block mean matches the full decode's block mean closely
    (AC coefficients only redistribute within a block)."""
    img = _gradient(16, 16, seed=9)
    dc_only = [("dc_first", (0, 1, 2), 0, 0, 0, 0)]
    got = decode(encode(img, quality=95, progressive=True, scans=dc_only))
    assert got.shape == (16, 16, 3)
    full = decode(encode(img, quality=95, progressive=True))
    for by in range(2):
        for bx in range(2):
            a = got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].mean()
            b = full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].mean()
            assert abs(a - b) < 4.0, (by, bx, a, b)


def test_progressive_truncation_raises():
    enc = encode(_gradient(16, 16), quality=95, progressive=True)
    with pytest.raises(ValueError):
        decode(enc[:40])  # cut inside the header segments


def test_garbage_and_truncation_raise_valueerror():
    with pytest.raises(ValueError, match="SOI"):
        decode(b"\x89PNG\r\n\x1a\nnot jpeg")
    enc = encode(_gradient(16, 16), quality=95)
    with pytest.raises(ValueError):
        decode(enc[:20])  # cut inside the header segments


def test_is_jpeg_sniff():
    assert is_jpeg(encode(_gradient(8, 8)))
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not is_jpeg(b"\xff\xd8")  # too short
    assert not is_jpeg(None)


def test_jpeg_features_through_spark_worker(spark):
    """The kernel ships by value into a plain mapInPandas worker: JPEG
    media rows get REAL pixel-stat features (f0/f1 = width/height),
    bit-identical across two runs."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12).filter("media_id in (3, 9)")
    rows = {r["media_id"]: r for r in extract_features(media, decode_stub=False).collect()}
    assert set(rows) == {3, 9}
    for i, r in rows.items():
        sw, sh = 4 + (5 * i) % 45, 4 + (7 * i) % 45
        assert r["feature"][:2] == [float(sw), float(sh)], i
    again = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, decode_stub=False).collect()
    }
    assert again == {i: r["feature"] for i, r in rows.items()}


def test_fuzz_decoder_never_hangs_or_segfaults():
    """Robustness: SOI-signed garbage, random truncations of a valid
    stream, and bit-flipped entropy data must terminate quickly with
    ValueError/NotImplementedError (or decode to SOME image for
    benign entropy flips) -- never hang, loop, or crash the
    interpreter. Deterministic seeds; bounded corpus."""
    rng = np.random.default_rng(99)
    good = encode(_gradient(24, 24, seed=1), quality=75)
    corpus = []
    # random SOI-prefixed garbage
    for _ in range(20):
        n = int(rng.integers(4, 400))
        corpus.append(b"\xff\xd8\xff" + bytes(rng.integers(0, 256, n, dtype=np.uint8)))
    # truncations of a real stream at every region
    for frac in (0.05, 0.2, 0.5, 0.9, 0.99):
        corpus.append(good[: int(len(good) * frac)])
    # single-bit flips inside the entropy segment
    sos = good.find(b"\xff\xda")
    for _ in range(20):
        b = bytearray(good)
        i = int(rng.integers(sos + 14, len(good) - 2))
        b[i] ^= 1 << int(rng.integers(0, 8))
        corpus.append(bytes(b))
    decoded, rejected = 0, 0
    for payload in corpus:
        try:
            img = decode(payload)
            assert img.dtype == np.uint8 and img.ndim == 3
            decoded += 1
        except (ValueError, NotImplementedError):
            rejected += 1
    assert decoded + rejected == len(corpus)
    assert rejected >= 20  # garbage and truncation really are rejected
