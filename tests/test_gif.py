"""Animated-GIF codec tests (llmdata/gif.py): pixel-exact round trips
(palette-indexed GIF is lossless), LZW 12-bit dictionary growth,
interlace, transparency/disposal compositing, failure modes, and the
real frame-extraction operator through a Spark worker."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_streaming_dashboard_spark.llmdata.gif import (
    gif_codec_kernel,
    make_is_gif,
)

decode, encode = gif_codec_kernel()
is_gif = make_is_gif()


def _pal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 3), dtype=np.uint8)


def test_multiframe_roundtrip_pixel_exact():
    rng = np.random.default_rng(5)
    pal = _pal(16, 1)
    frames = [rng.integers(0, 16, size=(20, 30), dtype=np.uint8) for _ in range(5)]
    enc = encode(frames, pal, delays_cs=[10, 20, 30, 40, 50])
    assert is_gif(enc)
    dec, delays = decode(enc)
    assert delays == [10, 20, 30, 40, 50]
    for f, d in zip(frames, dec):
        assert (pal[f] == d).all()


def test_256_color_dictionary_growth():
    """A high-entropy 256-color frame forces LZW codes through the
    full 9->12 bit growth (and encoder dictionary reset on bigger
    inputs) -- still pixel-exact."""
    rng = np.random.default_rng(7)
    pal = _pal(256, 2)
    big = rng.integers(0, 256, size=(80, 80), dtype=np.uint8)
    dec, _ = decode(encode([big], pal))
    assert (dec[0] == pal[big]).all()


def test_transparency_and_disposal_compositing():
    pal = _pal(4, 3)
    f0 = np.zeros((8, 8), dtype=np.uint8)
    f1 = np.full((8, 8), 3, dtype=np.uint8)
    f1[2:4, 2:4] = 0  # transparent window -> f0 shows through
    dec, _ = decode(encode([f0, f1], pal, disposal=1, transparent_index=0))
    expect = pal[np.where(f1 == 0, f0, f1)]
    assert (dec[1] == expect).all()
    # disposal=2 (restore background) resets between frames: frame 2's
    # transparent pixels show the BACKGROUND color, not frame 1
    dec2, _ = decode(encode([f0, f1], pal, disposal=2, transparent_index=0))
    bg = pal[0]  # encoder writes background index 0
    assert (dec2[1][0, 0] == pal[3]).all()
    assert (dec2[1][2, 2] == bg).all()


def test_interlaced_frame_decodes():
    """Hand-build an interlaced frame: rows stored in the 8/8, 8/4,
    4/2, 2/1 pass order must come back in display order."""
    pal = _pal(8, 4)
    h, w = 16, 4
    img = (np.arange(h, dtype=np.uint8) % 8)[:, None].repeat(w, axis=1)
    enc = bytearray(encode([img], pal))
    # flip the interlace bit and reorder rows into pass order
    desc = bytes(enc).find(b"\x2c")
    iflags = enc[desc + 9]
    enc[desc + 9] = iflags | 0x40
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    reordered = img[order]
    # re-encode the pixel data blocks with the reordered rows
    enc2 = bytearray(encode([reordered], pal))
    desc2 = bytes(enc2).find(b"\x2c")
    body2 = enc2[desc2:]
    out = bytes(enc[: desc + 9]) + bytes([iflags | 0x40]) + bytes(body2[10:])
    dec, _ = decode(out)
    assert (dec[0] == pal[img]).all()


def test_failure_modes():
    with pytest.raises(ValueError, match="signature"):
        decode(b"\x89PNG\r\n\x1a\nxxxx" + b"\x00" * 8)
    pal = _pal(4, 5)
    good = encode([np.zeros((6, 6), dtype=np.uint8)], pal)
    with pytest.raises(ValueError):
        decode(good[:18])  # truncated header/table
    # fuzz: GIF-signed garbage terminates with ValueError, never hangs
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(8, 300))
        blob = b"GIF89a" + bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            frames, _ = decode(blob)
            assert frames  # decoded something structurally valid
        except ValueError:
            pass


def test_extract_video_frames_real_pixels(spark):
    """The decode pass attaches REAL composited frames: sampled rows
    match an independent driver-side decode of the same payloads."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        extract_video_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=9)  # videos: ids 2, 5, 8
    rows = extract_video_frames(media, every_n=30, decode_stub=False).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in rows}
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'video'").collect()
    }
    assert {m for m, _ in got} == {2, 5, 8}
    for (m, fi), r in got.items():
        frames, delays = decode(payloads[m])
        assert r["n_frames"] == len(frames)
        assert (r["width"], r["height"]) == (16, 16)
        assert r["delay_cs"] == delays[fi]
        expect = frames[fi]
        back = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(16, 16, 3)
        assert (back == expect).all()
    # id=2 has 90 frames -> sampled 0, 30, 60 (same as frame_sample)
    assert sorted(fi for m, fi in got if m == 2) == [0, 30, 60]
    # non-GIF video: stub slot vs loud raise
    fake = spark.createDataFrame(
        [(7, "video", b"\x00\x00\x00\x18ftypmp42", (None, None, None, 60, "video/mp4"))],
        media.schema,
    )
    stub_rows = extract_video_frames(fake, every_n=30).collect()
    assert [r["frame_idx"] for r in stub_rows] == [0, 30]
    assert all(r["width"] is None for r in stub_rows)
    with pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        extract_video_frames(fake, decode_stub=False).collect()


def test_resize_frames_pipeline_tail(spark):
    """sample -> decode -> resize: resized frames equal the NN gather
    of independently decoded source frames; stub rows pass through
    with null pixels."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        extract_video_frames,
        resize_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=6)  # videos: ids 2, 5
    frames = extract_video_frames(media, every_n=30)
    out = {
        (r["media_id"], r["frame_idx"]): r
        for r in resize_frames(frames, width=8, height=4).collect()
    }
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'video'").collect()
    }
    assert len(out) > 0
    for (m, fi), r in out.items():
        src, _ = decode(payloads[m])
        img = src[fi]
        ys = (np.arange(4) * 16) // 4
        xs = (np.arange(8) * 16) // 8
        expect = img[ys][:, xs]
        got = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(4, 8, 3)
        assert (got == expect).all(), (m, fi)
    # stub rows (no real dims) -> null pixels, never a crash
    fake = spark.createDataFrame(
        [(7, "video", b"\x00\x00\x00\x18ftypmp42", (None, None, None, 60, "video/mp4"))],
        media.schema,
    )
    stub = resize_frames(extract_video_frames(fake, every_n=30)).collect()
    assert len(stub) == 2 and all(r["pixels"] is None for r in stub)
