"""WebP-lossless (VP8L) codec tests.

Two layers of evidence:
1. Self round-trips: our encoder -> our decoder, pixel-exact, across
   literal / subtract-green / palette (incl. sub-byte bundling) /
   LZ77 modes.
2. Cross-engine (gated on the system libwebp, present in this
   container as /usr/lib/.../libwebp.so.7): our encoder's streams are
   accepted and decoded identically by `WebPDecodeRGBA`, our decoder
   pixel-exactly decodes `WebPEncodeLosslessRGBA` output (which
   exercises the real encoder's predictor/color transforms, color
   cache, meta-prefix and 2D distance codes), and the embedded
   120-entry distance map is re-verified code-by-code via crafted
   single-backref streams.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from big_data_streaming_dashboard_spark.llmdata.webp import (
    _WEBP_DIST_MAP,
    decode_webp,
    encode_webp_lossless,
    make_is_webp,
    webp_codec_kernel,
)


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for cross-check"
)


def _lib_decode(data: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp rejected the stream")
    arr = (
        np.ctypeslib.as_array(p, shape=(w.value * h.value * 4,))
        .copy()
        .reshape(h.value, w.value, 4)
    )
    _LIB.WebPFree(p)
    return arr


def _lib_encode(rgba: np.ndarray) -> bytes:
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(
        rgba.tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _LIB.WebPFree(out)
    return data


def _with_alpha(img: np.ndarray) -> np.ndarray:
    if img.shape[2] == 4:
        return img
    a = np.full(img.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([img, a], axis=-1)


SELF_CASES = [
    ((5, 7, 3), {}),
    ((16, 16, 3), {}),
    ((16, 16, 4), {}),
    ((8, 8, 3), {"subtract_green": True}),
    ((1, 1, 3), {}),
    ((9, 3, 4), {"lz77": False}),
]


@pytest.mark.parametrize("shape,kw", SELF_CASES)
def test_self_roundtrip_exact(shape, kw):
    img = np.random.RandomState(7).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_webp(encode_webp_lossless(img, **kw))
    assert (out == _with_alpha(img)).all()


def test_self_roundtrip_lz77_rows():
    rng = np.random.RandomState(5)
    img = np.tile(rng.randint(0, 256, size=(1, 12, 3)).astype(np.uint8), (10, 1, 1))
    assert (decode_webp(encode_webp_lossless(img)) == _with_alpha(img)).all()


@pytest.mark.parametrize("ncol", [2, 3, 9, 40, 200])
def test_self_roundtrip_palette_bundling(ncol):
    rng = np.random.RandomState(ncol)
    pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncol, size=(11, 13))]
    out = decode_webp(encode_webp_lossless(img, palette=True))
    assert (out == _with_alpha(img)).all()


def test_sniffer_and_lossy_rejection():
    is_webp = make_is_webp()
    img = np.zeros((2, 2, 3), np.uint8)
    data = encode_webp_lossless(img)
    assert is_webp(data) and not is_webp(data[4:]) and not is_webp(b"")
    # lossy VP8 chunk -> loud documented stub error
    lossy = data[:12] + b"VP8 " + b"\x04\x00\x00\x00abcd"
    with pytest.raises(ValueError, match="lossy VP8"):
        decode_webp(lossy)


@needs_libwebp
@pytest.mark.parametrize("shape,kw", SELF_CASES)
def test_libwebp_accepts_our_streams(shape, kw):
    img = np.random.RandomState(3).randint(0, 256, size=shape).astype(np.uint8)
    assert (_lib_decode(encode_webp_lossless(img, **kw)) == _with_alpha(img)).all()


@needs_libwebp
def test_we_decode_libwebp_encoded_images_exactly():
    """The real encoder picks its own transforms (predictor, color,
    subtract-green, palette), color cache, meta-prefix codes and 2D
    distance codes -- decoding its output pixel-exactly is the
    strongest single check of the whole decoder."""
    rng = np.random.RandomState(11)
    ys, xs = np.mgrid[0:48, 0:40]
    cases = {
        "gradient": np.stack(
            [xs * 5 % 256, ys * 3 % 256, (xs + ys) % 256, np.full_like(xs, 255)],
            axis=-1,
        ).astype(np.uint8),
        "noise": rng.randint(0, 256, size=(32, 32, 4)).astype(np.uint8),
        "rows": np.tile(
            rng.randint(0, 256, size=(2, 60, 4)).astype(np.uint8), (20, 1, 1)
        ),
        "fewcolor": np.array(
            [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255], [9, 8, 7, 255]],
            dtype=np.uint8,
        )[rng.randint(0, 4, size=(40, 56))],
    }
    cases["noise"][:, :, 3] = 255
    cases["rows"][:, :, 3] = 255
    yy, xx = np.mgrid[0:64, 0:64]
    cases["photo"] = np.stack(
        [
            (np.sin(xx / 7) * 100 + 120),
            (np.cos(yy / 9) * 90 + 130),
            ((xx * yy) // 37 % 256),
            np.full_like(xx, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    for name, img in cases.items():
        got = decode_webp(_lib_encode(img))
        assert got.shape == img.shape, name
        assert (got == img).all(), name


@needs_libwebp
def test_distance_map_matches_libwebp():
    """Re-derive the 120-entry 2D proximity map code-by-code: craft a
    stream whose single backref carries raw distance code c, decode it
    with libwebp, identify the copied source pixel, and compare the
    implied (dx, dy) against the embedded table (which a first
    from-memory draft got wrong in 19 tail entries -- this harness is
    the table's provenance, see webp.py)."""
    _, encode = webp_codec_kernel()
    W, H = 64, 10
    P = (H - 1) * W + W // 2
    pix = {
        (255, x & 0xFF, (y * 2 + 1) & 0xFF, (x * 3 + y) & 0xFF): y * W + x
        for y in range(H)
        for x in range(W)
    }
    for c in range(1, 121):
        img = _lib_decode(encode.craft_backref_stream(c, W, H))
        r, g, b, a = (int(v) for v in img[H - 1, W // 2])
        src = pix[(a, r, g, b)]
        dist = P - src
        dy = (dist + 32) // W
        dx = dist - W * dy
        assert _WEBP_DIST_MAP[c - 1] == (dx, dy), c


@needs_libwebp
def test_our_decoder_matches_libwebp_on_crafted_backrefs():
    """Same crafted streams, both decoders: our DIST_MAP consumer and
    libwebp must produce identical full images for every code."""
    _, encode = webp_codec_kernel()
    for c in range(1, 121, 7):
        data = encode.craft_backref_stream(c)
        assert (decode_webp(data) == _lib_decode(data)).all(), c


def test_truncated_and_garbage_inputs_fail_loudly():
    img = np.zeros((4, 4, 3), np.uint8)
    data = encode_webp_lossless(img)
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_webp(b"")


def test_vp8x_extended_container_walking():
    """A VP8L chunk inside a VP8X extended container (the layout
    feature-flagged files use) decodes identically: the RIFF walker
    skips unknown chunks (incl. odd-size padding) to find VP8L."""
    import struct

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    plain = encode_webp_lossless(img)
    # rebuild: RIFF [VP8X (10 bytes)] [XYZ odd-size chunk] [VP8L ...]
    (vp8l_size,) = struct.unpack("<I", plain[16:20])
    vp8l = plain[12 : 20 + vp8l_size + (vp8l_size & 1)]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    odd = b"XYZ " + struct.pack("<I", 3) + b"abc\x00"  # padded to even
    body = b"WEBP" + vp8x + odd + vp8l
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert (decode_webp(data) == decode_webp(plain)).all()
    assert make_is_webp()(data)


def test_corruption_fuzz_raises_only_valueerror():
    """Byte-corruption sweep over valid streams (every position x a
    few XOR masks): decode must either succeed (corruption in padding
    or a don't-care bit) or raise ValueError -- NEVER leak an
    IndexError/KeyError/struct.error, because the Spark-side
    feat/resize kernels catch exactly ValueError to degrade a corrupt
    payload to the stub slot instead of killing the stage."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8)
    for kw in ({}, {"palette": False, "subtract_green": True}):
        data = bytearray(encode_webp_lossless(img, **kw))
        for pos in range(12, len(data)):
            for mask in (0x01, 0x80, 0xFF):
                corrupt = bytes(
                    data[:pos] + bytes([data[pos] ^ mask]) + data[pos + 1 :]
                )
                try:
                    decode_webp(corrupt)
                except ValueError:
                    pass  # the contract
    # truncations at every length, same contract
    data = bytes(encode_webp_lossless(img))
    for n in range(len(data)):
        try:
            decode_webp(data[:n])
        except ValueError:
            pass


@needs_libwebp
def test_crafted_predictor_transform_all_modes_match_libwebp():
    """Crafted streams carrying an explicit predictor transform pin
    ALL 14 modes bit-for-bit against libwebp (the natural-image
    cross-checks only exercise whatever modes the libwebp encoder
    happens to pick)."""
    _, encode = webp_codec_kernel()
    rng = np.random.RandomState(4)
    res = [
        [(255, int(rng.randint(256)), int(rng.randint(256)), int(rng.randint(256))) for _ in range(8)]
        for _ in range(8)
    ]
    for m0 in range(14):
        tiles = [
            [(255, 0, m0, 0), (255, 0, (m0 + 7) % 14, 0)],
            [(255, 0, (m0 + 3) % 14, 0), (255, 0, (m0 + 11) % 14, 0)],
        ]
        data = encode.craft_transform_stream("predictor", tiles, res)
        assert (decode_webp(data) == _lib_decode(data)).all(), m0


@needs_libwebp
def test_crafted_color_transform_matches_libwebp():
    """Crafted streams with explicit ColorTransformElement values
    across the signed-delta range pin the inverse color transform
    bit-for-bit against libwebp. This harness caught a REAL first-draft
    bug: the CTE channel packing is green_to_red in the BLUE byte and
    red_to_blue in RED (argb = ff|r2b<<16|g2b<<8|g2r) -- the swapped
    reading decoded every nonzero-delta stream wrong while all the
    natural-fixture cross-checks passed (the libwebp encoder had not
    picked the transform there)."""
    _, encode = webp_codec_kernel()
    rng = np.random.RandomState(4)
    res = [
        [(255, int(rng.randint(256)), int(rng.randint(256)), int(rng.randint(256))) for _ in range(8)]
        for _ in range(8)
    ]
    for g2r in (0, 1, 37, 128, 200, 255):
        for g2b in (0, 91, 170):
            for r2b in (0, 55, 240):
                tiles = [
                    [(255, r2b, g2b, g2r), (255, g2b, r2b, g2r)],
                    [(255, g2r, r2b, g2b), (255, 0, 0, 0)],
                ]
                data = encode.craft_transform_stream("color", tiles, res)
                assert (decode_webp(data) == _lib_decode(data)).all(), (
                    g2r, g2b, r2b,
                )


@needs_libwebp
def test_large_mixed_structure_libwebp_decode():
    """128x128 mixed-structure images (smooth gradient + noise + flat
    + stripes, and a varying-alpha variant) push the libwebp encoder
    toward its full machinery -- meta-prefix groups, color cache,
    transforms, long backrefs -- and our decoder must still be
    pixel-exact."""
    rng = np.random.RandomState(21)
    yy, xx = np.mgrid[0:128, 0:128]
    img = np.zeros((128, 128, 4), np.uint8)
    img[:, :, 3] = 255
    img[:64, :64, 0] = (xx[:64, :64] * 2) % 256
    img[:64, :64, 1] = (yy[:64, :64] * 3) % 256
    img[:64, 64:, :3] = rng.randint(0, 256, size=(64, 64, 3))
    img[64:, :64, :3] = 77
    img[64:, 64:, 0] = ((xx[64:, 64:] // 4) % 2) * 255
    assert (decode_webp(_lib_encode(img)) == img).all()
    img2 = img.copy()
    img2[:, :, 3] = ((xx + yy) % 256).astype(np.uint8)
    assert (decode_webp(_lib_encode(img2)) == img2).all()
