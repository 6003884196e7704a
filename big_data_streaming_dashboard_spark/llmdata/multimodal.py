"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; the
decode/feature steps run as Arrow-batched ``mapInPandas`` stages.

Codecs: PNG (8-bit gray/RGB/palette/RGBA, all five scanline
filters), JPEG (baseline SOF0 AND progressive SOF2, llmdata/jpeg.py),
animated GIF (llmdata/gif.py) and WAV (RIFF/PCM16, any channel count)
are decoded FOR REAL with pure stdlib(+numpy) kernels -- no
PIL/librosa needed -- and encoders exist for fixtures/sinks, so the
image, video AND audio paths are exercised end-to-end on genuinely
encoded payloads (`decode_audio` decodes once at the edge; windowing +
feature kernels then run on raw PCM). Compressed audio (mp3/flac) and
real video codecs (H.264/VP9) are NOT in this container, so those
decode slots remain stubbed: ``decode_stub=True`` (default) produces a
deterministic fake from the bytes; with ``decode_stub=False`` they
raise ``NotImplementedError`` where a real codec (librosa/av) would
plug in. The Spark-side plumbing --
schema, batch iteration, partition behavior -- is real and tested
(tests/test_multimodal.py).

Scale notes: binary payloads never shuffle -- decode is a map-only
stage; `spark.sql.files.maxPartitionBytes` bounds the per-task batch
footprint; Arrow batches bound Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_codec_kernel():
    """Self-contained PNG codec (stdlib zlib + numpy -- cloudpickled
    BY VALUE into worker closures; executors lack this repo on their
    PYTHONPATH). Decoder: 8-bit RGB (color type 2) and RGBA (6,
    alpha dropped), non-interlaced, ALL five scanline filters (None/
    Sub/Up/Average/Paeth per RFC 2083 section 6). Encoder: truecolor
    RGB with a selectable per-row filter (0 default; 0-4 cycling used
    by the round-trip tests to pin every decoder filter branch).

    Returns (decode, encode): decode(bytes) -> (h, w, 3) uint8 array,
    encode(arr, filter_type=0) -> bytes.
    """
    import struct
    import zlib

    import numpy as np

    SIG = PNG_SIGNATURE

    def decode(data):
        data = bytes(data)
        if data[:8] != SIG:
            raise ValueError("not a PNG (bad signature)")
        pos, ihdr, idat, plte = 8, None, [], None
        while pos + 8 <= len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            typ = data[pos + 4 : pos + 8]
            chunk = data[pos + 8 : pos + 8 + ln]
            pos += 12 + ln  # 4 len + 4 type + data + 4 crc
            if typ == b"IHDR":
                ihdr = chunk
            elif typ == b"PLTE":
                plte = chunk
            elif typ == b"IDAT":
                idat.append(chunk)
            elif typ == b"IEND":
                break
        if ihdr is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        w, h, depth, color, _comp, _filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        # color types: 0 grayscale, 2 RGB, 3 palette, 6 RGBA (8-bit)
        if depth != 8 or color not in (0, 2, 3, 6) or interlace != 0:
            raise ValueError(
                f"unsupported PNG variant (depth={depth} color={color} "
                f"interlace={interlace}); kernel handles 8-bit "
                "gray/RGB/palette/RGBA, non-interlaced"
            )
        if color == 3:
            if plte is None or len(plte) % 3 or not plte:
                raise ValueError("palette PNG missing/truncated PLTE")
            palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        nch = {0: 1, 2: 3, 3: 1, 6: 4}[color]
        stride = w * nch
        try:
            raw = zlib.decompress(b"".join(idat))
        except zlib.error as e:
            # boundary contract (same as the JPEG/GIF/WAV/WebP
            # kernels): malformed input surfaces as ValueError -- the
            # feat/resize kernels catch exactly that; a leaked
            # zlib.error from a corrupt IDAT would kill the stage
            # (found by the r8 corruption sweep)
            raise ValueError(f"PNG IDAT inflate failed: {e}") from e
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT length mismatch")
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            ft, cur = int(rows[y, 0]), rows[y, 1:].copy()
            if ft == 0:
                rec = cur
            elif ft == 1:  # Sub: + recon left -> prefix sum per channel lane
                rec = (
                    np.cumsum(cur.reshape(w, nch), axis=0, dtype=np.uint8)
                    .reshape(stride)
                )
            elif ft == 2:  # Up
                rec = cur + prev
            elif ft == 3:  # Average: sequential in x (left is recon)
                rec = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    left = int(rec[i - nch]) if i >= nch else 0
                    rec[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
            elif ft == 4:  # Paeth: sequential in x
                rec = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    a = int(rec[i - nch]) if i >= nch else 0
                    b = int(prev[i])
                    c = int(prev[i - nch]) if i >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (int(cur[i]) + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            out[y] = rec
            prev = rec
        img = out.reshape(h, w, nch)
        if color == 0:  # grayscale -> replicate
            return np.repeat(img, 3, axis=2)
        if color == 3:  # palette lookup
            idx = img.reshape(h, w)
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("PNG palette index out of range")
            return palette[idx]
        return img[:, :, :3].copy() if nch == 4 else img

    def encode(arr, filter_type=0):
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        h, w, nch = arr.shape
        if nch != 3:
            raise ValueError("encoder writes RGB888 only")
        lines = []
        prev = np.zeros(w * nch, dtype=np.uint8)
        for y in range(h):
            row = arr[y].reshape(-1)
            ft = filter_type if filter_type != -1 else y % 5
            if ft == 0:
                filt = row
            elif ft == 1:
                left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
                filt = row - left
            elif ft == 2:
                filt = row - prev
            elif ft == 3:
                left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
                filt = row - (
                    (left.astype(np.int32) + prev.astype(np.int32)) // 2
                ).astype(np.uint8)
            elif ft == 4:
                left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
                up = prev
                ul = np.concatenate([np.zeros(nch, np.uint8), prev[:-nch]])
                a, b, c = (
                    left.astype(np.int32),
                    up.astype(np.int32),
                    ul.astype(np.int32),
                )
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                ).astype(np.uint8)
                filt = row - pred
            else:
                raise ValueError(f"bad filter type {ft}")
            lines.append(bytes([ft]) + filt.tobytes())
            prev = row
        comp = zlib.compress(b"".join(lines), 9)

        def chunk(typ, payload):
            return (
                len(payload).to_bytes(4, "big")
                + typ
                + payload
                + zlib.crc32(typ + payload).to_bytes(4, "big")
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")

    return decode, encode


def decode_png(data: bytes):
    """Driver-side convenience over the worker kernel."""
    return _png_codec_kernel()[0](data)


def encode_png(arr, filter_type: int = 0) -> bytes:
    """RGB888 array -> PNG bytes (filter_type=-1 cycles 0-4 per row)."""
    return _png_codec_kernel()[1](arr, filter_type)


def _wav_codec_kernel():
    """Self-contained WAV (RIFF/PCM16) codec -- stdlib struct + numpy,
    cloudpickled by value into worker closures like the PNG kernel.

    Decoder walks RIFF chunks (word-aligned per the spec), accepts
    canonical and non-canonical chunk orders (LIST/fact chunks before
    ``data`` are skipped), and handles any channel count; only format
    1 (integer PCM) at 16 bits is supported -- that is the universal
    interchange layout; compressed variants (mp3/flac/ADPCM) stay in
    the documented codec-stub slot.

    Returns (decode, encode):
      decode(bytes) -> ((n_frames, n_channels) int16 array, sample_rate)
      encode(samples, sample_rate) -> bytes (mono 1-D or (n, ch) 2-D in)
    """
    import struct

    import numpy as np

    def decode(data):
        b = bytes(data)
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV (bad RIFF/WAVE signature)")
        pos, fmt, pcm = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                if len(body) < 16:
                    raise ValueError("truncated WAV chunk (fmt < 16 bytes)")
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                if len(body) != size:
                    raise ValueError(
                        "truncated WAV chunk (data shorter than declared)"
                    )
                pcm = body
            pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
        if fmt is None or pcm is None:
            raise ValueError("WAV missing fmt /data chunk")
        audio_format, n_ch, sr, _brate, _align, bits = fmt
        if audio_format != 1 or bits != 16 or n_ch < 1:
            raise ValueError(
                f"unsupported WAV variant (format={audio_format} "
                f"bits={bits} channels={n_ch}); kernel handles 16-bit PCM"
            )
        frame = 2 * n_ch
        usable = (len(pcm) // frame) * frame
        samples = np.frombuffer(pcm[:usable], dtype="<i2").reshape(-1, n_ch)
        return samples, int(sr)

    def encode(samples, sample_rate):
        arr = np.asarray(samples, dtype="<i2")
        if arr.ndim == 1:
            arr = arr[:, None]
        n_ch = arr.shape[1]
        pcm = arr.tobytes()
        block = 2 * n_ch
        fmt = struct.pack(
            "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16
        )
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(pcm))
            + pcm
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    return decode, encode


def decode_wav(data: bytes):
    """Driver-side convenience: bytes -> (int16 (n, ch) array, rate)."""
    return _wav_codec_kernel()[0](data)


def encode_wav(samples, sample_rate: int) -> bytes:
    """PCM16 array (1-D mono or (n, ch)) -> WAV bytes."""
    return _wav_codec_kernel()[1](samples, sample_rate)


def _make_is_wav():
    """Factory so worker closures capture the checker BY VALUE
    (a module-global function pickles by reference -- executors lack
    this repo on PYTHONPATH)."""

    def is_wav(payload) -> bool:
        b = bytes(payload[:12]) if payload is not None else b""
        return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"

    return is_wav


_is_wav = _make_is_wav()  # driver-side convenience


def _pcm_feature_kernel():
    """Self-contained PCM feature extractor (the real fbank-lite slot):
    int16 mono samples -> 15 doubles [mean, std, rms, min, max, peak,
    zcr] + 8 log10(1+energy) rFFT band energies. Amplitudes are
    normalized to [-1, 1] (/32768) so features are codec-independent.
    Deterministic: fixed-size numpy ops, no randomness.
    """
    import numpy as np

    def feat(x_i16):
        x = np.asarray(x_i16, dtype=np.float64) / 32768.0
        n = x.size
        if n == 0:
            return [0.0] * 15
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if n > 1
            else 0.0
        )
        stats = [
            float(x.mean()),
            float(x.std()),
            float(np.sqrt(np.mean(x * x))),
            float(x.min()),
            float(x.max()),
            float(np.abs(x).max()),
            zcr,
        ]
        mag2 = np.abs(np.fft.rfft(x)) ** 2
        bands = [
            float(np.log10(1.0 + b.sum())) for b in np.array_split(mag2, 8)
        ]
        return stats + bands

    return feat

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthetic_media(spark: Any, n: int = 64) -> DataFrame:
    """Deterministic media table: IMAGE payloads cycle through REAL
    encoded PNGs, REAL baseline/progressive JPEGs and REAL lossless
    WebPs (deterministic gradient pattern; JPEG via the numpy JFIF
    codec in llmdata/jpeg.py, odd image rows 4:2:0-subsampled; WebP
    via the VP8L codec in llmdata/webp.py, alternating plain /
    subtract-green modes), AUDIO payloads are REAL WAV files
    (deterministic integer-triangle PCM16 waves, stdlib RIFF codec),
    and VIDEO payloads are REAL animated GIFs (llmdata/gif.py:
    LZW-compressed moving gradient, meta.n_frames == actual frame
    count), so every decode path downstream is genuine; only
    external-library codecs (H.264/VP9, mp3/flac) remain documented
    stubs."""
    import numpy as np

    from .gif import gif_codec_kernel
    from .jpeg import jpeg_codec_kernel
    from .webp import webp_codec_kernel

    _, png_encode = _png_codec_kernel()
    _, jpeg_encode = jpeg_codec_kernel()
    _, gif_encode = gif_codec_kernel()
    _, wav_encode = _wav_codec_kernel()
    _, webp_encode = webp_codec_kernel()
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 4 + (5 * i) % 45, 4 + (7 * i) % 45
            ys, xs = np.mgrid[0:h, 0:w]
            img = np.stack(
                [xs % 256, ys % 256, (xs + ys + i) % 256], axis=-1
            ).astype(np.uint8)
            fmt = (i // 3) % 3
            if fmt == 0:
                payload = png_encode(img, filter_type=i % 5)
                meta = (w, h, None, None, "image/png")
            elif fmt == 1:
                # alternate baseline / progressive so the census and
                # resize paths exercise both real JPEG decode modes
                payload = jpeg_encode(
                    img,
                    quality=95,
                    subsample=bool((i // 6) % 2),
                    progressive=bool((i // 12) % 2),
                )
                meta = (w, h, None, None, "image/jpeg")
            else:
                # lossless VP8L, alternating plain / subtract-green
                payload = webp_encode(
                    img, subtract_green=bool((i // 9) % 2)
                )
                meta = (w, h, None, None, "image/webp")
        elif kind == "audio":
            # integer triangle wave: period/amplitude vary by id;
            # pure integer arithmetic -> bit-exact across platforms
            n_samp = 160 * (4 + i % 8)
            period = 32 + 8 * (i % 5)
            t = np.arange(n_samp, dtype=np.int64)
            tri = np.abs((t * 2) % (2 * period) - period) - period // 2
            wave = (tri * (20000 // period)).astype(np.int16)
            payload = wav_encode(wave, 16000)
            meta = (None, None, 16000, None, "audio/wav")
        else:
            # real animated GIF: 16x16 moving-bar gradient, frame count
            # mirrors the old meta so frame-sampling tests keep shape
            n_frames = 30 * (1 + i % 10)
            pal = np.stack(
                [
                    (np.arange(16) * 16 + i) % 256,
                    (np.arange(16) * 8) % 256,
                    np.full(16, (i * 7) % 256),
                ],
                axis=1,
            ).astype(np.uint8)
            base = (np.add.outer(np.arange(16), np.arange(16)) + i) % 16
            frames = [
                ((base + f) % 16).astype(np.uint8) for f in range(n_frames)
            ]
            payload = gif_encode(frames, pal, delays_cs=[4] * n_frames)
            meta = (16, 16, None, n_frames, "image/gif")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def write_media_fixture(
    spark: Any, path: str, n: int = 64, payload_kb: int = 0
) -> str:
    """Persist synthetic media to parquet (the writable-fixture path a
    real pipeline would use -- binary columns live in object storage,
    not in createDataFrame literals).

    ``payload_kb`` > 0 inflates each payload to roughly that size so
    scan-split behavior (`spark.sql.files.maxPartitionBytes`) can be
    exercised with realistically heavy binary cells."""
    media = synthetic_media(spark, n)
    if payload_kb > 0:
        reps = max(1, (payload_kb * 1024) // 32)
        media = media.withColumn(
            "payload", F.expr(f"repeat(payload, {reps})").cast("binary")
        )
    # one file per partition; several files so maxPartitionBytes has
    # split points to work with (parquet splits at row-group/file edges).
    # Uncompressed: real media payloads (JPEG/MP3/H.264) are already
    # entropy-coded, so on-disk size ~ payload size; snappy on the
    # synthetic repeated digest would shrink files ~1000x and make the
    # scan-split behavior untestable.
    (
        media.repartition(8, "media_id")
        .write.mode("overwrite")
        .option("compression", "uncompressed")
        .parquet(path)
    )
    return path


def read_media(spark: Any, path: str) -> DataFrame:
    """Read a media fixture back with the canonical column order."""
    return spark.read.parquet(path).select([f.name for f in MEDIA_SCHEMA.fields])


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction; Arrow-batched, map-only.

    PNG payloads (detected by signature) and baseline JPEG payloads
    (SOI signature, numpy JFIF codec -- llmdata/jpeg.py) are REALLY
    decoded and get pixel-statistic features: [width, height,
    per-channel mean (3), per-channel std (3), per-channel min (3),
    per-channel max (3), luma mean, luma std] = FEATURE_DIM doubles,
    all deterministic. WAV payloads (RIFF signature) are REALLY
    decoded too: [sample_rate] + the 15 PCM stats/band energies from
    `_pcm_feature_kernel` (mono downmix = floor-mean across channels).
    Other payloads fall back to the sha256 stub (``decode_stub=True``)
    or raise where the compressed-audio/video codec would plug in.

    The closure is self-contained (no module-global references): Spark
    Python workers may not have this repo on their PYTHONPATH.
    """
    from .gif import gif_codec_kernel, make_is_gif
    from .jpeg import jpeg_codec_kernel, make_is_jpeg
    from .webp import make_is_webp, webp_codec_kernel

    dim = FEATURE_DIM
    png_decode, _ = _png_codec_kernel()  # by-value for the workers
    jpeg_decode, _ = jpeg_codec_kernel()
    gif_decode, _ = gif_codec_kernel()
    webp_decode, _ = webp_codec_kernel()
    is_jpeg = make_is_jpeg()
    is_gif = make_is_gif()
    is_webp = make_is_webp()
    wav_decode, _ = _wav_codec_kernel()
    pcm_feat = _pcm_feature_kernel()
    is_wav = _make_is_wav()  # by-value for the workers
    sig = PNG_SIGNATURE

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as np

        def wav_features(payload):
            samples, sr = wav_decode(payload)
            mono = np.floor_divide(
                samples.astype(np.int32).sum(axis=1), samples.shape[1]
            )
            return [float(sr), *pcm_feat(mono)][:dim]

        def pixel_features(img):
            img = img.astype(np.float64)
            h, w, _ = img.shape
            luma = img @ np.array([0.299, 0.587, 0.114])
            return [
                float(w),
                float(h),
                *(float(x) for x in img.mean(axis=(0, 1))),
                *(float(x) for x in img.std(axis=(0, 1))),
                *(float(x) for x in img.min(axis=(0, 1))),
                *(float(x) for x in img.max(axis=(0, 1))),
                float(luma.mean()),
                float(luma.std()),
            ][:dim]

        def stub_decode(payload):
            # deterministic fake 'decode': bytes -> dim doubles
            h = _hl.sha256(payload or b"").digest()
            return [h[i] / 255.0 for i in range(dim)]

        def feat(payload):
            if payload is not None and bytes(payload[:8]) == sig:
                try:
                    return pixel_features(png_decode(payload))
                except ValueError:
                    # PNG-signed garbage / corrupt IDAT -> codec-stub
                    # slot (r8: the corruption sweep found this branch
                    # had no net, unlike its JPEG/GIF/WAV siblings)
                    pass
            if payload is not None and is_gif(payload):
                try:
                    frames, _ = gif_decode(payload)
                    # video features: pixel stats over the FULL frame
                    # volume (stacked along height) -- deterministic
                    return pixel_features(
                        np.concatenate(frames, axis=0)
                    )[:dim]
                except ValueError:
                    # GIF-signed garbage -> codec-stub slot
                    pass
            if payload is not None and is_jpeg(payload):
                try:
                    return pixel_features(jpeg_decode(payload))
                except (ValueError, NotImplementedError):
                    # jpeg.decode normalizes every malformed-input
                    # failure to ValueError at its boundary and raises
                    # NotImplementedError for arithmetic/lossless frames; a
                    # narrower catch means a genuine kernel regression
                    # on a VALID baseline JPEG still surfaces instead
                    # of being masked as stub output (r5 advice)
                    pass
            if payload is not None and is_webp(payload):
                try:
                    # lossless VP8L decode (llmdata/webp.py); RGB
                    # features over the decoded pixels, like PNG
                    return pixel_features(webp_decode(payload)[:, :, :3])
                except ValueError:
                    # RIFF/WEBP-signed but lossy-VP8 or malformed ->
                    # the documented codec-stub slot
                    pass
            if payload is not None and is_wav(payload):
                try:
                    return wav_features(payload)
                except ValueError:
                    # RIFF-signed but unsupported variant (float/24-bit/
                    # ADPCM/truncated) -> same codec-stub slot as non-WAV
                    pass
            if not decode_stub:
                raise NotImplementedError(
                    "only the PNG, baseline+progressive-JPEG, "
                    "animated-GIF and WAV codecs are real; "
                    "compressed-audio/H.264-class codecs (librosa/av) "
                    "are not installed in this container -- pass "
                    "decode_stub=True for such payloads"
                )
            return stub_decode(payload)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(feat),
                }
            )

    return media.mapInPandas(op, schema=_FEATURE_SCHEMA)


def media_feature_census(spark: Any, sf_dir: str = "") -> DataFrame:
    """Driver-contract query: the full multimodal plumbing end-to-end.

    synthetic media -> mapInPandas feature extraction (REAL PNG and
    WAV decodes; sha256 stub only for video) -> frame-sample explode
    -> per-kind census. Deterministic by construction (per-payload
    features are map-side; the aggregation is min/max over doubles
    and integer sums -- never a reassociable double sum), so the
    rows-only check is stable.
    ``sf_dir`` is ignored: media payloads are generated, not a fixture
    table (TESTDATA.md has no binary column).
    """
    media = synthetic_media(spark, 64)
    feats = extract_features(media)
    frames = frame_sample(media).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_frames_sampled")
    )
    # the REAL decode pass: sampled GIF frames with composited pixels;
    # integer sum over decoded bytes is deterministic
    decoded = (
        extract_video_frames(media)
        .agg(
            F.count(F.lit(1)).alias("n_frames_decoded"),
            F.sum(F.length("pixels")).alias("decoded_pixel_bytes"),
        )
        .select(F.lit("video").alias("kind"), "n_frames_decoded", "decoded_pixel_bytes")
    )
    census = feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min(F.element_at("feature", 1)).alias("min_f0"),
        F.max(F.element_at("feature", 1)).alias("max_f0"),
    )
    return (
        census.join(frames, "kind")
        .join(decoded, "kind", "left")
        .orderBy("kind")
    )


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling INDEX plumbing: one output row per sampled
    frame index -- pure JVM-side sequence/explode from metadata, no
    decode (the cheap planning pass; `extract_video_frames` is the
    decode pass that attaches real pixels)."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.n_frames").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_id", "kind", F.explode(frames).alias("frame_idx")
    )


_VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("delay_cs", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def extract_video_frames(
    media: DataFrame, every_n: int = 30, decode_stub: bool = True
) -> DataFrame:
    """REAL frame extraction: animated-GIF payloads (llmdata/gif.py)
    are decoded and every ``every_n``-th composited frame is emitted
    with its raw RGB888 buffer + delay -- the decode counterpart of
    `frame_sample`'s index pass.

    Non-GIF video payloads (H.264-class -- no codec in container)
    fall back to a deterministic sha256 stub buffer per sampled frame
    (``decode_stub=True``, frame count from meta) or raise. The kind
    filter runs JVM-side BEFORE the Python stage. Arrow-batched,
    map-only: payloads never shuffle; output rows carry one frame
    each, so downstream per-frame ops (resize, features) parallelize
    by row regardless of how many frames one video has.
    """
    from .gif import gif_codec_kernel, make_is_gif

    gif_decode, _ = gif_codec_kernel()
    is_gif = make_is_gif()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as np  # noqa: F401  (kernel deps ship by value)

        def rows_for(media_id, payload, meta):
            if payload is not None and is_gif(payload):
                try:
                    frames, delays = gif_decode(payload)
                except ValueError:
                    frames = None
                if frames is not None:
                    n = len(frames)
                    for fi in range(0, n, every_n):
                        h, w = frames[fi].shape[:2]
                        yield (
                            media_id, fi, n, w, h, delays[fi],
                            frames[fi].tobytes(),
                        )
                    return
            if not decode_stub:
                raise NotImplementedError(
                    "only the animated-GIF video codec is real; "
                    "H.264/VP9-class containers need av/ffmpeg -- "
                    "absent from this container; pass decode_stub=True"
                )
            n = (meta["n_frames"] if meta is not None else None) or 1
            for fi in range(0, n, every_n):
                h = _hl.sha256(bytes(payload or b"") + fi.to_bytes(4, "big"))
                yield media_id, fi, n, None, None, None, h.digest()

        for pdf in batches:
            out = [
                row
                for m, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"])
                for row in rows_for(m, p, meta)
            ]
            yield pd.DataFrame(
                out,
                columns=[f.name for f in _VIDEO_FRAME_SCHEMA.fields],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        op, schema=_VIDEO_FRAME_SCHEMA
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


_FRAME_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_frames(
    frames: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize `extract_video_frames` output to a fixed shape -- the
    tail of the video training pipeline (sample -> decode -> resize to
    model input). Same nearest-neighbor gather as `resize_images`,
    over the already-decoded raw RGB buffers; rows without real
    dimensions (stub frames from codec-less containers) pass through
    with null pixels. Arrow-batched, map-only, one row per frame, so
    resize parallelism is per-frame regardless of per-video frame
    counts (the skew that kills per-video kernels)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def nn(payload, sw, sh):
            # nullable int columns arrive as floats (NaN = null) in
            # the Arrow -> pandas conversion
            if payload is None or sw is None or sh is None or sw != sw or sh != sh:
                return None
            sw, sh = int(sw), int(sh)
            img = np.frombuffer(bytes(payload), np.uint8).reshape(sh, sw, 3)
            ys = (np.arange(height, dtype=np.int64) * sh) // height
            xs = (np.arange(width, dtype=np.int64) * sw) // width
            return img[ys][:, xs].tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "width": width,
                    "height": height,
                    "pixels": [
                        nn(p, w, h)
                        for p, w, h in zip(
                            pdf["pixels"], pdf["width"], pdf["height"]
                        )
                    ],
                }
            )

    return frames.mapInPandas(op, schema=_FRAME_RESIZE_SCHEMA)


def synthetic_raw_images(spark: Any, n: int = 8, max_side: int = 48) -> DataFrame:
    """Deterministic RAW-RGB image table: payload is the uncompressed
    width*height*3 RGB888 buffer (pixel(y,x) = (x%256, y%256,
    (x+y)%256)) -- the post-decode representation the resize kernel
    contract operates on, producible without any codec."""
    rows = []
    for i in range(n):
        w = 4 + (5 * i) % (max_side - 3)
        h = 4 + (7 * i) % (max_side - 3)
        payload = bytes(
            c
            for y in range(h)
            for x in range(w)
            for c in (x % 256, y % 256, (x + y) % 256)
        )
        rows.append((i, "image", payload, (w, h, None, None, "image/x-raw-rgb")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    payload_format: str = "encoded",
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage.

    Output ``pixels`` is the resized RGB888 buffer (width*height*3
    bytes -- the contract a real PIL/torchvision kernel honors). Two
    payload formats:

    - ``payload_format="raw_rgb"``: REAL kernel. The payload is an
      uncompressed src_width*src_height*3 RGB buffer (meta carries the
      dims) and the resize is a pure-numpy nearest-neighbor gather
      (``src_idx = dst_idx * src // dst``, the classic NN mapping) --
      actual pixel output, no codec needed, vectorized per image.
    - ``payload_format="encoded"``: PNG payloads (by signature) are
      REALLY decoded by the stdlib codec, and baseline + progressive
      JPEG payloads (SOI signature) by the numpy JFIF codec
      (llmdata/jpeg.py); both are resized by the same NN gather --
      true pixels out, no PIL.
      Remaining encodings (WebP, AVIF...) still need
      PIL/torchvision (absent from this container): the stub
      synthesizes a deterministic buffer from sha256(payload);
      ``decode_stub=False`` raises where the real codec plugs in.

    The kind filter runs BEFORE the Python stage (JVM-side, pushed to
    the scan), so non-image payloads never cross the Arrow boundary.
    """
    from .jpeg import jpeg_codec_kernel, make_is_jpeg
    from .webp import make_is_webp, webp_codec_kernel

    out_len = width * height * 3
    png_decode, _ = _png_codec_kernel()  # by-value for the workers
    jpeg_decode, _ = jpeg_codec_kernel()
    webp_decode, _ = webp_codec_kernel()
    is_jpeg = make_is_jpeg()
    is_webp = make_is_webp()
    sig = PNG_SIGNATURE

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as np

        def nn_gather(img):
            sh, sw = img.shape[:2]
            ys = (np.arange(height, dtype=np.int64) * sh) // height
            xs = (np.arange(width, dtype=np.int64) * sw) // width
            return img[ys][:, xs].tobytes()

        def nn_resize(payload, m):
            if payload is None:
                return None
            sw, sh = int(m["width"]), int(m["height"])
            buf = np.frombuffer(bytes(payload), dtype=np.uint8)
            if buf.size != sw * sh * 3:
                raise ValueError(
                    f"raw_rgb payload is {buf.size} bytes, expected "
                    f"{sw}x{sh}x3={sw * sh * 3}"
                )
            return nn_gather(buf.reshape(sh, sw, 3))

        def stub_resize(payload):
            if payload is None:
                return None
            h = _hl.sha256(payload).digest()
            return (h * (out_len // len(h) + 1))[:out_len]

        def decode_resize(payload):
            if payload is None:
                return None
            if bytes(payload[:8]) == sig:
                try:
                    return nn_gather(png_decode(payload))
                except ValueError:
                    # PNG-signed garbage -> documented stub slot (r8)
                    pass
            if is_jpeg(payload):
                try:
                    return nn_gather(jpeg_decode(payload))
                except (ValueError, NotImplementedError):
                    # jpeg.decode normalizes SOI-signed garbage /
                    # truncation / corrupt entropy streams to ValueError
                    # at its boundary and raises NotImplementedError for
                    # arithmetic/lossless frames -> documented stub slot. The
                    # catch is deliberately NO wider: a kernel bug on a
                    # valid baseline JPEG must surface, not silently
                    # degrade to stub output (r5 advice)
                    pass
            if is_webp(payload):
                try:
                    return nn_gather(webp_decode(payload)[:, :, :3])
                except ValueError:
                    # lossy VP8 / malformed RIFF -> documented stub slot
                    pass
            if not decode_stub:
                raise NotImplementedError(
                    "only the PNG, baseline+progressive-JPEG and "
                    "lossless-WebP (VP8L) codecs are real; other image "
                    "codecs (PIL/torchvision) are not installed in this "
                    "container -- pass decode_stub=True or feed "
                    "supported payloads"
                )
            return stub_resize(payload)

        for pdf in batches:
            if payload_format == "raw_rgb":
                pixels = [
                    nn_resize(p, m) for p, m in zip(pdf["payload"], pdf["meta"])
                ]
            else:
                pixels = pdf["payload"].map(decode_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": pdf["meta"].map(lambda m: m["width"]),
                    "src_height": pdf["meta"].map(lambda m: m["height"]),
                    "width": width,
                    "height": height,
                    "pixels": pixels,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        op, schema=_RESIZE_SCHEMA
    )


def decode_audio(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode-at-the-edge audio stage: encoded WAV payloads -> raw
    mono PCM16 payloads (the contract `audio_windows` and the feature
    kernels operate on), mirroring how a real pipeline decodes ONCE at
    ingest and windows over raw samples thereafter.

    WAV payloads (RIFF signature) are genuinely decoded by the stdlib
    codec; multi-channel audio is downmixed to mono by floor-mean;
    ``meta.sample_rate`` is taken from the WAV header (overriding any
    stale metadata) and ``meta.mime`` becomes ``audio/x-raw-pcm16``.
    Non-WAV audio payloads pass through unchanged as opaque PCM
    (``decode_stub=True``, the pre-existing fake contract) or raise
    where an mp3/flac codec would plug in. Non-audio rows pass through
    untouched. Map-only: payloads never shuffle.
    """
    wav_decode, _ = _wav_codec_kernel()
    is_wav = _make_is_wav()  # by-value for the workers

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(kind, payload, meta):
            if kind != "audio" or payload is None:
                return payload, meta
            if is_wav(payload):
                try:
                    samples, sr = wav_decode(payload)
                except ValueError:
                    # RIFF-signed but not 16-bit integer PCM (IEEE
                    # float, 24-bit, ADPCM, mp3-in-WAV, truncated):
                    # exactly the codec-stub slot, same as non-WAV.
                    samples = None
                if samples is not None:
                    mono = np.floor_divide(
                        samples.astype(np.int32).sum(axis=1), samples.shape[1]
                    ).astype("<i2")
                    meta = dict(meta) if meta is not None else {}
                    meta["sample_rate"] = sr
                    meta["mime"] = "audio/x-raw-pcm16"
                    return mono.tobytes(), meta
            if not decode_stub:
                raise NotImplementedError(
                    "only 16-bit PCM WAV decode is real; compressed "
                    "audio (mp3/flac/ADPCM/float-WAV) needs librosa/av "
                    "-- absent from this container; pass "
                    "decode_stub=True to treat the payload as "
                    "already-raw PCM"
                )
            return payload, meta

        for pdf in batches:
            decoded = [
                one(k, p, m)
                for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
            ]
            out = pdf.copy()
            out["payload"] = [d[0] for d in decoded]
            out["meta"] = [d[1] for d in decoded]
            yield out

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def audio_windows(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio windowing plumbing: one row per (media_id, window) with
    sample offsets -- pure JVM-side sequence/explode, NO Python stage.

    Treats the payload as mono PCM (``bytes_per_sample`` bytes per
    sample, the contract a real loader honors): n_samples =
    len(payload) / bytes_per_sample, window/hop in samples from
    meta.sample_rate. The window INDEXING is native because it only
    needs arithmetic -- Python is reserved for the per-window feature
    kernel (`audio_window_features`). Windows shorter than a full
    window_ms at the tail are dropped (librosa center=False framing).
    """
    sr = F.col("meta.sample_rate")
    n_samples = (F.length("payload") / bytes_per_sample).cast("long")
    win = (sr * window_ms / 1000).cast("long")
    hop = (sr * hop_ms / 1000).cast("long")
    starts = F.when(
        (F.col("kind") == "audio") & sr.isNotNull() & (n_samples >= win),
        F.sequence(F.lit(0).cast("long"), n_samples - win, hop),
    )
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            sr.alias("sample_rate"),
            F.explode(starts).alias("start_sample"),
            win.alias("n_window_samples"),
            "payload",
        )
        .select(
            "media_id",
            "sample_rate",
            "start_sample",
            (F.col("start_sample") + F.col("n_window_samples")).alias("end_sample"),
            "payload",
        )
    )


_AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("start_sample", T.LongType(), False),
        T.StructField("end_sample", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def audio_window_features(
    windows: DataFrame,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Per-window feature kernel (the fbank-lite slot) over
    `audio_windows` output -- REAL, no stub: the payload is raw mono
    PCM16 (`decode_audio` upstream guarantees this for WAV inputs),
    the window's sample slice is taken per row, and features are
    [n_window_samples] + the 15 stats/rFFT band energies from
    `_pcm_feature_kernel` = FEATURE_DIM doubles. Arrow-batched,
    map-only."""
    dim = FEATURE_DIM
    pcm_feat = _pcm_feature_kernel()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def feat(row):
            payload = row["payload"]
            if payload is None:
                return None
            lo = int(row["start_sample"]) * bytes_per_sample
            hi = int(row["end_sample"]) * bytes_per_sample
            x = np.frombuffer(bytes(payload[lo:hi]), dtype="<i2")
            return [float(x.size), *pcm_feat(x)][:dim]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "start_sample": pdf["start_sample"],
                    "end_sample": pdf["end_sample"],
                    "feature": pdf.apply(feat, axis=1),
                }
            )

    return windows.mapInPandas(op, schema=_AUDIO_FEATURE_SCHEMA)
