"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; the
decode/feature steps run as Arrow-batched ``mapInPandas`` stages. The
image/audio codecs are NOT in this container, so the decode kernel is
stubbed: ``decode_stub=True`` (default) produces a deterministic fake
feature vector from the bytes; with ``decode_stub=False`` it raises
``NotImplementedError`` where a real codec (PIL/librosa/av) would
plug in. The Spark-side plumbing -- schema, batch iteration, partition
behavior -- is real and tested (tests/test_multimodal.py).

Scale notes: binary payloads never shuffle -- decode is a map-only
stage; `spark.sql.files.maxPartitionBytes` bounds the per-task batch
footprint; Arrow batches bound Python memory.
"""

from __future__ import annotations

import hashlib
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

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthetic_media(spark: Any, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 8)
        meta = (
            64 + i % 512 if kind == "image" else None,
            64 + (i * 7) % 512 if kind == "image" else None,
            16000 if kind == "audio" else None,
            30 * (1 + i % 10) if kind == "video" else None,
            f"application/x-fake-{kind}",
        )
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

    The closure is self-contained (no module-global references): Spark
    Python workers may not have this repo on their PYTHONPATH.
    """
    dim = FEATURE_DIM

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def stub_decode(payload):
            # deterministic fake 'decode': bytes -> dim doubles
            h = _hl.sha256(payload or b"").digest()
            return [h[i] / 255.0 for i in range(dim)]

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs (PIL/librosa/av) are not installed in "
                    "this container; pass decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(stub_decode),
                }
            )

    return media.mapInPandas(op, schema=_FEATURE_SCHEMA)


def media_feature_census(spark: Any, sf_dir: str = "") -> DataFrame:
    """Driver-contract query: the full multimodal plumbing end-to-end.

    synthetic media -> mapInPandas feature extraction -> frame-sample
    explode -> per-kind census. Deterministic by construction (sha256
    stub decode; min/max over doubles, integer sums -- never a
    reassociable double sum), so the rows-only check is stable.
    ``sf_dir`` is ignored: media payloads are generated, not a fixture
    table (TESTDATA.md has no binary column).
    """
    media = synthetic_media(spark, 64)
    feats = extract_features(media)
    frames = frame_sample(media).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_frames_sampled")
    )
    census = feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min(F.element_at("feature", 1)).alias("min_f0"),
        F.max(F.element_at("feature", 1)).alias("max_f0"),
    )
    return census.join(frames, "kind").orderBy("kind")


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (real decoder would attach the frame tensor)."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.n_frames").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_id", "kind", F.explode(frames).alias("frame_idx")
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
    - ``payload_format="encoded"``: the payload is JPEG/PNG bytes. The
      decode step needs PIL/torchvision (absent from this container),
      so the stub synthesizes a deterministic buffer from
      sha256(payload); ``decode_stub=False`` raises where the real
      codec plugs in.

    The kind filter runs BEFORE the Python stage (JVM-side, pushed to
    the scan), so non-image payloads never cross the Arrow boundary.
    """
    out_len = width * height * 3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as np

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
            img = buf.reshape(sh, sw, 3)
            ys = (np.arange(height, dtype=np.int64) * sh) // height
            xs = (np.arange(width, dtype=np.int64) * sw) // width
            return img[ys][:, xs].tobytes()

        def stub_resize(payload):
            if payload is None:
                return None
            h = _hl.sha256(payload).digest()
            return (h * (out_len // len(h) + 1))[:out_len]

        for pdf in batches:
            if payload_format == "raw_rgb":
                pixels = [
                    nn_resize(p, m) for p, m in zip(pdf["payload"], pdf["meta"])
                ]
            elif not decode_stub:
                raise NotImplementedError(
                    "real image codecs (PIL/torchvision) are not installed "
                    "in this container; pass decode_stub=True or feed "
                    "payload_format='raw_rgb' buffers"
                )
            else:
                pixels = pdf["payload"].map(stub_resize)
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
    decode_stub: bool = True,
) -> DataFrame:
    """Per-window feature kernel (the MFCC/fbank slot) over
    `audio_windows` output: Arrow-batched, stub = deterministic sha256
    of the window's byte slice -> FEATURE_DIM doubles."""
    dim = FEATURE_DIM

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def stub_feat(row):
            payload = row["payload"]
            if payload is None:
                return None
            lo = int(row["start_sample"]) * bytes_per_sample
            hi = int(row["end_sample"]) * bytes_per_sample
            h = _hl.sha256(payload[lo:hi]).digest()
            return [h[i] / 255.0 for i in range(dim)]

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real audio codecs (librosa/torchaudio) are not installed "
                    "in this container; pass decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "start_sample": pdf["start_sample"],
                    "end_sample": pdf["end_sample"],
                    "feature": pdf.apply(stub_feat, axis=1),
                }
            )

    return windows.mapInPandas(op, schema=_AUDIO_FEATURE_SCHEMA)
