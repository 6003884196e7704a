"""Streaming training-data ingest: the curation verdict on a document
STREAM.

The curation signals that are per-row functions of ``text`` (quality,
language, exact-dup hash) are stateless, so the batch expressions from
llmdata/text.py apply to a streaming DataFrame unchanged -- same fused
single-projection plan as llmdata/curation.py. Exact dedup is a keyed
seen-flag in the state store (``applyInPandasWithState`` on the text
hash) so every arrival still gets a verdict row -- ``dropDuplicates``
would swallow repeats instead of flagging them. Canonical = first
ARRIVAL batch's lowest doc_id, vs the batch pipeline's global
min-doc_id (same kept-set cardinality, possibly different
representative; the documented delta mirrors D1's batch/streaming
split in streaming/pipeline.py).

Near-dup exclusion is NOT recomputed per stream: banded LSH needs a
corpus-wide self-join, which is an offline artifact. The streaming
analog is `neardup_probe_stream`: each arrival probes the
batch-refreshed band index (`write_neardup_index`) with a
stream-static join, then exact-verifies candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..llmdata.curation import (
    DEFAULT_KEEP_LANG,
    DEFAULT_QUALITY_THRESHOLD,
)
from ..llmdata.text import predicted_lang_column, quality_columns

DOCUMENTS_STREAM_SCHEMA = "doc_id long, text string, lang string"

_FLAGGED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("quality_score", T.DoubleType()),
        T.StructField("predicted_lang", T.StringType()),
        T.StructField("is_duplicate", T.BooleanType()),
    ]
)


def stream_documents(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source replay of a documents directory (one file per
    micro-batch, like the bronze replay harness)."""
    return (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def curation_stream(
    docs: DataFrame,
    quality_threshold: float = DEFAULT_QUALITY_THRESHOLD,
    keep_lang: str = DEFAULT_KEEP_LANG,
) -> DataFrame:
    """Streaming curation verdict: (doc_id, predicted_lang,
    quality_score, n_tokens, drop_reason, kept).

    Same drop_reason precedence as the batch pipeline minus
    near_duplicate (see module docstring); exact_duplicate = stateful
    first-arrival dedup on md5(text). State is one boolean per
    distinct text hash -- unbounded ValueState semantics (the
    reference's D1 mode); at scale bound it with a state TTL
    (GroupStateTimeout) or an upstream watermarked dedup."""
    qc = quality_columns(F.col("text"))
    sig = docs.select(
        "doc_id",
        qc["n_tokens"].alias("n_tokens"),
        qc["quality_score"].alias("quality_score"),
        predicted_lang_column(F.col("text")).alias("predicted_lang"),
        F.md5(F.col("text")).alias("_text_hash"),
    )

    # dropDuplicates would silently SWALLOW repeat arrivals; a verdict
    # stream must emit a row per document, so the dedup is a keyed
    # seen-flag in the state store: within a batch the lowest doc_id of
    # an unseen hash is canonical, everything after is flagged.
    def flag(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = state.exists
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        dup = [True] * len(batch)
        if not seen:
            dup[0] = False
            state.update((True,))
        out = batch[
            ["doc_id", "n_tokens", "quality_score", "predicted_lang"]
        ].copy()
        out["is_duplicate"] = dup
        yield out

    flagged = sig.groupBy("_text_hash").applyInPandasWithState(
        flag,
        outputStructType=_FLAGGED_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drop_reason = (
        F.when(F.col("predicted_lang") != keep_lang, "non_english")
        .when(F.col("quality_score") < quality_threshold, "low_quality")
        .when(F.col("is_duplicate"), "exact_duplicate")
    )
    return flagged.select(
        "doc_id",
        "predicted_lang",
        "quality_score",
        "n_tokens",
        drop_reason.alias("drop_reason"),
        drop_reason.isNull().alias("kept"),
    )


def write_neardup_index(docs: DataFrame, path: str) -> str:
    """Persist the batch-built LSH band index + shingle sets: the
    OFFLINE artifact the streaming probe joins against.

    Layout: one row per (doc_id, band_idx, band_hash) plus the doc's
    shingle array for the exact-verify step. At scale this is written
    partitioned/bucketed by (band_idx, band_hash) so a probe touches
    one bucket; the band explode is the same plan as the batch
    neardup_pairs index side (llmdata/dedup._banded_sigs, cap column
    included so probes skip degenerate buckets too)."""
    from ..llmdata.dedup import DEFAULT_BAND_ROWS, DEFAULT_K, _banded_sigs, shingles

    banded = _banded_sigs(docs, DEFAULT_K, DEFAULT_BAND_ROWS)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("shingles"))
    (
        banded.join(sh, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def neardup_probe_stream(
    docs: DataFrame,
    index: DataFrame,
    threshold: float = 0.2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Streaming near-dup detection: each arriving document probes the
    static band index (stream-STATIC join -- natively supported, no
    stream state) and verifies candidates with exact shingle Jaccard.

    Output: (doc_id, index_doc_id, jaccard) per verified hit. A doc
    colliding with an indexed doc in ANY band is a candidate;
    candidate pairs dedup BEFORE the Jaccard verify via streaming
    ``dropDuplicates`` -- cross-batch state, one entry per distinct
    candidate pair, which also makes each emitted pair exactly-once
    across the stream's lifetime. State grows with the candidate-pair
    count (band-collision-rate bounded); at scale put an ingest-time
    watermark on the stream and use ``dropDuplicatesWithinWatermark``
    to TTL it. Degenerate index buckets above the cap are skipped,
    mirroring the batch guard."""
    from ..llmdata.dedup import DEFAULT_BAND_ROWS, DEFAULT_K, minhash_signature, shingles

    n_bands = DEFAULT_K // DEFAULT_BAND_ROWS
    sigs = minhash_signature(docs, DEFAULT_K)
    band_struct = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * DEFAULT_BAND_ROWS + r}")
                            for r in range(DEFAULT_BAND_ROWS)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    probe = sigs.select(
        "doc_id", F.explode(band_struct).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")
    idx = index.filter(F.col("_bucket_n") <= max_bucket_size).select(
        F.col("doc_id").alias("index_doc_id"),
        "band_idx",
        "band_hash",
        F.col("shingles").alias("index_shingles"),
    )
    cands = (
        probe.join(idx, ["band_idx", "band_hash"])
        .filter(F.col("doc_id") != F.col("index_doc_id"))
        .select("doc_id", "index_doc_id", "index_shingles")
        .dropDuplicates(["doc_id", "index_doc_id"])
    )
    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    pair = cands.join(sh, "doc_id")
    inter = F.size(F.array_intersect("sh", "index_shingles")).cast("double")
    union = (F.size("sh") + F.size("index_shingles")).cast("double") - inter
    jac = F.round(inter / union, 6)
    return pair.select("doc_id", "index_doc_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def write_eval_passage_index(
    docs: DataFrame, path: str, eval_source: str = "src0"
) -> str:
    """Persist the benchmark's distinct passage-hash set -- the OFFLINE
    artifact the streaming contamination probe joins against (eval
    suites change rarely; rebuild on benchmark refresh, like the
    near-dup band index)."""
    from ..llmdata.text import RK_WINDOW, _token_codes, _window_hashes

    wh = _window_hashes(_token_codes(F.col("text")), RK_WINDOW)
    (
        docs.filter(F.col("source") == eval_source)
        .select(F.explode(wh).alias("passage_hash"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def contamination_probe_stream(docs: DataFrame, eval_index: DataFrame) -> DataFrame:
    """Streaming contamination gate: every arriving document is scored
    against the eval passage-hash set before it can enter the
    training corpus.

    Deliberately STATELESS: an explode + stream-side groupBy would
    park every doc_id in the state store forever, so the eval set
    (small -- benchmarks are tiny next to the corpus) is collected
    once at plan-build time and shipped to an Arrow-batched
    membership kernel; the whole probe is a map stage in append mode
    with no shuffle and no state. At real scale the set rides a
    broadcast variable or degrades gracefully to a Bloom filter
    (false positives quarantine a few extra docs for exact recheck).

    Per-doc output matches the batch `contamination_check` columns,
    so downstream routing (quarantine vs ingest) is the same
    expression in both modes."""
    from pyspark.sql.functions import pandas_udf

    from ..llmdata.text import RK_WINDOW, _token_codes, _window_hashes

    eval_hashes = frozenset(r["passage_hash"] for r in eval_index.collect())

    @pandas_udf("long")
    def n_hits(whs: pd.Series) -> pd.Series:
        s = eval_hashes
        return whs.map(
            lambda arr: 0 if arr is None else sum(1 for h in arr if h in s)
        ).astype("int64")

    wh = _window_hashes(_token_codes(F.col("text")), RK_WINDOW)
    base = docs.select(
        "doc_id",
        F.size(wh).cast("long").alias("n_windows"),
        wh.alias("_wh"),
    )
    scored = base.select(
        "doc_id", "n_windows", n_hits("_wh").alias("n_contaminated")
    )
    return scored.select(
        "doc_id",
        "n_windows",
        "n_contaminated",
        F.round(
            F.when(
                F.col("n_windows") > 0,
                F.col("n_contaminated").cast("double")
                / F.col("n_windows").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contamination_rate"),
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )
