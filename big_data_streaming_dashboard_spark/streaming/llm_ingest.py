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

Near-dup exclusion is deliberately absent here: banded LSH needs a
corpus-wide self-join (an offline index); the streaming analog --
probing each arrival against a maintained band index -- is a lookup
join against the OFFLINE near-dup index refreshed by the batch job,
not a per-stream recomputation.
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
