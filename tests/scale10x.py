"""10x scale fixture builder (round-4 scale-stress harness).

Derives a ~10x variant of the sf0.1 driver fixtures by replicating
each table REPS times with perturbed keys, plus a deliberately skewed
(template-heavy) documents variant. Written once to a cache directory
laid out like an sf dir ({table}.parquet), so `tables.load_table` and
every registry query run on it unchanged. The cache lives inside the
repo tree (gitignored) and is rebuilt only when missing.

Perturbation choices keep each table's semantics:
- events: event_id/user_id get a rep suffix (event_id*10+rep), ts is
  unchanged -- per-second density grows 10x, so W4 temporal batches
  genuinely get hotter, and the modulus-based dirt lattice still hits
  every rejection class.
- documents: doc_id*10+rep; each replica appends a tiny rep marker to
  the text, so replicas are NEAR-duplicates (high-Jaccard pairs, the
  realistic crawl shape) rather than exact copies.
- documents_skew: 30% of docs share ONE boilerplate text -- the
  degenerate band-bucket corpus the LSH cap must survive.
- embeddings: vec_id*10+rep with a tiny deterministic per-rep jitter
  (cluster structure preserved).
- lineitem: l_orderkey*10+rep (pricing_summary is lineitem-only; the
  other star tables are not scaled).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPS = 10
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE10X_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixture"),
)
_SRC_SF = "/root/testdata/sf0.1"
_MARKER = "_ALL_TABLES_OK_v2"  # bump to force a rebuild on fixture changes

BOILERPLATE = (
    "terms of service privacy policy cookie settings all rights reserved "
    "subscribe to our newsletter follow us on social media "
) * 4


def _rep(df, id_cols: list[str]):
    """Cross with a REPS-row dim; id columns become id*REPS+rep."""
    out = df.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) * REPS + F.col("_rep"))
    return out


def ensure_scale_fixture(spark: SparkSession) -> str:
    if os.path.exists(os.path.join(SCALE_DIR, _MARKER)):
        _ensure_extra_dims(spark)
        return SCALE_DIR
    os.makedirs(SCALE_DIR, exist_ok=True)
    from big_data_streaming_dashboard_spark.tables import load_table

    ev = load_table(spark, _SRC_SF, "events")
    (
        _rep(ev, ["event_id", "user_id"])
        .drop("_rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "events.parquet"))
    )

    docs = load_table(spark, _SRC_SF, "documents")
    (
        _rep(docs, ["doc_id"])
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" rep"), F.col("_rep").cast("string")),
        )
        .drop("_rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "documents.parquet"))
    )

    # skewed corpus: 30% boilerplate (ONE shared text -> one degenerate
    # band bucket), 70% organic -- 4x the base corpus. The boilerplate
    # choice keys on the ORIGINAL doc_id (before replication) so the
    # fraction holds exactly.
    skew_base = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.lit(BOILERPLATE)).otherwise(
            F.col("text")
        ),
    )
    (
        _rep(skew_base, ["doc_id"])
        .filter(F.col("_rep") < 4)
        .drop("_rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "documents_skew.parquet"))
    )

    embs = load_table(spark, _SRC_SF, "embeddings")
    jitter = F.transform(
        "embedding",
        lambda x: x + (F.col("_rep").cast("float") - 4.5) * F.lit(0.001),
    ).cast("array<float>")
    (
        _rep(embs, ["vec_id"])
        .withColumn("embedding", jitter)
        .drop("_rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "embeddings.parquet"))
    )

    # lineitem AND orders replicate with the SAME orderkey mapping
    # (k -> k*REPS+rep), so the star join stays coherent at 10x: every
    # replicated lineitem row matches exactly one replicated order row,
    # o_custkey untouched -> 10x orders per customer.
    li = load_table(spark, _SRC_SF, "lineitem")
    (
        _rep(li, ["l_orderkey"])
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "lineitem.parquet"))
    )
    orders = load_table(spark, _SRC_SF, "orders")
    (
        _rep(orders, ["o_orderkey"])
        .drop("_rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "orders.parquet"))
    )
    # unscaled dims the star queries read alongside the scaled facts
    for dim in ("customer", "nation", "region"):
        load_table(spark, _SRC_SF, dim).write.mode("overwrite").parquet(
            os.path.join(SCALE_DIR, f"{dim}.parquet")
        )

    with open(os.path.join(SCALE_DIR, _MARKER), "w") as f:
        f.write("ok\n")
    _ensure_extra_dims(spark)
    return SCALE_DIR


def _ensure_extra_dims(spark: SparkSession) -> None:
    """Dims added after the fixture first shipped (r5: part/supplier
    for the Q14/Q16-shape queries) -- written additively so an
    existing cached fixture upgrades without a full rebuild."""
    from big_data_streaming_dashboard_spark.tables import load_table

    for dim in ("part", "supplier"):
        path = os.path.join(SCALE_DIR, f"{dim}.parquet")
        if not os.path.exists(path):
            load_table(spark, _SRC_SF, dim).write.mode("overwrite").parquet(path)


# --- Zipf-vocabulary corpus for the BM25 serving canary (r15) ---------------
#
# r14 measured the BM25 probe at 10x over the driver fixture's
# documents, whose synthetic ~31-word vocabulary makes EVERY query
# term stopword-grade (df ~= N): 500 3-term queries scored ~67M
# (query, posting) rows, so the wall measured the degenerate fixture,
# not the plan, and could never catch a bucket-pruning regression
# (r14 verdict item 3). This corpus has a few-thousand-term Zipf-ish
# vocabulary -- the rank-frequency shape real text has -- so rare-term
# queries genuinely prune through the same bucket-partitioned plan:
# short posting lists AND few term buckets touched.

ZIPF_DOCS = 50_000
ZIPF_VOCAB = 4_000
ZIPF_DOC_LEN = 30
_ZIPF_SEED = 20260815


def ensure_zipf_corpus(spark: SparkSession) -> str:
    """Build (once, cached beside the 10x fixture) a 50k-doc corpus
    whose terms are drawn Zipf(s~=1) from a 4k-term vocabulary via the
    inverse-CDF approximation rank = V**u (P(rank<=r) ~= ln r / ln V).
    All JVM-side and deterministic: u comes from xxhash64(doc_id, pos,
    seed), so the corpus is bit-identical across rebuilds."""
    path = os.path.join(SCALE_DIR, "documents_zipf.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(SCALE_DIR, exist_ok=True)
    u = lambda p: (  # noqa: E731 -- uniform in (0,1), hash-derived
        F.pmod(F.xxhash64(F.col("doc_id"), p, F.lit(_ZIPF_SEED)), F.lit(1_000_000))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    rank = lambda p: F.least(  # noqa: E731
        F.lit(ZIPF_VOCAB),
        F.greatest(
            F.lit(1), F.floor(F.pow(F.lit(float(ZIPF_VOCAB)), u(p))).cast("int")
        ),
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(ZIPF_DOC_LEN - 1)),
            lambda p: F.concat(F.lit("t"), rank(p).cast("string")),
        ),
    )
    (
        spark.range(ZIPF_DOCS)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", text.alias("text"), F.lit("en").alias("lang"))
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
