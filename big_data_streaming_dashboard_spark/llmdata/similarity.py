"""Embedding similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the correctness baseline, and an
LSH-bucketed variant as the scale path.

Numeric discipline (oracle parity): dot products are ORDERED left
folds over the element pairs (``F.aggregate`` over ``zip_with``) --
never an unordered SUM over exploded rows, whose float reassociation
differs run-to-run and engine-to-engine. float32 inputs are cast to
double before any arithmetic. sqrt is IEEE-exact, so norms match too.

Scale path (100 TB of vectors): brute force is a broadcast
nested-loop against a small query set -- fine when |queries| is small
(the broadcast side) and linear in the corpus. For all-pairs or large
query sets, ``lsh_bucket_topk`` buckets vectors by random-hyperplane
signs (SimHash) so candidates shrink to per-bucket groups before exact
scoring -- same shape as the MinHash/LSH text path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# embeddings-table vector width (fixture and default corpus). Array
# columns carry no length in the Spark schema, so the dim must be a
# parameter -- probing it with .first() would run a driver-side Spark
# job at plan-construction time (a collect()-class action in the hot
# path). Callers with a different corpus pass dim= explicitly.
EMBEDDING_DIM = 64

# fixed rational hyperplanes (deterministic, oracle-reproducible as SQL
# literals; 3 planes -> 8 buckets over 64-dim embeddings)
DEFAULT_PLANES: list[list[float]] = [
    [((i * 37 + j * 11) % 17 - 8) / 8.0 for j in range(EMBEDDING_DIM)]
    for i in range(3)
]


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product (deterministic across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Same left-associated sum as ``dot`` -- (((0+p0)+p1)+...) --
    but as a flat expression chain instead of a higher-order fold.
    HOFs evaluate interpreted per element; this unrolled form stays in
    whole-stage codegen (~3-4x faster in the pairwise hot loop).
    Bit-identical result: 0.0+p0 == p0, same order, same doubles."""
    out = a.getItem(0) * b.getItem(0)
    for i in range(1, dim):
        out = out + a.getItem(i) * b.getItem(i)
    return out


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is tiny by construction -> broadcast join, no
    shuffle of the corpus; ranking is a per-query-group top-k window.
    Hot-loop discipline: norms are computed ONCE per row (not per
    pair), and the pairwise dot is the unrolled codegen form -- the
    values are bit-identical to the naive per-pair fold the oracle
    runs (same order, multiplication commutes). ``dim`` is a plan-time
    parameter (no data probe; see EMBEDDING_DIM).
    """
    qs = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _dvec("embedding").alias("qvec"),
    )
    qs = qs.withColumn("qnorm", F.sqrt(dot_unrolled(F.col("qvec"), F.col("qvec"), dim)))
    corpus = embeddings.select(
        "vec_id", _dvec("embedding").alias("cvec"), "label"
    ).withColumn("cnorm", F.sqrt(dot_unrolled(F.col("cvec"), F.col("cvec"), dim)))
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            (
                dot_unrolled(F.col("qvec"), F.col("cvec"), dim)
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "rank", F.round("_cos", 6).alias("cos_sim"))
    )


def knn_label_vote(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """k-NN majority-label classification per query vector: top-k by
    cosine, then argmax of label votes (count desc, label asc)."""
    topk = brute_force_topk(embeddings, n_queries=n_queries, k=k, dim=dim)
    votes = topk.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


def kmeans_assign(
    embeddings: DataFrame, k: int = 8, iterations: int = 5
) -> DataFrame:
    """Lloyd k-means over the embedding column (iterative algorithm --
    genuinely not SQL-expressible, rows-only driver check).

    Deterministic: init centroids = the first k vectors by vec_id;
    assignment ties broken by lowest centroid index (array_position
    finds the first minimum). Per iteration: broadcast the k centroids
    as literals (k x dim doubles -- tiny), assign by squared distance,
    recompute means via posexplode + per-dimension avg. Only the k
    centroids ever reach the driver; the corpus stays distributed."""
    vecs = embeddings.select("vec_id", _dvec("embedding").alias("v")).persist()
    centroids = [
        list(r["v"])
        for r in vecs.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]

    def assign_col(cents: list[list[float]]) -> Column:
        cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
        dists = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    assigned = None
    for _ in range(iterations):
        assigned = vecs.withColumn("cluster", assign_col(centroids))
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cluster[c][p] for p in range(len(centroids[0]))]
            if c in by_cluster
            else centroids[c]
            for c in range(k)
        ]
    return assigned.select("vec_id", "cluster")


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_lists: int = 8,
    kmeans_iterations: int = 3,
) -> DataFrame:
    """IVF approximate top-k: k-means centroids define the inverted
    lists; each query probes only its own cell.

    The classic IVF trade: recall < 1 (cell-boundary neighbors missed),
    candidate set shrinks ~n_lists-fold. At 100 TB the cluster id is
    the partition/bucket key, so a probe touches one partition. The
    assignment reuses kmeans_assign (deterministic)."""
    assigned = kmeans_assign(embeddings, k=n_lists, iterations=kmeans_iterations)
    corpus = (
        embeddings.select("vec_id", "label", _dvec("embedding").alias("vec"))
        .join(assigned, "vec_id")
    )
    qs = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("cluster").alias("qcluster"),
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("cluster") == F.col("qcluster"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine(F.col("qvec"), F.col("vec")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "rank", F.round("_cos", 6).alias("cos_sim"))
    )


def simhash_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from fixed hyperplanes (deterministic)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for plane in planes
    ]
    out = F.lit(0)
    for bit in bits:
        out = out * 2 + bit
    return out


def embedding_neardup_pairs(
    embeddings: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.5,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed.

    Candidates = pairs sharing a SimHash bucket (sign pattern over
    fixed hyperplanes); verified with exact cosine >= threshold.
    The bucket bounds the quadratic blowup exactly like MinHash
    banding does for text (llmdata/dedup.py)."""
    wb = embeddings.select(
        "vec_id", _dvec("embedding").alias("vec")
    ).withColumn("bucket", simhash_bucket(F.col("vec"), planes)).persist()
    a = wb.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), "bucket"
    )
    b = wb.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    planes: list[list[float]],
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's SimHash bucket.

    Recall < 1 by design (documented approximation); at scale the
    bucket column is also the natural partition/bucketing key so the
    per-query probe touches one partition instead of the corpus.
    """
    with_bucket = embeddings.select(
        "vec_id", "label", _dvec("embedding").alias("vec")
    ).withColumn("bucket", simhash_bucket(F.col("vec"), planes))
    qs = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        with_bucket.join(
            F.broadcast(qs), F.col("bucket") == F.col("qbucket"), "inner"
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine(F.col("qvec"), F.col("vec")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "rank", F.round("_cos", 6).alias("cos_sim"))
    )
