"""k-means sanity: assignment validity, determinism, inertia decrease."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_dashboard_spark.llmdata.similarity import kmeans_assign
from big_data_streaming_dashboard_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_assignment(spark):
    embs = load_table(spark, SF, "embeddings")
    got = kmeans_assign(embs, k=8, iterations=3).collect()
    assert len(got) == embs.count()
    clusters = {r["cluster"] for r in got}
    assert clusters <= set(range(8)) and len(clusters) > 1
    # deterministic across runs
    again = kmeans_assign(embs, k=8, iterations=3).collect()
    assert sorted((r["vec_id"], r["cluster"]) for r in got) == sorted(
        (r["vec_id"], r["cluster"]) for r in again
    )


def test_ivf_topk_recall(spark):
    """IVF returns valid ranked neighbors from the query's cell with
    reasonable recall vs brute force (approximate by design)."""
    from big_data_streaming_dashboard_spark.llmdata.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    embs = load_table(spark, SF, "embeddings")
    exact = brute_force_topk(embs, n_queries=5, k=10).collect()
    approx = ivf_topk(embs, n_queries=5, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(approx_sets) == set(exact_sets)  # every query answered
    recalls = [
        len(exact_sets[q] & approx_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # weakly-clustered fixture embeddings -> modest recall; assert the
    # probe is doing real work, not returning garbage
    assert mean_recall >= 0.2, recalls
    # within-cell ranking must agree with brute force where they overlap
    exact_rank = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_rank:
            assert abs(r["cos_sim"] - exact_rank[key]) < 1e-9


def test_kmeans_labels_correlate(spark):
    """Embeddings carry generator labels; k-means clusters should be
    label-coherent well above chance (clustered data by construction)."""
    embs = load_table(spark, SF, "embeddings")
    assigned = kmeans_assign(embs, k=8, iterations=5)
    joined = assigned.join(embs.select("vec_id", "label"), "vec_id")
    # majority label share per cluster
    per = (
        joined.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster")
        .agg((F.max("n") / F.sum("n")).alias("purity"), F.sum("n").alias("size"))
        .collect()
    )
    total = sum(r["size"] for r in per)
    weighted_purity = sum(r["purity"] * r["size"] for r in per) / total
    # 10 labels -> random-assignment majority share ~= 0.13; the fixture
    # embeddings carry only weak label structure (measured ~0.17), so
    # assert above-chance, not strong separation
    assert weighted_purity > 0.14, weighted_purity


def test_kmeans_seeds_on_sparse_id_spaces(spark):
    """Seeding takes the first k rows BY vec_id via limit(), not a
    `vec_id < k` filter: a corpus whose id space has holes (here every
    5th id held out, k larger than the surviving ids under k) must
    still seed k centroids and assign every row -- the under-filled
    filter form made the Lloyd means fallback index past the seed
    list (IndexError, found by the IVF-PQ 10x run). Dense 0-based
    corpora seed identically either way (the oracle-parity premise)."""
    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    sparse = embs.filter(F.col("vec_id") % 5 != 0)
    assigned = kmeans_assign(sparse, k=64, iterations=2)
    assert assigned.count() == sparse.count()
    assert assigned.filter(
        (F.col("cluster") < 0) | (F.col("cluster") >= 64)
    ).count() == 0
