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
