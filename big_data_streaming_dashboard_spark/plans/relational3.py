"""Relational + training-data coverage, part 3 (round 5): promo
revenue share (Q14 shape), returned-items top customers (Q10 shape),
brand supplier variety (Q16 shape: multi-DISTINCT aggregate ->
Expand), per-source document caps (crawl domain-cap policy), and
exact per-label embedding centroids (the IVF/k-means building block).

Determinism discipline as everywhere in this engine: every
reassociable double SUM goes through an exact DECIMAL cast first, so
Spark's partial-aggregation order and DuckDB's streaming order cannot
produce different bits.

Scale notes per query live in the docstrings; the shared rule: facts
shuffle once on their join/group key, dims broadcast only when
O(100)-row, DISTINCT aggregates stay in the two-phase Expand plan
Spark generates (partial distinct per partition first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table as _load


def _dec(col_name: str, typ: str = "decimal(12,2)"):
    return F.col(col_name).cast(typ)


def _revenue():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", "decimal(4,2)")
    )


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: share of 1996 revenue coming from PROMO-type parts.

    At scale: part is projected to (p_partkey, is_promo) BEFORE the
    join -- two narrow columns cross the exchange, never p_name/type
    strings; the date filter pushes to the lineitem scan; one
    conditional aggregate, no second pass. The output is a single row
    (promo + total + share), so everything after the join is
    map-side partials + one 1-row exchange."""
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    rev = _revenue()
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0).cast("decimal(12,2)")))
            .alias("_promo"),
            F.sum(rev).alias("_total"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.round(
            F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double"),
            6,
        ).alias("promo_share_pct"),
        "n_lineitems",
    )


PROMO_REVENUE_SHARE_SQL = f"""
WITH agg AS (
    SELECT
        SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REVENUE_SQL}
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS _promo,
        SUM({_REVENUE_SQL}) AS _total,
        COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT CAST(_promo AS DOUBLE) AS promo_revenue,
       CAST(_total AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(_promo AS DOUBLE) / CAST(_total AS DOUBLE), 6)
           AS promo_share_pct,
       n_lineitems
FROM agg
"""


def returned_top_customers(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Q10 shape: customers ranked by revenue LOST to returned items
    (l_returnflag = 'R'), top k with deterministic key tie-break.

    At scale: returnflag filter pushes to the lineitem scan (cuts the
    fact ~2/3 before any exchange); lineitem-orders shuffles on the
    orderkey; customer joins on custkey AFTER the per-custkey
    aggregate (the agg output is customer-cardinality, far smaller
    than the fact); top-k is TakeOrderedAndProject -- per-partition
    heaps, never a global sort."""
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(_revenue()).alias("_lost"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "c_mktsegment",
            F.col("_lost").cast("double").alias("lost_revenue"),
            "n_returned_items",
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("custkey"))
        .limit(k)
    )


RETURNED_TOP_CUSTOMERS_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           SUM({_REVENUE_SQL}) AS _lost,
           COUNT(*) AS n_returned_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY o_custkey
)
SELECT c_custkey AS custkey, c_name, c_mktsegment,
       CAST(_lost AS DOUBLE) AS lost_revenue,
       n_returned_items
FROM per_cust JOIN customer ON o_custkey = c_custkey
ORDER BY lost_revenue DESC, custkey
LIMIT 10
"""


def brand_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: per brand, how many DISTINCT suppliers and parts
    ever shipped it -- the multi-count-distinct aggregate.

    At scale: Spark plans two DISTINCT aggregates in one groupBy via
    Expand (each input row duplicated per distinct column, partial
    de-dup per partition BEFORE the exchange), so the shuffle carries
    already-deduped (brand, suppkey)/(brand, partkey) pairs -- the
    shape that survives a fact table 1000x bigger. part is projected
    to the 2 needed columns before the join."""
    li = _load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


BRAND_SUPPLIER_VARIETY_SQL = """
SELECT p_brand,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def domain_cap(docs: DataFrame, cap: int = 10) -> DataFrame:
    """Per-source document cap -- the crawl-pipeline domain-cap policy
    (keep at most ``cap`` docs per domain/source so no single site
    dominates the training mix; the C4/CommonCrawl per-domain quota).

    Deterministic keep rule: lowest doc_id first (crawl order proxy).
    One shuffle on source; the rank is a window row_number -- at 100 TB
    the partition-by key is the domain, whose per-key row count is
    exactly what the cap bounds, so no partition outgrows the cap's
    working set by more than the pre-cap skew (a pathologically hot
    domain is the input problem the cap exists to solve; AQE skew
    handling covers the sort)."""
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select("doc_id", "source", "n_chars").withColumn(
        "rank_in_source", F.row_number().over(w)
    ).withColumn("kept", F.col("rank_in_source") <= cap)


DOMAIN_CAP_SQL = """
SELECT doc_id, source, n_chars,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank_in_source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10 AS kept
FROM documents
"""


def label_centroids(embs: DataFrame, dim: int = 64) -> DataFrame:
    """Exact per-label embedding centroids, one row per (label,
    dimension position) -- the building block IVF coarse quantizers
    and k-means seeding consume.

    Exactness: each component is cast (float32 -> double, exact) then
    quantized to DECIMAL(20,10) BEFORE summation -- decimal addition
    is associative, so aggregation order cannot change the result in
    either engine. Both engines must round the same double to the
    same 10-digit decimal: a disagreement needs a tie exactly at the
    11th fractional digit, which for a float32-origin value requires
    <= 11 binary fraction bits -- nonexistent in real embedding data
    (and the oracle pairing would catch it loudly).

    At scale: posexplode ships (label, pos, val) -- 3 narrow columns;
    one exchange on (label, pos) with map-side partial sums; output
    cardinality = labels x dim, tiny."""
    exploded = embs.select(
        "label", F.posexplode("embedding").alias("pos", "_v")
    ).select(
        "label",
        "pos",
        F.col("_v").cast("double").cast("decimal(20,10)").alias("_vd"),
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(
            F.sum("_vd").alias("_sum"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            "label",
            "pos",
            F.round(F.col("_sum").cast("double") / F.col("n_vecs"), 6).alias(
                "centroid"
            ),
            "n_vecs",
        )
    )


LABEL_CENTROIDS_SQL = """
SELECT label,
       CAST(pos AS INTEGER) AS pos,
       round(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
             / COUNT(*), 6) AS centroid,
       COUNT(*) AS n_vecs
FROM (
    -- DuckDB has no WITH ORDINALITY; parallel unnests of equal-length
    -- lists align positionally
    SELECT label,
           unnest(embedding) AS val,
           unnest(range(len(embedding))) AS pos
    FROM embeddings
)
GROUP BY label, pos
"""


def activity_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join coverage: reconcile per-user event activity
    against per-customer order activity (the 'which side is missing'
    audit every warehouse runs). The order side is restricted to
    custkey >= 100 so all three classes exist in the fixture: users
    0-99 have events only, 100-149 both, 150+ orders only.

    At scale: both sides pre-aggregate to key-cardinality BEFORE the
    full outer join (never fact-x-fact), the join shuffles once on
    the shared key, and the class column is a null-pattern CASE --
    no second pass."""
    ev = (
        _load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    orders = (
        _load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") >= 100)
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = ev.join(orders, "key", "full_outer")
    return joined.select(
        "key",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_events").isNull(), "orders_only")
        .when(F.col("n_orders").isNull(), "events_only")
        .otherwise("both")
        .alias("activity_class"),
    )


ACTIVITY_RECONCILE_SQL = """
WITH ev AS (
    SELECT user_id AS key, COUNT(*) AS n_events FROM events GROUP BY user_id
),
ords AS (
    SELECT o_custkey AS key, COUNT(*) AS n_orders
    FROM orders WHERE o_custkey >= 100 GROUP BY o_custkey
)
SELECT COALESCE(ev.key, ords.key) AS key,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders,
       CASE WHEN n_events IS NULL THEN 'orders_only'
            WHEN n_orders IS NULL THEN 'events_only'
            ELSE 'both' END AS activity_class
FROM ev FULL OUTER JOIN ords ON ev.key = ords.key
"""
