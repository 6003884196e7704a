"""Relational coverage queries over the TPC-H-ish fixture tables.

The reference has NO joins, grouping sets, or window functions
(SURVEY.md section 2.6 'not present'); a complete engine needs them, so
these queries exercise join strategy (broadcast dims vs shuffled
facts), multi-agg groupBy, ranking, and sessionization -- each with an
exact DuckDB oracle.

Numeric discipline: all money sums run over DECIMAL casts (exact,
order-independent) and convert to double only at the end -- a double
SUM would be reassociation-nondeterministic across engines.
Timestamp gaps use truncated epoch seconds (Spark unix_timestamp
truncates; the oracle floors epoch()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table as _load


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


def _dec(col_name: str, typ: str = "decimal(12,2)"):
    return F.col(col_name).cast(typ)


# 1 - l_discount / 1 + l_tax as exact decimals
def _one_minus(col_name: str):
    return F.lit(1).cast("decimal(3,2)") - F.col(col_name).cast("decimal(4,2)")


def _one_plus(col_name: str):
    return F.lit(1).cast("decimal(3,2)") + F.col(col_name).cast("decimal(4,2)")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan-heavy multi-agg groupBy (2 keys, 9 aggs).

    Plan shape: parquet scan with pushed date filter + projected
    columns -> partial hash agg -> single exchange on 6-ish groups ->
    final agg. No sort, no join.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(_dec("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            (
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style star join: fact lineitem -> orders -> customer with
    broadcast nation/region dims.

    Join strategy at scale: nation/region are O(100) rows -> broadcast
    (no shuffle); lineitem-orders is the only real exchange, on the
    join key both sides; AQE handles skew.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT
    n_name,
    r_name,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by exact decimal revenue (ties broken by key).

    TakeOrderedAndProject after the agg -- per-partition heaps, no
    global sort of the customer set.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(revenue).alias("_rev_dec"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .orderBy(F.col("_rev_dec").desc(), F.col("c_custkey"))
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev_dec").cast("double").alias("revenue"),
            "n_orders",
        )
    )


TOP_CUSTOMERS_SQL = """
WITH per_cust AS (
    SELECT
        o_custkey,
        SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS _rev_dec,
        COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(_rev_dec AS DOUBLE) AS revenue, n_orders
FROM per_cust JOIN customer ON o_custkey = c_custkey
ORDER BY _rev_dec DESC, c_custkey
LIMIT 10
"""


def user_sessions(spark: SparkSession, sf_dir: str, gap_seconds: int = 1800) -> DataFrame:
    """Sessionization over events: lag + gap-flag cumsum per user.

    One shuffle on user_id (window partition); the groupBy reuses the
    same partitioning so Catalyst plans a single exchange.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    flagged = ev.withColumn(
        "_new_sess",
        F.when(
            F.lag(sec).over(w).isNull() | ((sec - F.lag(sec).over(w)) > gap_seconds), 1
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_new_sess").cast("long").alias("n_sessions"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


USER_SESSIONS_SQL = """
WITH flagged AS (
    SELECT
        user_id, ts,
        CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
             THEN 1 ELSE 0 END AS _new_sess
    FROM events
)
SELECT
    user_id,
    COUNT(*) AS n_events,
    CAST(SUM(_new_sess) AS BIGINT) AS n_sessions,
    MIN(ts) AS first_ts,
    MAX(ts) AS last_ts
FROM flagged
GROUP BY user_id
"""


def brand_supplier_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-style star over the remaining dimension tables: lineitem
    joined to part + supplier + nation, margin (revenue minus retail
    cost) aggregated by supplier nation x part brand.

    Join strategy at scale: part/supplier/nation are the SMALL side
    everywhere (O(100)-O(100k) rows vs the fact table) -> all three
    broadcast, so the only data movement is the post-aggregation
    exchange on the ~nations x brands group key. Decimal-cast sums
    keep the oracle hash exact (double SUM reassociates)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    cost = _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.sum(cost).cast("double").alias("retail_cost"),
            (F.sum(revenue) - F.sum(cost)).cast("double").alias("margin"),
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


BRAND_SUPPLIER_MARGIN_SQL = """
SELECT
    n_name AS supp_nation,
    p_brand AS brand,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS revenue,
    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS retail_cost,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
         - SUM(CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS margin,
    COUNT(*) AS n_lineitems,
    COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, p_brand
"""
