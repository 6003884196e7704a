"""Relational coverage, part 5 (round 12): seven more classic
decision-support plan classes, each a DIFFERENT optimizer shape from
everything in parts 1-4 --

* ``order_priority_exists`` (Q4 shape): EXISTS-correlated semi-join
  with a NON-EQUI residual (late-shipment condition evaluated inside
  the semi-join), counted per priority.
* ``bi_nation_volume`` (Q7 shape): symmetric nation-pair OR predicate
  over a 4-table star, grouped by (supp_nation, cust_nation, year).
* ``region_market_share`` (Q8 shape): conditional-fraction-per-group
  -- one nation's share of a region's typed-part revenue per year.
* ``late_lines_priority`` (Q12 shape): two-column CASE aggregate
  (high/low priority counts) over a date-windowed fact join.
* ``large_volume_orders`` (Q18 shape): group-HAVING on the fact key,
  joined back to order + customer detail, composite top-k.
* ``disjunctive_brand_revenue`` (Q19 shape): OR-of-ANDs predicate
  spanning BOTH join sides, with hand-derived per-side envelopes
  pushed to each scan (Catalyst does not factor a cross-table
  disjunction into per-side implications).
* ``sole_late_supplier`` (Q21 shape): double correlated EXISTS / NOT
  EXISTS, decorrelated to per-order conditional distinct counts.

The fixture has no l_commitdate/l_receiptdate/l_shipmode columns
(TESTDATA.md), so Q4/Q12/Q21's lateness predicate is re-based on
``l_shipdate > o_orderdate + 90 days`` -- same plan class, same
correlation structure, different column names. Reference parity:
the reference dashboard has no decision-support layer (its
flink_process is ingest/validate/route only,
flink_process/flink_process.py); these extend the warehouse surface
the way parts 3 and 4 did.

Determinism discipline (README): every reassociable money SUM goes
through DECIMAL(12,2); ratios divide two exact decimals as doubles
only at the final, displayed step (promo_revenue_share pattern);
year() is cast to INTEGER on the DuckDB side to match Spark's int.
Non-vacuity at sf0.01 (counted, per the vacuous-oracle audit
discipline): Q4 202-223 orders per priority; Q7 14 (pair, year) rows
with counts 8-17; Q8 7 years with shares 7-14/179-330; Q12 three
returnflags with distinct high/low counts; Q18 46 qualifying orders;
Q19 1,714 matching lines; Q21 100 supplier rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table as _load
from .relational4 import _REVENUE_SQL, _revenue

_LATE = "l_shipdate > o_orderdate + INTERVAL 90 DAYS"
_LATE_SQL = "l_shipdate > o_orderdate + INTERVAL 90 DAY"


def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: how many 1996-H1 orders had AT LEAST ONE line shipped
    more than 90 days after the order date, per order priority -- the
    EXISTS-correlated count.

    At scale: the semi-join is the whole story. Orders carries only
    (orderkey, orderdate, priority) after its pushed date filter;
    lineitem carries only (orderkey, shipdate); LEFT SEMI returns
    each qualifying order ONCE regardless of how many late lines it
    has (no fact-side explosion, no distinct pass), and the non-equi
    lateness residual evaluates inside the join. One exchange per
    side on orderkey, then a 5-row aggregate. A formulation that
    joined and de-duplicated would shuffle the multiplied fact;
    the semi-join never materializes it.
    """
    orders = _load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualifying = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & F.expr(_LATE),
        "left_semi",
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.col("o_orderpriority").alias("priority"), "n_orders")
    )


ORDER_PRIORITY_EXISTS_SQL = f"""
SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o.o_orderkey AND {_LATE_SQL}
  )
GROUP BY o_orderpriority
"""


def bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between NATION_1 and NATION_2 in both
    directions, per shipment year -- the symmetric nation-pair OR
    predicate over the customer/supplier star.

    At scale: the nation filter is applied to the 25-row nation dim
    FIRST, and customer/supplier are each semi-reduced to the two
    nations BEFORE touching the fact (at 100 TB the dims are the only
    place the pair predicate is cheap -- pushing it post-join would
    shuffle the whole fact). The reduced dims broadcast; lineitem
    and orders shuffle once on orderkey; the residual
    (supp != cust nation) OR-pair filter runs on two small ints.
    Group domain is (2 directed pairs) x years -- one narrow exchange.
    """
    nat = _load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    cust = (
        _load(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        _load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # no broadcast HINTS on the reduced cust/supp sides: at sf0.01
    # they are tiny, but at 100 TB "customers of two nations" is
    # ~8% of a fact-proportional table -- let stats/AQE pick the
    # strategy (the 25-row nation dim above is the only side whose
    # size is known a priori)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_revenue()).cast("double").alias("volume"),
        )
    )


BI_NATION_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       COUNT(*) AS n_lines,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_1 suppliers' share of PROMO-part revenue sold
    to EUROPE customers, per order year -- the
    conditional-fraction-per-group class (a CASE-sum divided by the
    group total, never a second scan).

    At scale: region/nation resolve to a 5-key customer-nation set
    and part pre-filters to its type BEFORE the fact joins, so the
    fact is reduced by both selective dims as early as possible
    (typed parts ~1/5, one region ~1/5); the supplier-nation name
    joins as a broadcast. ONE aggregate computes numerator and
    denominator together per year; share divides the two exact
    DECIMAL sums as doubles at the final step (promo_revenue_share
    discipline).
    """
    nat = _load(spark, sf_dir, "nation")
    reg = _load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey")
    cust = (
        _load(spark, sf_dir, "customer")
        .join(F.broadcast(eu_nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    part = _load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = (
        _load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    rev = _revenue()
    zero = F.lit(0).cast("decimal(12,2)")
    # only nation/region (fixed 25/5 rows) carry broadcast hints;
    # typed parts, EUROPE customers and nation-joined suppliers are
    # fact-proportional at 100 TB -- stats/AQE pick their strategy
    agg = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero)
            ).alias("_n1"),
            F.sum(rev).alias("_total"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return agg.select(
        "order_year",
        F.col("_n1").cast("double").alias("nation1_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.round(
            F.col("_n1").cast("double") / F.col("_total").cast("double"), 6
        ).alias("market_share"),
        "n_lines",
    )


REGION_MARKET_SHARE_SQL = f"""
WITH agg AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           SUM(CASE WHEN sn.n_name = 'NATION_1' THEN {_REVENUE_SQL}
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS _n1,
           SUM({_REVENUE_SQL}) AS _total,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    GROUP BY year(o_orderdate)
)
SELECT order_year,
       CAST(_n1 AS DOUBLE) AS nation1_revenue,
       CAST(_total AS DOUBLE) AS total_revenue,
       round(CAST(_n1 AS DOUBLE) / CAST(_total AS DOUBLE), 6)
           AS market_share,
       n_lines
FROM agg
"""


def late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: among 1996-97 lines shipped >90 days after their
    order, how many belonged to high- vs low-priority orders, per
    return flag -- the two-column CASE aggregate.

    At scale: both date bounds push to the lineitem scan; orders
    carries only (orderkey, priority); one orderkey shuffle; the
    high/low CASE pair folds in ONE aggregate pass over a 3-row
    group domain (a filter-twice formulation would scan the join
    twice). The lateness residual is a post-join filter because it
    spans both sides.
    """
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.expr(_LATE))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
    )


LATE_LINES_PRIORITY_SQL = f"""
SELECT l_returnflag AS return_flag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND {_LATE_SQL}
GROUP BY l_returnflag
"""


def large_volume_orders(
    spark: SparkSession, sf_dir: str, min_qty: int = 300, k: int = 100
) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds ``min_qty``,
    with customer detail, largest first -- group-HAVING on the fact
    key joined back to detail.

    At scale: the per-orderkey quantity aggregate runs FIRST (one
    fact exchange, map-side combined), the HAVING filter shrinks it
    to the handful of qualifying keys, and only that tiny set joins
    back to orders and customer -- at 100 TB the join-back input is
    thousands of rows, so both joins broadcast the QUALIFYING side
    automatically (AQE sees the post-filter size). Top-k is
    TakeOrderedAndProject on (totalprice DESC, orderkey) --
    orderkey tie-break keeps the cut deterministic.

    Quantity sums are exact: fixture quantities are integers stored
    as doubles (1.0-50.0), summed after an explicit DECIMAL(12,1)
    cast so reassociation cannot produce engine-specific ULPs.
    """
    li = _load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,1)")).alias("_qty"))
        .filter(F.col("_qty") > min_qty)
    )
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


LARGE_VOLUME_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(_qty AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,1))) AS _qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,1))) > 300
) JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue from three (brand, size-range,
    quantity-range) bands -- the OR-of-ANDs predicate spanning BOTH
    join sides.

    At scale: Catalyst does not factor a cross-table disjunction
    into per-side implications, so the implied envelopes are derived
    BY HAND and pushed explicitly -- part pre-filters to the brand
    set (scan-pushed IN), lineitem to the quantity envelope
    [1, 50] (scan-pushed range); the exact three-band OR runs as the
    join residual on already-reduced inputs. The filtered part side
    broadcasts. One aggregate row out.
    """
    part = _load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50)
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    # the brand-filtered part side is 3/25 of a fact-proportional
    # table at 100 TB -- no broadcast hint; stats/AQE decide
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(band)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_revenue()).cast("double").alias("revenue"),
        )
    )


DISJUNCTIVE_BRAND_REVENUE_SQL = f"""
SELECT COUNT(*) AS n_lines, CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 25 AND 50)
"""


def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on
    multi-supplier orders -- the double correlated EXISTS / NOT
    EXISTS, decorrelated.

    At scale: the textbook formulation self-joins lineitem twice
    (EXISTS another supplier; NOT EXISTS another LATE supplier).
    Decorrelated here to ONE aggregate per order --
    ``n_supp = countDistinct(suppkey)`` and
    ``n_late_supp = countDistinct(suppkey) FILTER (late)`` -- a
    supplier qualifies on an order iff it shipped late, n_supp > 1,
    and n_late_supp = 1 (it IS that one). Provably the same set:
    "another supplier exists" == n_supp > 1; "no OTHER late
    supplier" given this one is late == n_late_supp == 1.

    r18 (guide 2.4, remove shuffles outright): the qualifying
    supplier itself is recovered IN the same aggregate instead of a
    distinct-late-lines branch joined back on orderkey. The late
    distinct count is replaced by MIN/MAX of the late suppkey --
    ``n_late_supp == 1`` iff the late-suppkey set is non-empty with
    min == max, and that value IS the sole supplier (every late row
    of such an order carries the same suppkey, so the emitted
    (order, supplier) pairs are identical to the join-back's
    row-for-row). min/max are non-distinct aggregates, so they ride
    the multi-distinct Expand's existing non-distinct projection:
    the Expand stays at 2 projections (a first cut that KEPT the
    second countDistinct alongside max() planned a 3-projection
    Expand and measured a LARGER footprint than baseline, 367.3 vs
    320.4 MB at 10x -- the A/B that motivated this form). That
    deletes the second lineitem+orders scan, the (orderkey,
    suppkey) distinct with its two exchanges, and the orderkey
    sort-merge join: the fact crosses ONE orderkey exchange and the
    only join left is the broadcast supplier dim. Interleaved A/B at
    10x: shuffle footprint 320.4 -> 167.9 MB (draw-stable both
    sides), cold 11.8 -> 9.1 s, warm 4.8 -> 2.6 s (see
    plans/r18/sole_late_supplier_{before,after}.txt); the oracle
    SQL keeps the literal double-EXISTS form, so the hash match is
    itself the proof of both rewrites.
    """
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = (
        _load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("_late", F.expr(_LATE))
    )
    late_supp = F.when(F.col("_late"), F.col("l_suppkey"))
    sole_late = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_n_supp"),
            F.min(late_supp).alias("_min_late"),
            F.max(late_supp).alias("l_suppkey"),
        )
        .filter(
            (F.col("_n_supp") > 1)
            & F.col("l_suppkey").isNotNull()
            & (F.col("l_suppkey") == F.col("_min_late"))
        )
    )
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_waiting_orders"))
    )


SOLE_LATE_SUPPLIER_SQL = f"""
SELECT s_suppkey, s_name, COUNT(*) AS n_waiting_orders
FROM (
    SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
    FROM lineitem l1 JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
    WHERE l1.l_shipdate > o1.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
) JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who DOMINATED at least one 1996 PROMO
    part -- shipped more than twice that part's per-supplier average
    -- with the count of parts they dominated. The two-level
    correlated-threshold class: the threshold group (part) differs
    from both the aggregate grain (part, supplier) and the output
    group (supplier), so no single aggregation pass can express it.

    At scale: the fact shuffles ONCE onto (partkey, suppkey) for the
    base aggregate (date + part-type filters pushed/applied first);
    the per-part threshold re-aggregates the ALREADY part-supplier-
    sized frame (never the fact); the join-back is on partkey between
    two aggregate-sized frames (AQE sizes it); the final regroup onto
    suppliers is aggregate-sized too. The domination predicate is
    evaluated with cleared denominators in exact DECIMAL --
    ``qty * n_supp > 2 * total`` -- so no division exists near the
    threshold, and a sole supplier can NEVER dominate by construction
    (qty > 2*qty is false), which replaces an explicit
    multi-supplier filter. The supplier-name join is unhinted
    (fact-proportional at 100 TB; stats/AQE decide).

    Non-vacuity at sf0.01 (counted): 40 of 100 suppliers dominate at
    least one part; dominated-part counts vary per supplier.
    """
    part = _load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    ps = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,1)")).alias("_qty"))
    )
    avgq = ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum("_qty").alias("_tot"),
    )
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dominated = (
        ps.join(avgq, ps.l_partkey == F.col("_pk"))
        .filter(
            F.col("_qty") * F.col("_n_supp").cast("decimal(12,0)")
            > F.lit(2).cast("decimal(1,0)") * F.col("_tot")
        )
    )
    return (
        dominated.join(supp, dominated.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


DOMINANT_SUPPLIERS_SQL = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(l_quantity AS DECIMAL(12,1))) AS _qty
    FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey, l_suppkey
),
avgq AS (
    SELECT l_partkey AS _pk, COUNT(*) AS _n_supp, SUM(_qty) AS _tot
    FROM ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name, COUNT(*) AS n_dominated_parts
FROM ps
JOIN avgq ON l_partkey = _pk
JOIN supplier ON l_suppkey = s_suppkey
WHERE _qty * CAST(_n_supp AS DECIMAL(12,0))
      > CAST(2 AS DECIMAL(1,0)) * _tot
GROUP BY s_suppkey, s_name
"""
