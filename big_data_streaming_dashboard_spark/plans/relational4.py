"""Relational coverage, part 4 (round 11): the four classic
decision-support plan classes the registry still lacked --

* ``customer_order_histogram`` (Q13 shape): outer-join-preserving
  double aggregation (customers with ZERO orders must appear).
* ``top_supplier_revenue`` (Q15 shape): scalar-MAX subquery
  decorrelated to a broadcast 1-row join.
* ``small_quantity_revenue`` (Q17 shape): correlated per-group AVG
  subquery decorrelated to an aggregate + join-back on the fact key.
* ``idle_customer_balance`` (Q22 shape): global scalar-AVG threshold
  + anti-join against the fact's distinct keys.
* ``shipping_priority`` (Q3 shape): date filters pushed to BOTH join
  sides + composite-key top-k.
* ``event_funnel``: ordered conversion funnel (view -> click ->
  purchase with strict event-time ordering per user) -- the
  sequential-constraint class no single aggregation pass can
  express (streamed exactly in streaming/funnel.py).
* ``weekly_cohort_retention``: first-seen-week cohorts x activity
  week offset -- the classic product-dashboard retention triangle
  (streamed exactly in streaming/funnel.py).
* ``value_anomalies``: trailing-day 1.5-sigma anomalies over an
  overlapping-day-shard RANGE window, the z-test evaluated entirely
  in integer/DECIMAL arithmetic.

Each is a DIFFERENT optimizer shape from everything in relational
parts 1-3 (no outer-join histogram, no self-threshold join-back, no
scalar-threshold anti-join, no sharded sliding window existed
before).  Reference parity: the
reference dashboard has no decision-support layer at all
(flink_process/flink_process.py is ingest/validate/route only) --
these extend the engine the way the part-3 queries did, so a user
can run warehouse-style audits on the same tables.

Determinism discipline (README): threshold comparisons that TPC-H
words as ``x < 0.2 * avg(x)`` / ``bal > avg(bal)`` are evaluated in
EXACT integer/decimal arithmetic by clearing denominators
(``5*qty*cnt < sum_qty``; ``bal*cnt > total``), so no
double-rounding boundary can flip a row between engines.  Every
reassociable money SUM goes through DECIMAL(12,2) first.
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


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by how many non-urgent
    orders they placed -- INCLUDING the zero-order bucket, which is
    what forces the outer join.

    At scale: orders is aggregated to (custkey, cnt) BEFORE touching
    customer, so the join input is customer-cardinality on both
    sides, not fact-cardinality (orders ~10x customers in TPC-H; the
    per-custkey partial agg combines map-side).  The priority filter
    pushes to the orders scan.  customer LEFT-joins the agg --
    zero-order customers survive as NULL -> 0.  The second aggregate
    groups on n_orders (tiny domain, one narrow exchange).  No row
    of either base table crosses an exchange twice.
    """
    orders = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    cust = _load(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("_cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
WITH per_cust AS (
    SELECT o_custkey, COUNT(*) AS _cnt
    FROM orders
    WHERE o_orderpriority <> '1-URGENT'
    GROUP BY o_custkey
)
SELECT COALESCE(_cnt, 0) AS n_orders, COUNT(*) AS n_customers
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY COALESCE(_cnt, 0)
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with MAXIMUM revenue in 1996Q1 --
    the scalar-MAX-subquery class, decorrelated.

    At scale: the date filter pushes to the lineitem scan; one
    exchange onto l_suppkey for the per-supplier aggregate; the
    global max is a 1-ROW aggregate broadcast back (crossJoin of a
    single row -- the established broadcast-scalar pattern, never a
    window over one giant partition, which would serialize the whole
    supplier set through one task).  Equality with the max is exact
    because revenue is a DECIMAL sum.  supplier is an O(100)-row dim
    -> broadcast join for the name.

    Known cost (visible in the formatted plan): the scalar-MAX branch
    re-aggregates from its own scan rather than reusing the per_supp
    exchange -- column pruning drops n_items on the max side, so the
    two subplans are not canonically equal and ReusedExchange cannot
    fire.  Both branches still read the SAME pushed 3-month scan; a
    production run probing many quarters would materialize per_supp
    (cache/temp table) and pay the fact scan once.  Kept declarative
    here because driver-contract queries are never memoized (registry
    policy) and the recomputed branch is agg-only.
    """
    li = _load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_revenue()).alias("_rev"), F.count(F.lit(1)).alias("n_items")
    )
    max_rev = per_supp.agg(F.max("_rev").alias("_max_rev"))
    supp = _load(spark, sf_dir, "supplier")
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
            "n_items",
        )
    )


TOP_SUPPLIER_REVENUE_SQL = f"""
WITH per_supp AS (
    SELECT l_suppkey, SUM({_REVENUE_SQL}) AS _rev, COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name,
       CAST(_rev AS DOUBLE) AS total_revenue, n_items
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE _rev = (SELECT MAX(_rev) FROM per_supp)
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue locked up in 'small' orders -- lineitems
    whose quantity is below 20% of their part's average quantity.
    The correlated per-group AVG subquery, decorrelated to an
    aggregate + join-back on the fact key.

    At scale: the per-part (sum, count) aggregate reduces the fact
    to part-cardinality with map-side partials; the join-back
    shuffles the fact ONCE on l_partkey, and the aggregate side
    arrives already partitioned by its groupBy key, so AQE reuses
    that exchange.  The threshold ``qty < 0.2 * avg`` is evaluated
    as ``5*qty*cnt < sum_qty`` in exact integer arithmetic
    (quantities are integral) -- no double division anywhere near
    the predicate.  Output is one row: map-side partials + a 1-row
    exchange after the join.
    """
    li = _load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("_qty"),
        _dec("l_extendedprice").alias("_price"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("_qty").alias("_sum_qty"), F.count(F.lit(1)).alias("_cnt")
    )
    joined = li.join(per_part, "l_partkey").filter(
        F.lit(5) * F.col("_qty") * F.col("_cnt") < F.col("_sum_qty")
    )
    agg = joined.agg(
        F.sum("_price").alias("_total"), F.count(F.lit(1)).alias("n_small_items")
    )
    return agg.select(
        F.col("_total").cast("double").alias("small_revenue"),
        F.round(F.col("_total").cast("double") / F.lit(7.0), 6).alias(
            "avg_yearly"
        ),
        "n_small_items",
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH li AS (
    SELECT l_partkey, CAST(l_quantity AS BIGINT) AS _qty,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS _price
    FROM lineitem
),
per_part AS (
    SELECT l_partkey, SUM(_qty) AS _sum_qty, COUNT(*) AS _cnt
    FROM li GROUP BY l_partkey
),
agg AS (
    SELECT SUM(_price) AS _total, COUNT(*) AS n_small_items
    FROM li JOIN per_part USING (l_partkey)
    WHERE 5 * _qty * _cnt < _sum_qty
)
SELECT CAST(_total AS DOUBLE) AS small_revenue,
       round(CAST(_total AS DOUBLE) / 7.0, 6) AS avg_yearly,
       n_small_items
FROM agg
"""


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per nation, count + total balance of ABOVE-AVERAGE-
    balance customers who have LAPSED (no order since 2000-01-01) --
    global scalar-AVG threshold + anti-join.

    Lapsed-since-a-cutoff rather than TPC-H's literal never-ordered:
    the fixture's every customer has at least one order, so the
    textbook predicate returns zero rows and its oracle row would be
    vacuous (the same trap class as thresholds the fixture cannot
    reach); the cutoff keeps the identical plan shape (anti-join
    against a filtered distinct key set -- 55 qualifying customers at
    sf0.01) while actually exercising the anti-join's emit branch.

    At scale: the threshold ``bal > avg(positive bal)`` is a 1-row
    aggregate broadcast back and evaluated as ``bal*cnt > total`` in
    exact DECIMAL arithmetic (no double division at the boundary).
    The anti-join runs against DISTINCT recent-order custkeys -- the
    date filter pushes to the orders scan and the distinct aggregate
    combines map-side, so the anti-join's build side is
    customer-cardinality, not fact-cardinality.  nation is a 25-row
    broadcast dim.  Final exchange: one, onto ~25 groups.
    """
    cust = _load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _dec("c_acctbal").alias("_bal")
    )
    pos = cust.filter(F.col("_bal") > 0)
    stats = pos.agg(
        F.sum("_bal").alias("_total"), F.count(F.lit(1)).alias("_cnt")
    )
    order_keys = (
        _load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    nation = _load(spark, sf_dir, "nation")
    rich_idle = (
        cust.crossJoin(F.broadcast(stats))
        .filter(F.col("_bal") * F.col("_cnt") > F.col("_total"))
        .join(order_keys, cust.c_custkey == order_keys.o_custkey, "left_anti")
    )
    return (
        rich_idle.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_bal").cast("double").alias("total_balance"),
        )
        .withColumnRenamed("n_name", "nation")
    )


FUNNEL_WINDOW_HOURS = 24


def _funnel_rungs(ev: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three per-user min-aggregate rungs of the ordered funnel
    (shared by the batch query and the streaming parity truth). Each
    stage must land strictly after the previous one AND within the
    24-hour conversion window -- the standard product-funnel
    semantics, and what makes the stage counts DISCRIMINATE on the
    fixture (an unbounded funnel converts all 150 sf0.01 users at
    every stage, so its aggregate columns proved nothing; windowed:
    150 -> 60 -> 25)."""
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_v"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter((F.col("ts") > F.col("_v")) & (F.col("ts") <= F.col("_v") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_c"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter((F.col("ts") > F.col("_c")) & (F.col("ts") <= F.col("_c") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_p"))
    )
    return views, clicks, purchases


def funnel_user_stages(ev: DataFrame) -> DataFrame:
    """Per-user funnel state in batch form: first view, first click
    strictly after it, first purchase strictly after that (nulls where
    a user never reached the stage). The batch truth the streaming
    funnel operator (streaming/funnel.py) is parity-tested against;
    timestamps stay timestamps (micros-exact) end to end."""
    views, clicks, purchases = _funnel_rungs(ev)
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            F.col("_v").alias("first_view"),
            F.col("_c").alias("first_click"),
            F.col("_p").alias("first_purchase"),
        )
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel with a 24-hour conversion window:
    per user, the first ``view``, the first ``click`` strictly AFTER
    that view and within 24 h of it, the first ``purchase`` strictly
    after that click and within 24 h of it; output is the 3-stage
    funnel table (stage order, users remaining, conversion vs
    stage 1).

    This is the sequential-constraint analytics class (the reference
    dashboard has no funnel; every product analytics engine does):
    "first B after first A" cannot be expressed in one aggregation
    pass, so the plan is a LADDER of per-user min-aggregates, each
    joined back to the filtered fact for the next stage.

    At scale: every rung shuffles on user_id, and every intermediate
    is user-cardinality (never fact-cardinality) because the
    aggregate runs BEFORE the next join; AQE reuses the user_id
    partitioning down the ladder.  The stage filters push to the
    scan (one scan per rung is fine: at 100 TB events are
    partitioned by type/date and each rung reads only its type's
    partitions -- far less than one full scan shuffled three times).
    The final counts are three 1-row aggregates unioned -- the
    established broadcast-scalar pattern.  Strict inequalities and
    timestamps only; no double arithmetic near a boundary.
    """
    views, clicks, purchases = _funnel_rungs(_load(spark, sf_dir, "events"))

    def _stage(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("stage"),
            F.lit(name).alias("event_type"),
            "n_users",
        )

    funnel = (
        _stage(views, 1, "view")
        .unionByName(_stage(clicks, 2, "click"))
        .unionByName(_stage(purchases, 3, "purchase"))
    )
    entered = views.agg(F.count(F.lit(1)).alias("_n1"))
    return funnel.crossJoin(F.broadcast(entered)).select(
        "stage",
        "event_type",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("_n1").cast("double"), 6
        ).alias("conversion"),
    )


EVENT_FUNNEL_SQL = """
WITH views AS (
    SELECT user_id, MIN(ts) AS _v FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
    SELECT e.user_id, MIN(e.ts) AS _c
    FROM events e JOIN views v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v._v
      AND e.ts <= v._v + INTERVAL 24 HOUR
    GROUP BY e.user_id
),
purchases AS (
    SELECT e.user_id, MIN(e.ts) AS _p
    FROM events e JOIN clicks c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c._c
      AND e.ts <= c._c + INTERVAL 24 HOUR
    GROUP BY e.user_id
),
funnel AS (
    SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM views
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM clicks
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM purchases
)
SELECT stage, event_type, n_users,
       round(CAST(n_users AS DOUBLE) /
             CAST((SELECT n_users FROM funnel WHERE stage = 1) AS DOUBLE),
             6) AS conversion
FROM funnel
"""


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped into first-seen-week cohorts,
    counted in each later week they were active.

    At scale: first-seen is one min-aggregate on user_id; the
    activity set is DISTINCT (user, week) -- deduped map-side before
    its exchange; the join is user-cardinality x small weekly fan-out
    (each user contributes at most n_weeks rows); the final aggregate
    groups on the tiny (cohort_week, week_offset) domain.  Week
    arithmetic is integer (epoch-day difference / 7) on both engines
    -- no timezone-sensitive truncation beyond the shared ISO
    date_trunc('week').
    """
    ev = _load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


WEEKLY_COHORT_RETENTION_SQL = """
WITH first_seen AS (
    SELECT user_id,
           CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS DATE) AS _week
    FROM events
)
SELECT cohort_week,
       CAST((_week - cohort_week) / 7 AS INTEGER) AS week_offset,
       COUNT(*) AS n_active_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY cohort_week, week_offset
"""


IDLE_CUSTOMER_BALANCE_SQL = """
WITH cust AS (
    SELECT c_custkey, c_nationkey,
           CAST(c_acctbal AS DECIMAL(12,2)) AS _bal
    FROM customer
),
stats AS (
    SELECT SUM(_bal) AS _total, COUNT(*) AS _cnt
    FROM cust WHERE _bal > 0
)
SELECT n_name AS nation, COUNT(*) AS n_customers,
       CAST(SUM(_bal) AS DOUBLE) AS total_balance
FROM cust, stats
JOIN nation ON c_nationkey = n_nationkey
WHERE _bal * _cnt > _total
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY n_name
"""


def _anomaly_z_predicate(n, v, s, ss):
    """Exact 1.5-sigma z-test ``4*(n*v - s)^2 > 9*(n*ss - s^2)`` over
    BIGINT window aggregates, as a boolean Column (r12, r11 ADVICE --
    extracted so the overflow guards are unit-testable on literal
    inputs without a 10^12-row window).

    Every product is DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0),
    which is EXACT for any pair of BIGINTs (max |long|^2 = 8.5e37 <
    1e38), so no narrowing cast can turn an overflow into a silent
    NULL-suppressed anomaly. The n*v product also computes in decimal
    -- in LONG it could overflow past n*|v| > 9.2e18 (an ANSI error
    under Spark 4's default, a silent wrap in non-ANSI deployments).
    The two places that CAN exceed 38 digits raise in-plan:
     - |d| = |n*v - s| >= 1.5e18 (so 4*d*d always fits): explicit
       guard. That bound is ~7.5e12 window rows at the fixture's
       vmax ~ 1e5 centi-units -- beyond a day of one type at 100 TB.
     - a NULL from decimal overflow in the final x4/x9 terms (only
       reachable past ~1e37 variance): null-check that raises instead
       of letting the predicate go silently false.
    The BIGINT window sums feeding this raise under ANSI (Spark 4
    default) and wrap silently only in non-ANSI deployments past
    n*vmax^2 > 9.2e18 (~9e8 rows/window at vmax 1e5); at corpora
    approaching that, switch ss to a decimal-summed column
    (sum(decimal(28,0)) -> decimal(38,0), overflow -> NULL -> caught
    by the same null guard)."""
    dec19 = "decimal(19,0)"
    d = (n.cast(dec19) * v.cast(dec19) - s.cast(dec19)).cast(dec19)
    d_guarded = F.when(
        F.abs(d) < F.lit(1_500_000_000_000_000_000).cast(dec19), d
    ).otherwise(
        F.raise_error(
            F.format_string(
                "value_anomalies: |n*v - s| = %s exceeds the exact-"
                "DECIMAL(38,0) bound 1.5e18; shrink the window or "
                "re-derive the predicate at this scale",
                F.abs(d),
            )
        ).cast(dec19)
    )
    lhs4 = d_guarded * d_guarded * F.lit(4).cast("decimal(1,0)")
    varn = n.cast(dec19) * ss.cast(dec19) - s.cast(dec19) * s.cast(dec19)
    rhs9 = varn * F.lit(9).cast("decimal(2,0)")
    return F.when(
        lhs4.isNull() | rhs9.isNull(),
        F.raise_error(
            F.lit(
                "value_anomalies: z-test term overflowed DECIMAL(38,0)"
                " -- window too large for the exact predicate"
            )
        ).cast("boolean"),
    ).otherwise(lhs4 > rhs9)


def value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: events whose value deviates
    from their event type's trailing-DAY mean by more than 1.5
    trailing standard deviations -- the streaming-dashboard alerting
    rule, as a RANGE-frame window plan. (Why 1.5 and not the classic
    3: the fixture's values are uniform, which caps |z| at sqrt(3) ~
    1.73, so a 3-sigma rule would be vacuously empty and the oracle
    row would test nothing; 1.5 sigma flags the distribution's tails
    and makes the parity check real. The threshold enters as the
    rational 9/4, so exactness is unaffected.)

    Exactness (the denominators-cleared discipline): values are
    2-decimal -> centi-units ``v = round(value*100)`` are exact
    BIGINTs; with window count n, sum s, sum-of-squares ss, the
    z-score test ``(v - s/n)^2 > (9/4) * (n*ss - s^2)/n^2``
    multiplies through by 4*n^2 to
    ``4*(n*v - s)^2 > 9*(n*ss - s^2)`` -- every term an exact
    integer. All products are DECIMAL(19,0) x DECIMAL(19,0) ->
    DECIMAL(38,0), exact for ANY pair of BIGINTs (max long^2 =
    8.5e37 < 1e38); the two places that can exceed 38 digits --
    (n*v - s)^2 past |n*v - s| >= 1.5e18, and the final x4/x9 --
    RAISE in-plan instead of becoming a non-ANSI NULL that silently
    suppresses anomalies (r11 ADVICE; bounds in the inline comment).
    DuckDB's 38-digit multiply cap forces the same DECIMAL(19,0)
    casts in the SQL. No double arithmetic anywhere near the
    predicate; the reported mean is display-only. The window is a
    trailing DAY, not hour: the fixture runs ~5 events/hour/type, so
    an hour window never reaches the n >= 20 floor and the rule
    would again be vacuous; a day window holds 100+ events at every
    tested scale while exercising the identical RANGE-frame plan.

    At scale (overlapping day shards): a window partitioned only by
    event_type caps parallelism at the number of types -- at 100 TB
    one task would stream years of one type's events. Instead every
    row is exploded into its OWN day shard and the NEXT day's shard
    (context copy), the window runs per (event_type, day shard), and
    only native rows (shard == own day) are emitted. A trailing-day
    frame can only reach into the previous calendar day, so the
    context copy makes every native row's frame IDENTICAL to the
    unsharded plan's -- the DuckDB oracle runs the UNSHARDED window,
    so the hash-match is itself the sharded==naive proof. Cost: the
    shuffle carries each row twice (the standard overlap tax);
    parallelism becomes types x days. RANGE, not ROWS, so
    simultaneous events share a frame deterministically (same choice
    as moving_avg_events). The n >= 20 floor keeps cold-start
    windows from flagging on noise.
    """
    ev = _load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type", "_shard")
        .orderBy(F.col("_sec"))
        .rangeBetween(-86399, Window.currentRow)
    )
    v = F.round(F.col("value") * 100).cast("long")
    staged = (
        ev.withColumn("_sec", F.unix_timestamp("ts"))
        .withColumn("_day", F.expr("_sec div 86400"))
        .withColumn("_v", v)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            "_sec",
            "_day",
            "_v",
            F.explode(
                F.array(F.col("_day"), F.col("_day") + F.lit(1))
            ).alias("_shard"),
        )
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            "_day",
            "_shard",
            F.count(F.lit(1)).over(w).alias("_n"),
            F.sum("_v").over(w).alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).over(w).alias("_ss"),
            F.col("_v"),
        )
        .filter(F.col("_shard") == F.col("_day"))
    )
    pred = _anomaly_z_predicate(
        F.col("_n"), F.col("_v"), F.col("_s"), F.col("_ss")
    )
    return (
        staged.filter((F.col("_n") >= 20) & pred)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.col("_n").alias("n_window"),
            F.round(
                F.col("_s").cast("double") / F.col("_n").cast("double") / 100.0, 6
            ).alias("window_mean"),
        )
    )


VALUE_ANOMALIES_SQL = """
WITH staged AS (
    SELECT event_id, event_type, ts, value,
           CAST(round(value * 100) AS BIGINT) AS _v,
           COUNT(*) OVER w AS _n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS _s,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS _ss
    FROM events
    WINDOW w AS (
        PARTITION BY event_type
        ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW
    )
)
SELECT event_id, event_type, ts, value, _n AS n_window,
       round(CAST(_s AS DOUBLE) / CAST(_n AS DOUBLE) / 100.0, 6)
           AS window_mean
FROM staged
WHERE _n >= 20
  AND CAST(CAST(_n * _v - _s AS DECIMAL(19,0))
           * CAST(_n * _v - _s AS DECIMAL(19,0)) AS DECIMAL(37,0))
      * CAST(4 AS DECIMAL(1,0))
      > CAST(CAST(_n AS DECIMAL(12,0)) * CAST(_ss AS DECIMAL(26,0))
             - CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0))
             AS DECIMAL(22,0)) * CAST(9 AS DECIMAL(2,0))
"""


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Q3 shape: top-k undelivered orders by accrued revenue for one
    market segment -- the date-filtered-on-BOTH-sides join with a
    composite-key top-k.

    At scale: both date filters and the segment filter push to their
    scans (customer is pre-filtered to the segment BEFORE its join,
    cutting the build side ~5x); orders-lineitem shuffles once on the
    orderkey; the aggregate groups on (orderkey, orderdate, priority)
    -- orderkey-functional, so no extra exchange width; top-k is
    TakeOrderedAndProject on (revenue DESC, orderdate, orderkey) --
    per-partition heaps, never a global sort. Revenue is the exact
    DECIMAL sum; the deterministic tie-break is part of the key.
    """
    cutoff = "1996-06-15"
    cust = _load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            "n_items",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "orderkey")
        .limit(k)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT o_orderkey AS orderkey,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-15'
  AND l_shipdate > TIMESTAMP '1996-06-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, orderkey
LIMIT 10
"""
