"""Relational coverage, part 2: rollup, semi/anti joins, pivot, as-of.

The as-of join is the one operator here Spark lacks natively
(pyspark guide 'Common OLAP patterns'): implemented as the
union-and-carry-forward window trick -- tag order rows 0 and event
rows 1, sort by (time, tag) per key, carry the last order struct
forward with last(..., ignorenulls) -- one shuffle on the key, no
range explosion. The DuckDB oracle uses its native ASOF LEFT JOIN.
Orders are pre-deduped to one row per (custkey, date) (max orderkey)
so the as-of pick is well-defined in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table as _load

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total) over lineitem."""
    li = _load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ROLLUP_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def segment_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join census: per market segment, customers with and
    without orders (left_semi / left_anti -> EXISTS / NOT EXISTS)."""
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


SEGMENT_SEMI_ANTI_SQL = """
WITH w AS (
    SELECT c_mktsegment, COUNT(*) AS n_with_orders
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
),
wo AS (
    SELECT c_mktsegment, COUNT(*) AS n_without_orders
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
)
SELECT
    COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
    COALESCE(n_with_orders, 0) AS n_with_orders,
    COALESCE(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
"""


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events per user x event_type (explicit value list keeps
    the plan single-pass; Spark fills absent combos with null -> 0)."""
    ev = _load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, EVENT_TYPES)


PIVOT_EVENT_COUNTS_SQL = """
SELECT user_id,
    COUNT(*) FILTER (WHERE event_type = 'click') AS click,
    COUNT(*) FILTER (WHERE event_type = 'error') AS error,
    COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
    COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
    COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY user_id
"""


def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the per-user pivot back to long form."""
    wide = pivot_event_counts(spark, sf_dir)
    return wide.unpivot(
        "user_id", EVENT_TYPES, "event_type", "n_events"
    )


UNPIVOT_EVENT_METRICS_SQL = f"""
WITH wide AS ({PIVOT_EVENT_COUNTS_SQL})
SELECT user_id, event_type, n_events
FROM wide UNPIVOT (n_events FOR event_type IN (click, error, purchase, signup, view))
"""


def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION census over two derived key sets:
    active users (events) vs purchasing users."""
    ev = _load(spark, sf_dir, "events")
    active = ev.select(F.col("user_id").alias("k")).distinct()
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("k"))
        .distinct()
    )
    inter = active.intersect(buyers).select(F.count(F.lit(1)).alias("n_both"))
    only_active = active.exceptAll(buyers).select(
        F.count(F.lit(1)).alias("n_active_only")
    )
    union_n = active.union(buyers).distinct().select(
        F.count(F.lit(1)).alias("n_union")
    )
    return inter.crossJoin(only_active).crossJoin(union_n)


USER_SET_OPS_SQL = """
WITH active AS (SELECT DISTINCT user_id AS k FROM events),
buyers AS (SELECT DISTINCT user_id AS k FROM events WHERE event_type = 'purchase')
SELECT
    (SELECT COUNT(*) FROM (SELECT k FROM active INTERSECT SELECT k FROM buyers)) AS n_both,
    (SELECT COUNT(*) FROM (SELECT k FROM active EXCEPT SELECT k FROM buyers)) AS n_active_only,
    (SELECT COUNT(*) FROM (SELECT k FROM active UNION SELECT k FROM buyers)) AS n_union
"""


def events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation: date_trunc to the hour + conditional
    counts (the classic dashboard timeseries shape)."""
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_BY_HOUR_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


def range_join_signup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: all events within 1 hour AFTER the same user's
    signup events, via the BUCKETIZED pattern Spark needs at scale.

    A naive theta join (a.key = b.key AND a.ts BETWEEN ...) plans as
    BroadcastNestedLoop/cartesian per key at scale. Instead: explode
    each range into its covered hour buckets (bounded: a 1-hour range
    starting mid-hour covers exactly 2), equi-join on (user, hour) --
    hash-shuffled, prunable -- then apply the exact range predicate.
    The oracle is the plain inequality join (identical semantics).

    r11 replacement: this query was events-to-ORDERS for ten rounds,
    but the fixtures' time bases never overlap (orders 1995-2001,
    events 2024), so every driver hash-match compared empty sets --
    the vacuous-oracle trap. The self-range-join keeps the identical
    plan class (explode-to-buckets + equi-join + exact predicate)
    with 162 real matches at sf0.01 ("activity in the first hour
    after signup" -- the activation metric).
    """
    ev = _load(spark, sf_dir, "events")
    hour = F.expr("floor(unix_timestamp(ts) / 3600)").cast("long")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.explode(
            F.array(hour, hour + F.lit(1).cast("long"))
        ).alias("hour_bucket"),
    )
    ev_b = ev.select(
        "event_id", "user_id", "event_type", "ts", hour.alias("hour_bucket")
    )
    return (
        ev_b.join(
            signups,
            (ev_b.user_id == signups.uid)
            & (ev_b.hour_bucket == signups.hour_bucket),
        )
        .filter(
            (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("event_id") != F.col("signup_id"))
        )
        .select("event_id", "signup_id", "user_id", "event_type", "ts", "s_ts")
    )


RANGE_JOIN_SQL = """
SELECT e.event_id, s.event_id AS signup_id, e.user_id, e.event_type,
       e.ts, s.ts AS s_ts
FROM events e
JOIN events s
  ON e.user_id = s.user_id
 AND s.event_type = 'signup'
 AND e.ts >= s.ts
 AND e.ts < s.ts + INTERVAL 1 HOUR
 AND e.event_id <> s.event_id
"""


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rows via Spark's NATIVE session_window (gap 30 min).

    Complements `user_sessions` (manual lag+cumsum, per-user totals):
    this emits one row per session with the merged window bounds.
    Spark merges an event into the current session iff its ts is
    STRICTLY before last_ts + gap, so the oracle's new-session flag is
    `diff >= gap`; window end = last event ts + gap. One shuffle on
    user_id; session merge runs inside the partition.
    """
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
"""


def moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour sliding average per user: RANGE frame over epoch seconds.

    RANGE (not ROWS) so simultaneous events share a frame regardless of
    row order -- the only deterministic sliding frame. avg is written
    as exact-decimal sum / count (engine AVG accumulators differ).
    One shuffle on user_id; the frame scan is a per-partition
    running-window pass, no second exchange.
    """
    ev = _load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_sec"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        ev.withColumn("_sec", sec)
        .select(
            "event_id",
            "user_id",
            "ts",
            (
                F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
            ).alias("moving_avg"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
    )


MOVING_AVG_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg,
       COUNT(*) OVER w AS n_in_window
FROM events
WINDOW w AS (
    PARTITION BY user_id
    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
)
"""


def downsample_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: 5-minute buckets
    per event_type with first/last (by event_id -- the deterministic
    arrival order), min/max, count.

    The timeseries-DB downsampling pattern as one hash aggregate:
    bucket key is integer epoch-seconds arithmetic (cross-engine exact,
    no tz-sensitive date truncation). Map-side partial agg halves the
    shuffle; at 100 TB this is the canonical pre-aggregation cascade
    (5 min -> hour -> day each reusing the previous level).
    """
    ev = _load(spark, sf_dir, "events")
    bucket = F.expr("(unix_timestamp(ts) div 300) * 300")
    return (
        ev.groupBy(
            "event_type", bucket.alias("bucket_sec")
        )
        .agg(
            F.min_by("value", "event_id").alias("first_value"),
            F.max_by("value", "event_id").alias("last_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


DOWNSAMPLE_SQL = """
SELECT event_type,
       (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_sec,
       arg_min(value, event_id) AS first_value,
       arg_max(value, event_id) AS last_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all four grouping
    combinations, with GROUPING() markers to disambiguate rollup nulls."""
    orders = _load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "sum_price"
        ),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


CUBE_ORDER_STATS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def grouping_sets_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with heterogeneous sets -- ((flag, status), (mode),
    ()) -- the shape CUBE/ROLLUP can't express (they only emit prefix /
    power-set lattices). Native `DataFrame.groupingSets` (Spark 4.0+);
    one Expand + one hash aggregate, same cost as a single-pass cube.
    GROUPING() markers disambiguate lattice nulls from data nulls."""
    li = _load(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["ship_year"], []],
        "l_returnflag",
        "l_linestatus",
        "ship_year",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("ship_year").cast("int").alias("g_year"),
    )


GROUPING_SETS_SHIPPING_SQL = """
SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(year(l_shipdate)) AS INTEGER) AS g_year
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (year(l_shipdate)), ())
"""


def above_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: events whose value exceeds their
    user's average. Spark side uses the idiomatic window-average
    (one shuffle); the oracle uses an actual correlated scalar
    subquery -- same semantics."""
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    # avg as exact-decimal sum / count -- engine AVG implementations
    # differ (decimal-rounding vs double accumulation); this form is
    # deterministic and identical in both
    avg_d = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        ev.withColumn("user_avg", avg_d)
        .filter(F.col("value") > F.col("user_avg"))
        .select("event_id", "user_id", "value", F.round("user_avg", 6).alias("user_avg"))
    )


ABOVE_USER_AVG_SQL = """
WITH ua AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS user_avg
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.value, round(ua.user_avg, 6) AS user_avg
FROM events e JOIN ua ON e.user_id = ua.user_id
WHERE e.value > ua.user_avg
"""


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct + approx quantiles) -- the
    sketches differ across engines by design, so this is a rows-only
    query; tests bound the error against exact values instead."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
    )


def exact_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact twin of approx_aggregates: COUNT(DISTINCT)
    + interpolated exact quantiles over the same columns, so the
    distinct/quantile surface gets an oracle-checked driver row while
    the sketch variant stays rows-only (error-bounded in tests).

    Exact distinct + exact percentile both shuffle on the group key
    only; percentile's per-group sort is bounded by group size (6
    return-flag groups), not corpus size."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias(
            "median_price"
        ),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias(
            "p95_price"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


EXACT_DISTINCT_QUANTILES_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's latest order at or
    before the event time (union + carry-forward window)."""
    ev = _load(spark, sf_dir, "events")
    orders = _load(spark, sf_dir, "orders")
    od = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", F.col("o_orderkey")).alias("o_totalprice"),
    )
    o_side = od.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.struct("o_orderkey", "o_totalprice").alias("ord"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e_side = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(None).cast("struct<o_orderkey:bigint,o_totalprice:double>").alias("ord"),
        F.lit(1).alias("tag"),
        "event_id",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = o_side.unionByName(e_side).withColumn(
        "last_ord", F.last("ord", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.col("t").alias("ts"),
        F.col("last_ord.o_orderkey").alias("last_orderkey"),
        F.col("last_ord.o_totalprice").alias("last_totalprice"),
    )


ASOF_LATEST_ORDER_SQL = """
WITH od AS (
    SELECT o_custkey, o_orderdate,
           MAX(o_orderkey) AS o_orderkey,
           arg_max(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       od.o_orderkey AS last_orderkey,
       od.o_totalprice AS last_totalprice
FROM events e
ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
"""


def gapfill_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 5-minute series per event_type: the
    time_bucket_gapfill + locf() shape of timeseries DBs. A dense
    bucket grid (min..max per type) left-joins the observed rollup;
    empty buckets keep an explicit zero count, an is_gap marker, and
    the last observed average carried forward.

    Scale shape: the heavy table passes only through the 5-min hash
    aggregate; the grid is sequence(min, max, 300) per type --
    span/300 rows, independent of event count. LOCF is a
    last(ignorenulls) running window PARTITIONED by type, so no
    global serial task. Average = decimal-cast sum / count (double
    SUM reassociates; decimal does not)."""
    ev = _load(spark, sf_dir, "events")
    bucket = F.expr("(unix_timestamp(ts) div 300) * 300")
    agg = ev.groupBy("event_type", bucket.alias("bucket_sec")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_v"),
        F.count(F.lit(1)).alias("n_events"),
    )
    span = agg.groupBy("event_type").agg(
        F.min("bucket_sec").alias("mn"), F.max("bucket_sec").alias("mx")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.lit(300))).alias("bucket_sec"),
    )
    joined = grid.join(agg, ["event_type", "bucket_sec"], "left").select(
        "event_type",
        "bucket_sec",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("sum_v").isNull().alias("is_gap"),
        F.round(F.col("sum_v") / F.col("n_events"), 6).alias("avg_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn(
        "filled_avg",
        F.round(F.last("avg_value", ignorenulls=True).over(w), 6),
    )


GAPFILL_5MIN_SQL = """
WITH agg AS (
    SELECT event_type,
        (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_sec,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v,
        COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
),
grid AS (
    SELECT event_type, unnest(generate_series(mn, mx, 300)) AS bucket_sec
    FROM (
        SELECT event_type, MIN(bucket_sec) AS mn, MAX(bucket_sec) AS mx
        FROM agg GROUP BY 1
    )
),
joined AS (
    SELECT g.event_type, g.bucket_sec,
        COALESCE(a.n_events, 0) AS n_events,
        a.sum_v IS NULL AS is_gap,
        round(a.sum_v / a.n_events, 6) AS avg_value
    FROM grid g LEFT JOIN agg a USING (event_type, bucket_sec)
)
SELECT event_type, bucket_sec, n_events, is_gap, avg_value,
    round(last_value(avg_value IGNORE NULLS) OVER (
        PARTITION BY event_type ORDER BY bucket_sec
        ROWS UNBOUNDED PRECEDING), 6) AS filled_avg
FROM joined
"""


def window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ranking/navigation/frame window function in one plan over
    a single (user_id) partitioning: rank, dense_rank, percent_rank,
    cume_dist, ntile, lag, lead, first_value and a ROWS-frame average.
    One exchange on user_id feeds ALL ten functions (one Window spec
    family -> Catalyst plans a single Window operator chain, no
    re-shuffle between functions). Frame sums run over <= 3 doubles in
    deterministic frame order, so cross-engine doubles agree exactly;
    percent_rank/cume_dist are single divisions of the same operands.
    """
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("tile4"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_in_frame"),
        F.round(F.avg("value").over(wf), 6).alias("avg_in_frame"),
    )


WINDOW_ZOO_SQL = """
SELECT
    user_id,
    event_id,
    rank() OVER w AS rnk,
    dense_rank() OVER w AS drnk,
    round(percent_rank() OVER w, 6) AS prank,
    round(cume_dist() OVER w, 6) AS cdist,
    ntile(4) OVER w AS tile4,
    lag(value, 1) OVER w AS prev_value,
    lead(value, 1) OVER w AS next_value,
    first_value(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        AS first_in_frame,
    round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
        AS avg_in_frame
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
