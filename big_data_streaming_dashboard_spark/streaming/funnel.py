"""Streaming product analytics: the ordered conversion funnel,
cohort retention, and trailing-window anomaly alerting as exact
stateful operators (the streaming counterparts of
plans/relational4.event_funnel, weekly_cohort_retention and
value_anomalies).

The batch funnel is a ladder of per-user min-aggregates ("first click
strictly after the first view, first purchase strictly after that").
Streamed, that dependency is inherently stateful AND order-sensitive:
a LATER micro-batch can deliver an EARLIER view, which retroactively
makes a click we already saw eligible. An exact out-of-order funnel
therefore cannot keep just the current answers -- it must retain every
stage event that could still become an answer under any future
arrival.

The retention rule that makes state minimal while staying exact
(proof in ``_make_update``): answers only ever move EARLIER as more
data arrives (the view floor only decreases, and a looser floor can
only admit earlier clicks), so any stage event LATER than the current
answer can never become an answer -- prune it. What remains per user
is ``{clicks <= first_view} + {current answer}`` (and the purchase
analog): exactly the events whose eligibility a future earlier view
could still flip. That is the information-theoretic floor for an
exact out-of-order funnel -- any operator keeping less state returns
wrong answers under adversarial arrival order (our parity test
replays the fixture in REVERSE timestamp order to force precisely
those retroactive flips).

At scale: state lives in the state store keyed by user_id (RocksDB
provider for large user sets -- the same deployment note as the
exact-cooldown operator, streaming/stateful.py); per-user state is
bounded by the user's PRE-conversION stage-event counts, not their
event history. Emission is one row per (user, micro-batch) carrying
the current stage answers plus a per-user sequence number, so any
downstream consumer (or the parity test) takes the max-seq row as
the user's latest state -- the classic changelog shape.

Reference analog: none (the reference dashboard has no funnel); this
extends the engine's product-analytics surface the same way the
curation capstone extends its corpus surface.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("first_view", T.TimestampNTZType(), True),
        T.StructField("first_click", T.TimestampNTZType(), True),
        T.StructField("first_purchase", T.TimestampNTZType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_view_us", T.LongType(), True),
        T.StructField("clicks_us", T.ArrayType(T.LongType()), True),
        T.StructField("purchases_us", T.ArrayType(T.LongType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _make_update(window_us: int = 24 * 3600 * 1_000_000):
    # self-contained closure (no module-global references): Spark's
    # Python workers do not have this repo on PYTHONPATH (the driver
    # loads __spark_entry__ by file path), so cloudpickle must carry
    # everything by value -- same discipline as streaming/stateful.py.
    def answer_after(sorted_events: list, floor):
        """min{e : floor < e <= floor + window}, or None. ``floor``
        None means no floor event yet -> no answer possible."""
        if floor is None:
            return None
        for e in sorted_events:
            if e > floor:
                return e if e <= floor + window_us else None
        return None

    def prune(sorted_events: list, answer, floor):
        """Keep only events that can still become the answer under a
        FUTURE (smaller) floor. With the conversion window W the
        floor only decreases, so the eligibility interval
        (floor, floor+W] only slides EARLIER: (a) events later than
        floor+W can never re-enter any future interval -- prune;
        (b) events later than today's answer can never win either --
        for such an event to win, the answer would have to fall off
        the interval's TOP (floor' < answer - W), but that same top
        excludes everything above the answer too (contradiction), so
        answers only ever move earlier or to None. Bound =
        min(answer, floor+W); with no floor yet nothing is
        prunable."""
        if answer is not None:
            bound = answer
        elif floor is not None:
            bound = floor + window_us
        else:
            return sorted_events
        return [e for e in sorted_events if e <= bound]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            v, clicks, purchases, seq = state.get
            clicks = list(clicks)
            purchases = list(purchases)
        else:
            v, clicks, purchases, seq = None, [], [], 0
        batch = pd.concat(list(pdfs))
        # micros regardless of the Arrow-to-pandas datetime unit
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        types = batch["event_type"]
        new_views = us[types == "view"]
        if len(new_views):
            mv = int(new_views.min())
            v = mv if v is None else min(v, mv)
        clicks = sorted(set(clicks) | set(int(x) for x in us[types == "click"]))
        purchases = sorted(
            set(purchases) | set(int(x) for x in us[types == "purchase"])
        )
        c = answer_after(clicks, v)
        p = answer_after(purchases, c)
        clicks = prune(clicks, c, v)
        purchases = prune(purchases, p, c)
        seq += 1
        state.update((v, clicks, purchases, seq))
        def ts_of(x):
            return pd.NaT if x is None else pd.Timestamp(x, unit="us")

        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "first_view": pd.Series([ts_of(v)], dtype="datetime64[us]"),
                "first_click": pd.Series([ts_of(c)], dtype="datetime64[us]"),
                "first_purchase": pd.Series(
                    [ts_of(p)], dtype="datetime64[us]"
                ),
                "seq": [int(seq)],
            }
        )

    return update


def funnel_state_stream(
    events: DataFrame, window_hours: int = 24
) -> DataFrame:
    """Per-user exact ordered-funnel state carried across micro-batches
    (``applyInPandasWithState`` keyed on user_id), with the same
    24-hour conversion window as the batch query (each stage must
    land within ``window_hours`` of the previous one). Emits the
    user's current (first_view, first_click, first_purchase) answers
    each time the user appears in a batch, with a monotone ``seq`` --
    collapse with :func:`funnel_latest` for the current table."""
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(window_us=window_hours * 3600 * 1_000_000),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_latest(emitted: DataFrame) -> DataFrame:
    """Collapse the changelog-shaped stream output to each user's
    latest state row (max seq per user) -- a batch op over the sink
    table, one shuffle on user_id."""
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max_by("first_view", "seq").alias("first_view"),
            F.max_by("first_click", "seq").alias("first_click"),
            F.max_by("first_purchase", "seq").alias("first_purchase"),
        )
    )


def funnel_counts(user_stages: DataFrame) -> DataFrame:
    """The 3-row funnel table (stage, event_type, n_users, conversion)
    from a per-user stage frame -- same output shape and rounding as
    plans/relational4.event_funnel, so the streamed state aggregates
    to the exact batch query result. One aggregation pass (the
    per-user frame is already user-cardinality), fanned to three rows
    by an explode of a 3-element literal array."""
    agg = user_stages.agg(
        F.count("first_view").alias("n1"),
        F.count("first_click").alias("n2"),
        F.count("first_purchase").alias("n3"),
    )
    stage = F.explode(
        F.array(
            F.struct(
                F.lit(1).alias("stage"),
                F.lit("view").alias("event_type"),
                F.col("n1").alias("n_users"),
            ),
            F.struct(
                F.lit(2).alias("stage"),
                F.lit("click").alias("event_type"),
                F.col("n2").alias("n_users"),
            ),
            F.struct(
                F.lit(3).alias("stage"),
                F.lit("purchase").alias("event_type"),
                F.col("n3").alias("n_users"),
            ),
        )
    ).alias("s")
    return agg.select(stage, "n1").select(
        F.col("s.stage").alias("stage"),
        F.col("s.event_type").alias("event_type"),
        F.col("s.n_users").alias("n_users"),
        F.round(
            F.col("s.n_users").cast("double") / F.col("n1").cast("double"), 6
        ).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# Cohort retention, streamed (the stateful counterpart of
# plans/relational4.weekly_cohort_retention)
# ---------------------------------------------------------------------------

RETENTION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("cohort_week", T.DateType(), True),
        T.StructField("week_offsets", T.ArrayType(T.IntegerType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

_RETENTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("weeks_us", T.ArrayType(T.LongType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _make_retention_update():
    # self-contained closure (cloudpickle-by-value; see _make_update)
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            weeks, seq = state.get
            weeks = set(weeks)
        else:
            weeks, seq = set(), 0
        batch = pd.concat(list(pdfs))
        ts = batch["ts"].astype("datetime64[us]")
        # ISO-Monday week start, micros since epoch -- the pandas
        # mirror of date_trunc('week', ts) on both engines (weekday()
        # is Monday=0)
        wk = (
            ts.dt.normalize() - pd.to_timedelta(ts.dt.weekday, unit="D")
        ).astype("datetime64[us]")  # the subtraction promotes to [ns]
        weeks |= set(int(x) for x in wk.astype("int64"))
        seq += 1
        state.update((sorted(weeks), seq))
        first = min(weeks)
        day_us = 86_400_000_000
        offsets = sorted((w - first) // (7 * day_us) for w in weeks)
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "cohort_week": pd.Series(
                    [pd.Timestamp(first, unit="us")], dtype="datetime64[us]"
                ).dt.date,
                "week_offsets": [[int(o) for o in offsets]],
                "seq": [int(seq)],
            }
        )

    return update


def retention_state_stream(events: DataFrame) -> DataFrame:
    """Per-user cohort-retention state across micro-batches: the set of
    distinct ISO activity weeks. Out-of-order arrival is handled
    exactly and WITHOUT a funnel-style retention proof burden: the
    week set is a plain monotone union, and the cohort week is its
    min -- when a later batch delivers an EARLIER first week, every
    existing offset shifts and the changelog row re-emits the user's
    full corrected (cohort_week, offsets) vector, so the latest row
    per user is always the complete truth. State is bounded by the
    number of distinct weeks the user was active, the same floor the
    batch query's distinct (user, week) set pays."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_retention_update(),
            outputStructType=RETENTION_OUTPUT_SCHEMA,
            stateStructType=_RETENTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def retention_latest(emitted: DataFrame) -> DataFrame:
    """Latest changelog row per user (max seq)."""
    return emitted.groupBy("user_id").agg(
        F.max_by("cohort_week", "seq").alias("cohort_week"),
        F.max_by("week_offsets", "seq").alias("week_offsets"),
    )


def retention_triangle(latest: DataFrame) -> DataFrame:
    """Aggregate the per-user latest rows to the (cohort_week,
    week_offset, n_active_users) triangle -- the exact output shape of
    plans/relational4.weekly_cohort_retention. One explode (each user
    contributes at most n_weeks rows) + one aggregate onto the tiny
    (cohort, offset) domain."""
    return (
        latest.select(
            "cohort_week", F.explode("week_offsets").alias("week_offset")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Trailing-window anomaly alerting, streamed (the stateful counterpart
# of plans/relational4.value_anomalies)
# ---------------------------------------------------------------------------

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("n_window", T.LongType(), True),
        T.StructField("_s", T.LongType(), True),
    ]
)

_ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("secs", T.ArrayType(T.LongType()), True),
        T.StructField("ns", T.ArrayType(T.LongType()), True),
        T.StructField("sums", T.ArrayType(T.LongType()), True),
        T.StructField("sqs", T.ArrayType(T.LongType()), True),
        # everything before this second has been pruned -- the
        # ordered-arrival contract's enforcement point
        T.StructField("horizon", T.LongType(), True),
    ]
)


def _make_anomaly_update(window_s: int = 86400, min_n: int = 20):
    # self-contained closure (cloudpickle-by-value; see _make_update)
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        if state.exists:
            *arrays, horizon = state.get
            secs, ns, sums, sqs = (list(x) for x in arrays)
        else:
            secs, ns, sums, sqs, horizon = [], [], [], [], None
        batch = pd.concat(list(pdfs))
        ts = batch["ts"].astype("datetime64[us]")
        ev_sec = (ts.astype("int64") // 1_000_000).tolist()
        # fail LOUDLY on a contract breach instead of silently
        # computing a truncated window: an event whose trailing frame
        # reaches before the pruned horizon cannot be answered
        # exactly anymore (same ethos as the fingerprinted index
        # refusal -- never silently mix)
        if horizon is not None and ev_sec and (
            min(ev_sec) - (window_s - 1) < horizon
        ):
            raise ValueError(
                "anomaly_verdict_stream: event at sec "
                f"{min(ev_sec)} arrived with its trailing window "
                f"reaching before the pruned horizon {horizon}; the "
                "ordered-arrival contract is broken and an exact "
                "verdict is no longer possible (restart from the "
                "batch query or widen the trigger alignment)"
            )
        ev_v = [
            int(x) for x in (batch["value"] * 100).round().astype("int64")
        ]
        # fold the batch's per-second aggregates into the state maps
        for s_, v_ in zip(ev_sec, ev_v):
            i = bisect.bisect_left(secs, s_)
            if i < len(secs) and secs[i] == s_:
                ns[i] += 1
                sums[i] += v_
                sqs[i] += v_ * v_
            else:
                secs.insert(i, s_)
                ns.insert(i, 1)
                sums.insert(i, v_)
                sqs.insert(i, v_ * v_)
        # prefix sums over the FULL merged table -- verdicts must see
        # every second at or before their own (a micro-batch can span
        # days; pruning before the verdicts truncated early events'
        # windows -- caught by the parity test). Pruning for the
        # NEXT batch happens after, below.
        pn = [0]
        ps = [0]
        pq = [0]
        for a, b, c in zip(ns, sums, sqs):
            pn.append(pn[-1] + a)
            ps.append(ps[-1] + b)
            pq.append(pq[-1] + c)
        out_idx = []
        out_n = []
        out_s = []
        for j, (s_, v_) in enumerate(zip(ev_sec, ev_v)):
            lo = bisect.bisect_left(secs, s_ - (window_s - 1))
            hi = bisect.bisect_right(secs, s_)
            n = pn[hi] - pn[lo]
            ssum = ps[hi] - ps[lo]
            ssq = pq[hi] - pq[lo]
            # exact arbitrary-precision integer z-test (the batch
            # plan's cleared-denominator predicate, in Python ints)
            d = n * v_ - ssum
            if n >= min_n and 4 * d * d > 9 * (n * ssq - ssum * ssum):
                out_idx.append(j)
                out_n.append(n)
                out_s.append(ssum)
        # prune seconds that can never appear in a future trailing
        # window (valid under the documented event-time-ordered
        # arrival contract)
        new_horizon = max(secs) - (window_s - 1)
        cut = bisect.bisect_left(secs, new_horizon)
        state.update(
            (secs[cut:], ns[cut:], sums[cut:], sqs[cut:], new_horizon)
        )
        sel = batch.iloc[out_idx]
        yield pd.DataFrame(
            {
                "event_id": sel["event_id"].astype("int64").to_numpy(),
                "event_type": [str(key[0])] * len(out_idx),
                "ts": pd.Series(
                    list(ts.iloc[out_idx]), dtype="datetime64[us]"
                ),
                "value": sel["value"].astype("float64").to_numpy(),
                "n_window": pd.array(out_n, dtype="int64"),
                "_s": pd.array(out_s, dtype="int64"),
            }
        )

    return update


def anomaly_verdict_stream(events: DataFrame) -> DataFrame:
    """Streaming trailing-day 1.5-sigma anomaly alerting: per-type
    per-second aggregate maps carried in the state store, each
    arriving event tested against the EXACT integer z-predicate of
    the batch query (Python's arbitrary-precision ints, so no DECIMAL
    width gymnastics and no overflow at any scale).

    Parity contract (documented, tested): with event-time-ordered
    arrival and micro-batch boundaries on whole seconds -- the shape
    a second-aligned trigger produces -- every verdict uses exactly
    the batch RANGE frame's contents, so the emitted set equals
    `value_anomalies` row-for-row. Under out-of-order arrival the
    semantics become knowledge-at-arrival alerting (an alert fires on
    what the system has seen), which is the deployment semantic a
    live dashboard wants anyway; state pruning assumes the ordered
    contract. For exactness under bounded disorder instead, use
    :func:`anomaly_verdict_stream_delayed` (r13): it trades verdict
    latency (up to the watermark delay) for row-for-row batch parity
    under ANY arrival order. State per type is bounded by the
    trailing day's distinct seconds (<= 86,400 entries)."""
    return (
        events.select("event_id", "event_type", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_anomaly_update(),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=_ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def anomaly_table(emitted: DataFrame) -> DataFrame:
    """Finish the streamed verdicts into the batch query's exact
    output shape: window_mean is computed by the SAME Spark
    expression the batch plan uses (identical rounding), from the
    exact integer window sum the kernel emitted."""
    return emitted.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "n_window",
        F.round(
            F.col("_s").cast("double") / F.col("n_window").cast("double") / 100.0,
            6,
        ).alias("window_mean"),
    )


# ---------------------------------------------------------------------------
# Watermark-delayed anomaly mode (r13, r12 verdict item 4): exact
# under BOUNDED disorder, like funnel/retention already are
# ---------------------------------------------------------------------------

_ANOMALY_DELAYED_STATE_SCHEMA = T.StructType(
    [
        # the ordered kernel's per-second aggregate maps (fold order
        # never matters -- merging is commutative)
        T.StructField("secs", T.ArrayType(T.LongType()), True),
        T.StructField("ns", T.ArrayType(T.LongType()), True),
        T.StructField("sums", T.ArrayType(T.LongType()), True),
        T.StructField("sqs", T.ArrayType(T.LongType()), True),
        # events whose verdict is HELD until the watermark passes
        # their second (bounded by the watermark delay's worth of
        # events -- the disorder bound the caller declared)
        T.StructField("pend_ids", T.ArrayType(T.LongType()), True),
        T.StructField("pend_us", T.ArrayType(T.LongType()), True),
        T.StructField("pend_vals", T.ArrayType(T.DoubleType()), True),
        T.StructField("pend_vis", T.ArrayType(T.LongType()), True),
        # every second < emit_horizon has had its verdicts emitted
        T.StructField("emit_horizon", T.LongType(), True),
    ]
)


def _make_anomaly_update_delayed(window_s: int = 86400, min_n: int = 20):
    # self-contained closure (cloudpickle-by-value; see _make_update)
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        if state.exists:
            (secs, ns, sums, sqs, p_ids, p_us, p_vals, p_vis), horizon = (
                [list(x) for x in state.get[:8]],
                state.get[8],
            )
        else:
            secs, ns, sums, sqs = [], [], [], []
            p_ids, p_us, p_vals, p_vis = [], [], [], []
            horizon = None
        frames = [f for f in pdfs if len(f)]
        if frames:
            batch = pd.concat(frames)
            ts = batch["ts"].astype("datetime64[us]")
            ts_us = ts.astype("int64").tolist()
            # identical rounding path to the ordered kernel (numpy
            # HALF_EVEN), so both modes test the exact same integers
            vis = [
                int(x)
                for x in (batch["value"] * 100).round().astype("int64")
            ]
            # defensive only: Spark's watermark filter already drops
            # rows older than the CURRENT watermark before they reach
            # this kernel, and emit_horizon never exceeds a PAST
            # watermark -- so this can fire only on an engine-contract
            # break, never on merely-late data (which is dropped
            # upstream and surfaces in numRowsDroppedByWatermark)
            if horizon is not None and ts_us and (
                min(ts_us) // 1_000_000 < horizon
            ):
                raise ValueError(
                    "anomaly_verdict_stream_delayed: event at sec "
                    f"{min(ts_us) // 1_000_000} arrived below the "
                    f"emitted horizon {horizon}; its window verdicts "
                    "were already finalized"
                )
            for u, vi in zip(ts_us, vis):
                s_ = u // 1_000_000
                i = bisect.bisect_left(secs, s_)
                if i < len(secs) and secs[i] == s_:
                    ns[i] += 1
                    sums[i] += vi
                    sqs[i] += vi * vi
                else:
                    secs.insert(i, s_)
                    ns.insert(i, 1)
                    sums.insert(i, vi)
                    sqs.insert(i, vi * vi)
            p_ids += [int(x) for x in batch["event_id"].astype("int64")]
            p_us += ts_us
            p_vals += [float(x) for x in batch["value"].astype("float64")]
            p_vis += vis
        # emit verdicts for every pending event whose SECOND the
        # watermark has passed: any event that could still land at or
        # before that second has ts < watermark and is filtered by
        # Spark, so the trailing frame is final -- the batch plan's
        # exact contents under disorder <= the declared delay
        wm_sec = state.getCurrentWatermarkMs() // 1000
        out_idx = []
        out_n = []
        out_s = []
        if p_us and min(p_us) // 1_000_000 < wm_sec:
            pn = [0]
            ps = [0]
            pq = [0]
            for a, b, c in zip(ns, sums, sqs):
                pn.append(pn[-1] + a)
                ps.append(ps[-1] + b)
                pq.append(pq[-1] + c)
            keep_ids, keep_us, keep_vals, keep_vis = [], [], [], []
            for j, (u, vi) in enumerate(zip(p_us, p_vis)):
                s_ = u // 1_000_000
                if s_ >= wm_sec:
                    keep_ids.append(p_ids[j])
                    keep_us.append(u)
                    keep_vals.append(p_vals[j])
                    keep_vis.append(vi)
                    continue
                lo = bisect.bisect_left(secs, s_ - (window_s - 1))
                hi = bisect.bisect_right(secs, s_)
                n = pn[hi] - pn[lo]
                ssum = ps[hi] - ps[lo]
                ssq = pq[hi] - pq[lo]
                d = n * vi - ssum
                if n >= min_n and 4 * d * d > 9 * (n * ssq - ssum * ssum):
                    out_idx.append(j)
                    out_n.append(n)
                    out_s.append(ssum)
            out_ids = [p_ids[j] for j in out_idx]
            out_us = [p_us[j] for j in out_idx]
            out_vals = [p_vals[j] for j in out_idx]
            p_ids, p_us, p_vals, p_vis = (
                keep_ids,
                keep_us,
                keep_vals,
                keep_vis,
            )
            horizon = wm_sec
        else:
            out_ids, out_us, out_vals = [], [], []
        # prune aggregate seconds no future verdict can reach: every
        # unemitted or future event has sec >= wm_sec (pending by the
        # keep rule above; arrivals by the watermark filter)
        cut = bisect.bisect_left(secs, wm_sec - (window_s - 1))
        if cut:
            secs, ns, sums, sqs = secs[cut:], ns[cut:], sums[cut:], sqs[cut:]
        if p_us:
            state.update(
                (secs, ns, sums, sqs, p_ids, p_us, p_vals, p_vis, horizon)
            )
            # wake when the watermark passes the oldest held second
            # (strictly greater than the current watermark: the held
            # minimum is >= wm_sec by the keep rule)
            state.setTimeoutTimestamp((min(p_us) // 1_000_000 + 1) * 1000)
        elif secs:
            state.update(
                (secs, ns, sums, sqs, p_ids, p_us, p_vals, p_vis, horizon)
            )
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "event_id": pd.array(out_ids, dtype="int64"),
                "event_type": [str(key[0])] * len(out_ids),
                "ts": pd.Series(out_us, dtype="int64").astype(
                    "datetime64[us]"
                ),
                "value": pd.array(out_vals, dtype="float64"),
                "n_window": pd.array(out_n, dtype="int64"),
                "_s": pd.array(out_s, dtype="int64"),
            }
        )

    return update


def anomaly_verdict_stream_delayed(
    events: DataFrame,
    delay: str = "60 seconds",
    window_s: int = 86400,
    min_n: int = 20,
) -> DataFrame:
    """Out-of-order-tolerant twin of :func:`anomaly_verdict_stream`
    (r13, r12 verdict item 4): verdicts are HELD per event and emitted
    only once the watermark passes the event's second -- at that point
    no event that could land in its trailing frame can still arrive
    (anything older than the watermark is filtered upstream by Spark),
    so every emitted verdict uses exactly the batch RANGE frame's
    contents. With ``delay`` >= the stream's true disorder bound the
    emitted set equals `value_anomalies` row-for-row under ANY arrival
    order -- the same exact-under-bounded-disorder contract funnel and
    retention already carry (pinned by the SHUFFLED-replay parity
    test). Under an insufficient delay the failure mode is Spark's
    standard late-data drop (observable as numRowsDroppedByWatermark
    in query progress), never a silently truncated window; the kernel
    additionally refuses loudly if an arrival ever lands below the
    emitted horizon (an engine-contract break, not mere lateness).

    Mechanics: aggregates fold commutatively on arrival (order never
    matters for the per-second maps); emission is watermark-gated;
    event-time timeouts re-wake each group when the watermark passes
    its oldest held second, so the tail flushes without new data for
    that key (Spark's no-data micro-batch). State per type is bounded
    by window_s + delay worth of distinct seconds plus delay worth of
    held events -- the price of disorder tolerance, linear in the
    declared bound, independent of stream length.

    Trade-off vs the ordered mode: verdicts lag arrival by up to
    ``delay`` (the fundamental latency/exactness trade -- a verdict
    emitted earlier could be flipped by a late in-window event), so
    the live dashboard keeps the knowledge-at-arrival mode and this
    mode serves the exactness-first deployment.

    Session-timezone constraint (checked loudly at plan time): Spark
    only watermarks TIMESTAMP, not TIMESTAMP_NTZ, so the watermark
    rides a cast twin of ``ts`` -- and the kernel's wall-clock second
    math (identical to the batch plan's floor(epoch)) equals the
    watermark's instant math only when the session timezone is a
    fixed-zero-offset zone. A non-UTC session would silently shift
    the gate by the zone offset; refuse instead."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    from datetime import datetime, timedelta
    from zoneinfo import ZoneInfo

    try:
        z = ZoneInfo(tz)
        offs = {z.utcoffset(datetime(2024, 1, 1)), z.utcoffset(datetime(2024, 7, 1))}
    except Exception:
        offs = None
    if offs != {timedelta(0)}:
        raise ValueError(
            "anomaly_verdict_stream_delayed requires a zero-offset "
            f"session timezone (spark.sql.session.timeZone={tz!r}): "
            "the watermark gate rides cast(ts as timestamp) and a "
            "nonzero offset would shift it against the batch plan's "
            "wall-clock seconds -- set the session timezone to UTC"
        )
    return (
        events.select("event_id", "event_type", "ts", "value")
        .withColumn("_wm_ts", F.col("ts").cast("timestamp"))
        .withWatermark("_wm_ts", delay)
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_anomaly_update_delayed(window_s, min_n),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=_ANOMALY_DELAYED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Unified product-analytics surface (r12, r11 verdict item 5): one
# event stream in, all three analytics changelogs out under one root
# ---------------------------------------------------------------------------

ANALYTICS_SURFACES = ("funnel", "retention", "anomalies")


def analytics_verdict_batches(
    events: DataFrame,
    out_root: str,
    checkpoint: str,
    window_hours: int = 24,
    anomaly_mode: str = "arrival",
    anomaly_delay: str = "60 seconds",
) -> list:
    """The product-analytics capstone: ONE event stream drives all
    three exact stateful operators (ordered funnel, cohort retention,
    trailing-day anomaly alerting), their changelogs landing under
    ONE output root (``out_root/{funnel,retention,anomalies}``) with
    a manifest row pinning the surface set and parameters -- the same
    single-surface guarantee `curation_verdict_batches` gives the
    corpus stream, so a dashboard consumes one directory tree, not
    three ad-hoc sinks. Finish with :func:`analytics_tables`.

    Why three coordinated queries and not one physical query: Spark
    refuses a union of stateful Pandas operators in a single
    streaming plan ("Multiple applyInPandasWithStates are not
    supported" -- verified on 4.1; the operators also key on
    different columns, so one keyed kernel cannot host them). The
    engine-model delta is the same class as the documented W3
    idleness note: the SURFACE is unified (one source definition, one
    root, one manifest, one parity test), the execution is N
    checkpointed queries, which at scale is what you want anyway --
    independent failure/recovery domains per operator with exactly
    the same source offsets semantics.

    Contract: the unified surface inherits the STRICTEST constituent
    contract. With the default knowledge-at-arrival anomaly mode that
    is anomaly's event-time-ordered arrival on whole-second
    micro-batch boundaries (post-horizon arrivals fail that query
    loudly); with ``anomaly_mode="delayed"`` the anomaly constituent
    becomes exact under bounded disorder like funnel and retention
    (which stay exact under ANY order), lifting the surface contract
    to exact-under-bounded-disorder at the price of verdict latency
    up to ``anomaly_delay``. Parity
    of all three finished tables against their batch counterparts
    (event_funnel / weekly_cohort_retention / value_anomalies) is
    pinned by ONE test over ONE shared replay:
    tests/test_streaming.py::test_streaming_analytics_surface_matches_batch.

    Returns the three StreamingQuery handles (availableNow triggers);
    await all before finishing."""
    if anomaly_mode not in ("arrival", "delayed"):
        # validate BEFORE the manifest write: an unknown mode must
        # refuse with zero side effects, not leave a root behind
        raise ValueError(
            f"analytics_verdict_batches: unknown anomaly_mode "
            f"{anomaly_mode!r} (expected 'arrival' or 'delayed')"
        )
    spark = events.sparkSession
    manifest = [
        (surface, int(window_hours)) for surface in ANALYTICS_SURFACES
    ]
    spark.createDataFrame(
        manifest, "surface string, window_hours int"
    ).coalesce(1).write.mode("overwrite").parquet(out_root + "/manifest")

    def start(df: DataFrame, surface: str):
        return (
            df.writeStream.format("parquet")
            .option("path", f"{out_root}/{surface}")
            .option("checkpointLocation", f"{checkpoint}/{surface}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    if anomaly_mode == "arrival":
        anomalies = anomaly_verdict_stream(events)
    else:
        anomalies = anomaly_verdict_stream_delayed(events, delay=anomaly_delay)
    return [
        start(funnel_state_stream(events, window_hours), "funnel"),
        start(retention_state_stream(events), "retention"),
        start(anomalies, "anomalies"),
    ]


def analytics_tables(spark, out_root: str) -> dict:
    """Finish a :func:`analytics_verdict_batches` root into the three
    dashboard tables, each in its batch counterpart's exact output
    shape: ``funnel`` (stage/event_type/n_users/conversion),
    ``retention`` (cohort_week/week_offset/n_active_users),
    ``anomalies`` (event_id/../n_window/window_mean). Refuses loudly
    on a root without the manifest or a missing surface directory --
    a partial tree means the capstone's single-surface contract was
    not honored (one of the three queries never ran). Changelog sinks
    are read with their explicit output schemas, so a legitimately
    empty changelog (e.g. no anomalies yet) finishes to an empty
    table instead of a schema-inference failure."""
    try:
        manifest = {
            r["surface"] for r in spark.read.parquet(out_root + "/manifest").collect()
        }
    except Exception as e:
        raise RuntimeError(
            f"analytics_tables: {out_root} has no readable manifest -- not "
            f"an analytics_verdict_batches root ({type(e).__name__}: {e})"
        ) from None
    if manifest != set(ANALYTICS_SURFACES):
        raise RuntimeError(
            f"analytics_tables: manifest surfaces {sorted(manifest)} != "
            f"{sorted(ANALYTICS_SURFACES)}"
        )

    def read(surface: str, schema):
        # "surface missing -- its query never ran" is only the right
        # diagnosis when the directory is absent; a corrupt parquet
        # file or a permission error under an EXISTING directory must
        # surface as itself, traceback chained (r12 ADVICE).
        path = f"{out_root}/{surface}"
        if not os.path.isdir(path):
            raise RuntimeError(
                f"analytics_tables: surface '{surface}' missing under "
                f"{out_root} -- its query never ran"
            )
        try:
            return spark.read.schema(schema).parquet(path)
        except Exception as e:
            raise RuntimeError(
                f"analytics_tables: surface '{surface}' exists under "
                f"{out_root} but is unreadable ({type(e).__name__}: {e})"
            ) from e

    return {
        "funnel": funnel_counts(
            funnel_latest(read("funnel", FUNNEL_OUTPUT_SCHEMA))
        ),
        "retention": retention_triangle(
            retention_latest(read("retention", RETENTION_OUTPUT_SCHEMA))
        ),
        "anomalies": anomaly_table(read("anomalies", ANOMALY_OUTPUT_SCHEMA)),
    }
