#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop writer (forces full
computation of every column; a bare count() would let Catalyst prune
the projections we are trying to measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_streaming_dashboard_spark.plans import queries_dict
from big_data_streaming_dashboard_spark.session import get_spark

HEADLINE = [
    "full_pipeline",
    "silver_validate",
    "dedup_first_occurrence",
    "temporal_batch_annotate",
    "route_counts",
    "rolling_stats",
    "grid_cluster",
    "recent_points",
    "alerts_cooldown",
    "flagship_event_stats",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "user_sessions",
    "asof_latest_order",
    "events_by_hour",
    "doc_token_stats",
    "doc_minhash_signature",
    "doc_neardup_pairs",
    "emb_topk_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # machine state at start: a loaded box inflates every number (the
    # r2 lesson -- see STATE.md's contention A/B); recording the load
    # makes a contaminated run self-evident in the archived JSON
    load1, load5, _ = os.getloadavg()
    spark = get_spark(app_name="bench")
    # warm the JVM/codegen once so per-query numbers measure the plans
    spark.range(1000).selectExpr("sum(id)").collect()

    # min of 3 runs per query: the first run includes JIT/codegen warmup
    # and cache materialization; the min is the steady-state number and
    # is far less sensitive to machine noise. Each rep is split into
    # plan construction (the py4j/Catalyst cost of building the
    # DataFrame -- real, per the r3 advice that dropped memoization)
    # and execution (noop write forces every column); the headline
    # number stays plan+exec, the split makes accounting-only deltas
    # between rounds self-explaining (r4 verdict item 5).
    timings: dict[str, float] = {}
    plan_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    fns = queries_dict()
    for name in HEADLINE:
        fn = fns[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if t2 - t0 < best:
                best = t2 - t0
                plan_s[name] = round(t1 - t0, 4)
                exec_s[name] = round(t2 - t1, 4)
        timings[name] = round(best, 4)

    # round-5 additions, timed OUTSIDE the headline total so r1-r5
    # totals stay comparable; min-of-2 (these are secondary signals)
    extra = {}
    for name in (
        "promo_revenue_share",
        "returned_top_customers",
        "brand_supplier_variety",
        "doc_domain_cap",
        "emb_label_centroids",
        "doc_chunk_spans",
        "doc_normalize",
        "activity_reconcile",
        "doc_containment_pairs",
        "doc_gopher_rules",
        "doc_dedupe_lines",
        "doc_vocab_coverage",
    ):
        fn = fns[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        extra[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "plan_s": plan_s,
                "exec_s": exec_s,
                "extra_queries": extra,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_avg_at_start": [round(load1, 2), round(load5, 2)],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
