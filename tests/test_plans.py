"""Physical-plan regression tests: the plan SHAPES the engine's scale
story depends on (PLANS.md evidence), pinned so they cannot silently
regress -- pushdown reaching the scan, pruned ReadSchema, top-k as
TakeOrderedAndProject, multi-distinct via Expand, no Python stage in
JVM-only operators."""

from __future__ import annotations

from .conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_promo_q14_pushdown_and_projected_part(spark):
    from big_data_streaming_dashboard_spark.plans.relational3 import (
        promo_revenue_share,
    )

    p = _plan(promo_revenue_share(spark, SF_ORACLE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p  # date at the scan
    # part scan pruned to the 2 columns the join needs
    assert "ReadSchema: struct<p_partkey:bigint,p_type:string>" in p


def test_returned_q10_takeordered_and_pushed_flag(spark):
    from big_data_streaming_dashboard_spark.plans.relational3 import (
        returned_top_customers,
    )

    p = _plan(returned_top_customers(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in p  # per-partition heaps, no sort
    assert "EqualTo(l_returnflag,R)" in p  # filter at the fact scan


def test_brand_q16_expand_two_phase_distinct(spark):
    from big_data_streaming_dashboard_spark.plans.relational3 import (
        brand_supplier_variety,
    )

    p = _plan(brand_supplier_variety(spark, SF_ORACLE))
    assert "Expand" in p  # multi-count-distinct partial de-dup shape


def test_pricing_summary_scan_pruning(spark):
    from big_data_streaming_dashboard_spark.plans.relational import (
        pricing_summary,
    )

    p = _plan(pricing_summary(spark, SF_ORACLE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # 7-of-11 column projection reaches the parquet scan (the dump
    # truncates long schemas -- assert the untruncated prefix and the
    # absence of a pruned-away column)
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double" in p
    )
    assert "l_orderkey" not in p.split("ReadSchema", 1)[1][:200]


def test_revenue_star_broadcasts_dims_only(spark):
    from big_data_streaming_dashboard_spark.plans.relational import (
        revenue_by_nation,
    )

    p = _plan(revenue_by_nation(spark, SF_ORACLE))
    # O(100)-row dims broadcast; the fact join is NOT a broadcast of a
    # fact-sized side (nation/region appear under BroadcastExchange)
    assert p.count("BroadcastExchange") >= 2
    assert "nation" in p and "region" in p


def test_jvm_only_operators_have_no_python_stage(spark):
    """chunk_spans, domain_cap, audio_windows and frame_sample are
    declared JVM-only (docstrings say no Python stage) -- pin it: no
    Arrow/Python eval nodes in their plans."""
    from big_data_streaming_dashboard_spark.llmdata.multimodal import (
        audio_windows,
        frame_sample,
        synthetic_media,
    )
    from big_data_streaming_dashboard_spark.llmdata.text import chunk_spans
    from big_data_streaming_dashboard_spark.plans.registry import _docs
    from big_data_streaming_dashboard_spark.plans.relational3 import domain_cap

    docs = _docs(spark, SF_ORACLE)
    media = synthetic_media(spark, n=6)
    for df in (
        chunk_spans(docs),
        domain_cap(docs),
        audio_windows(media),
        frame_sample(media),
    ):
        p = _plan(df)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
        assert "MapInPandas" not in p


def test_recent_points_takeordered(spark):
    """W8 recency retention compiles to TakeOrderedAndProject (the
    serving cap shape), not a global Sort."""
    from big_data_streaming_dashboard_spark.plans.registry import (
        _points,
        q_recent_points,
    )

    _points(spark, SF_ORACLE)  # warm shared stage
    p = _plan(q_recent_points(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in p


def test_vocab_coverage_takeordered_before_window(spark):
    """The vocab head is bounded by TakeOrderedAndProject BEFORE the
    cumulative window -- never a single-partition window over the full
    vocabulary."""
    from big_data_streaming_dashboard_spark.llmdata.text import vocab_coverage
    from big_data_streaming_dashboard_spark.plans.registry import _docs

    p = _plan(vocab_coverage(_docs(spark, SF_ORACLE)))
    assert "TakeOrderedAndProject" in p
    # the window input is the k-row head, so its sort is trivial; the
    # full-vocab relation reaches only the count aggregate
    assert p.index("TakeOrderedAndProject") > p.index("Window")


def test_bench_lists_fail_fast_on_dangling_names():
    """bench.py's HEADLINE/EXTRA/TENX lists carry the same
    import-time guard as registry.DRIVER_WINDOW: a dangling name dies
    at module load, never mid-way through the driver's bench run (the
    r9 failure class). Positive: the real module imports. Negative: a
    tampered copy with an unknown name raises at exec."""
    import sys
    import types

    sys.path.insert(0, "/root/repo")
    import bench  # noqa: F401  (positive: import succeeds)

    src = open("/root/repo/bench.py").read().replace(
        "TENX = [", 'TENX = [\n    "no_such_query",', 1
    )
    mod = types.ModuleType("bench_tampered")
    mod.__file__ = "/root/repo/bench.py"
    try:
        exec(compile(src, "bench.py", "exec"), mod.__dict__)
        raise AssertionError("dangling TENX name did not fail at load")
    except RuntimeError as e:
        assert "no_such_query" in str(e)

    # r12 (r11 ADVICE): a TENX_REPS key whose query is renamed or
    # rotated out of TENX would silently lose its rep override -- the
    # cold/warm comparability the reps exist for. Same fail-at-import.
    src = open("/root/repo/bench.py").read().replace(
        '"doc_ngram_jaccard",\n', "", 1
    )
    assert 'doc_ngram_jaccard": 2' in src  # still a TENX_REPS key
    mod = types.ModuleType("bench_tampered2")
    mod.__file__ = "/root/repo/bench.py"
    try:
        exec(compile(src, "bench.py", "exec"), mod.__dict__)
        raise AssertionError("orphan TENX_REPS key did not fail at load")
    except RuntimeError as e:
        assert "doc_ngram_jaccard" in str(e)
