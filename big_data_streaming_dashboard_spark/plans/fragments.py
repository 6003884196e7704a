"""ANSI-SQL (DuckDB) fragments mirroring the engine's operators.

Each fragment is a CTE body kept in LOCK-STEP with the corresponding
Spark implementation:

- ``BRONZE_SQL``  <-> tables.bronze_radiation
- ``SILVER_SQL``  <-> operators.validate.validate_enrich
                      (+ functions.keys.dedup_key, functions.levels,
                       functions.timeparse)

Cross-engine parity rules baked in (verified by tests/test_oracle.py):
- Python/Spark ``bround`` (HALF_EVEN)  <->  DuckDB ``round_even``
- Spark ``format_string('%.2f', x)``   <->  DuckDB ``printf('%.2f', x)``
  (both round the exact binary value; exact ties are impossible for our
  two-decimal inputs; negative zero normalized at the generator)
- Spark ``try_to_timestamp(s, 'yyyy-MM-dd HH:mm:ss')``
                                        <-> ``try_strptime(s, '%Y-%m-%d %H:%M:%S')``
- Spark ``regexp_replace`` replaces all matches -> DuckDB needs the 'g' flag
- Spark ``unix_timestamp(ts)`` truncates -> ``floor(epoch(ts))``
- double sums are order-dependent -> SUM over DECIMAL(38,6) casts in
  BOTH engines, result cast back to double
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# bronze: radiation-analog derivation from `events` (tables.bronze_radiation)
# ---------------------------------------------------------------------------

BRONZE_SQL = """
SELECT
    event_id,
    CASE
        WHEN event_id % 401 = 0 THEN NULL
        WHEN event_id % 997 = 0 THEN 'not-a-time'
        WHEN event_id % 13 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || '+09:00'
        WHEN event_id % 17 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || 'Z'
        WHEN event_id % 19 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || '.123'
        ELSE strftime(ts, '%Y-%m-%d %H:%M:%S')
    END AS captured_time,
    CASE
        WHEN event_id % 211 = 0 THEN 'abc'
        WHEN event_id % 103 = 0 THEN printf('%.2f', (CAST((user_id * 37 + event_id) % 18000 AS DOUBLE) / 100.0) - 90.0 + 200.0)
        ELSE printf('%.2f', (CAST((user_id * 37 + event_id) % 18000 AS DOUBLE) / 100.0) - 90.0)
    END AS latitude,
    CASE
        WHEN event_id % 223 = 0 THEN ''
        WHEN event_id % 113 = 0 THEN printf('%.2f', (CAST((user_id * 73 + event_id * 7) % 36000 AS DOUBLE) / 100.0) - 180.0 + 400.0)
        ELSE printf('%.2f', (CAST((user_id * 73 + event_id * 7) % 36000 AS DOUBLE) / 100.0) - 180.0)
    END AS longitude,
    CASE
        WHEN event_id % 227 = 0 THEN 'oops'
        WHEN event_id % 107 = 0 THEN printf('%.2f', 0.0 - (value * 4.0))
        WHEN event_id % 109 = 0 THEN '0'
        ELSE printf('%.2f', value * 4.0)
    END AS value,
    CASE
        WHEN event_id % 101 = 0 THEN 'usv'
        WHEN event_id % 97 = 0 THEN 'CPM'
        ELSE 'cpm'
    END AS unit,
    CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS ingestion_timestamp
FROM events
"""

# ---------------------------------------------------------------------------
# silver: validate + enrich (operators/validate.py::validate_enrich)
# ---------------------------------------------------------------------------
# `_typed` holds the shared try_cast/round subexpressions; `silver` applies
# the validator CASE chain in the reference's check order
# (flink_process/flink_process.py:105-176).

def silver_sql_over(bronze_sql: str) -> str:
    """SILVER over an arbitrary bronze relation (property-fuzz tests
    feed generated dirty records instead of the events derivation)."""
    return SILVER_SQL.replace(BRONZE_SQL, bronze_sql)


SILVER_SQL = f"""
WITH bronze AS ({BRONZE_SQL}),
typed AS (
    SELECT
        *,
        TRY_CAST(latitude AS DOUBLE) AS lat_d,
        TRY_CAST(longitude AS DOUBLE) AS lon_d,
        TRY_CAST(value AS DOUBLE) AS val_d,
        CAST(round_even(TRY_CAST(value AS DOUBLE), 0) AS BIGINT) AS rval
    FROM bronze
),
flagged AS (
    SELECT
        *,
        CASE
            WHEN captured_time IS NULL OR latitude IS NULL OR longitude IS NULL
                 OR value IS NULL OR unit IS NULL THEN 'Missing fields'
            WHEN lat_d IS NULL OR lon_d IS NULL OR val_d IS NULL THEN 'Invalid numeric values'
            WHEN lat_d < -90 OR lat_d > 90 THEN 'Invalid latitude: ' || CAST(lat_d AS VARCHAR)
            WHEN lon_d < -180 OR lon_d > 180 THEN 'Invalid longitude: ' || CAST(lon_d AS VARCHAR)
            WHEN rval <= 0 THEN 'Invalid radiation value: ' || CAST(rval AS VARCHAR)
            WHEN lower(unit) <> 'cpm' THEN 'Invalid unit: ' || unit
            ELSE NULL
        END AS error
    FROM typed
)
SELECT
    event_id,
    ingestion_timestamp,
    CASE WHEN error IS NULL THEN 'valid' ELSE 'invalid' END AS status,
    error,
    CASE WHEN error IS NULL THEN captured_time END AS timestamp,
    CASE WHEN error IS NULL THEN
        try_strptime(regexp_replace(captured_time, '(\\.\\d*)|(\\+.*$)|(Z$)', '', 'g'),
                     '%Y-%m-%d %H:%M:%S')
    END AS event_time,
    CASE WHEN error IS NULL THEN round_even(lat_d, 5) END AS lat,
    CASE WHEN error IS NULL THEN round_even(lon_d, 5) END AS lon,
    CASE WHEN error IS NULL THEN rval END AS value,
    CASE WHEN error IS NULL THEN 'cpm' END AS unit,
    CASE WHEN error IS NULL THEN
        CASE WHEN rval < 50 THEN 'low' WHEN rval < 200 THEN 'moderate' ELSE 'high' END
    END AS level,
    CASE WHEN error IS NULL THEN
        CASE WHEN rval >= 1000 THEN 'very-high' WHEN rval >= 200 THEN 'high'
             WHEN rval >= 50 THEN 'moderate' WHEN rval >= 10 THEN 'low'
             ELSE 'very-low' END
    END AS level5,
    CASE WHEN error IS NULL THEN rval >= 1000.0 END AS critical,
    CASE WHEN lat_d IS NOT NULL AND lon_d IS NOT NULL AND val_d IS NOT NULL THEN
        concat_ws('|',
            CAST(round_even(lat_d, 5) AS VARCHAR),
            CAST(round_even(lon_d, 5) AS VARCHAR),
            CAST(round_even(val_d, 2) AS VARCHAR),
            coalesce(captured_time, ''),
            coalesce(unit, ''))
    ELSE 'invalid_key' END AS dedup_key,
    CASE WHEN error IS NOT NULL THEN
        concat_ws('|',
            coalesce(captured_time, ''), coalesce(latitude, ''),
            coalesce(longitude, ''), coalesce(value, ''), coalesce(unit, ''))
    END AS raw_data
FROM flagged
"""

# routed silver (operators/route.py)
ROUTED_SQL = f"""
WITH silver AS ({SILVER_SQL})
SELECT *,
    CASE WHEN status = 'invalid' THEN 'dirty'
         WHEN critical THEN 'critical'
         ELSE 'normal' END AS route
FROM silver
"""
