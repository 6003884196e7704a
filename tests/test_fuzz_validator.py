"""Property-fuzz validator parity: hypothesis-generated dirty records
through Spark validate_enrich vs the DuckDB SILVER fragment.

The fixed dirt lattice in tables.bronze_radiation enumerates each
rejection reason once per modulus; this fuzz closes the combination
gap -- random field drops, garbage numerics, boundary coords at
exactly +/-90 / +/-180 and one cent past, .5 values that exercise
HALF_EVEN integer rounding, and every timestamp suffix variant, in
arbitrary combinations per record.

Generator contract (same as the bronze generator, documented in
plans/fragments.py): numeric strings carry <= 2 decimals and
magnitudes < 1e6. Outside that envelope the two engines' double
FORMATTING (not their math) legitimately diverges -- Java's
Double.toString switches to scientific notation at 1e7 where DuckDB
does not -- which is a string-repr policy, not a validator bug.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_streaming_dashboard_spark.operators.validate import validate_enrich
from big_data_streaming_dashboard_spark.plans.fragments import silver_sql_over

from .conftest import compare_spark_duck

_BRONZE_SCHEMA = (
    "event_id long, captured_time string, latitude string, "
    "longitude string, value string, unit string, ingestion_timestamp long"
)

# timestamp bases are well-formed; suffix variants exercise the P4
# normalization (strip fractional / tz) identically in both engines
_ts_base = st.datetimes(
    min_value=pd.Timestamp("2000-01-01").to_pydatetime(),
    max_value=pd.Timestamp("2035-12-31").to_pydatetime(),
).map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S"))

_captured_time = st.one_of(
    st.none(),
    st.just("not-a-time"),
    st.just(""),
    st.just("2024-99-99 99:99:99"),  # shape-valid, semantically garbage
    _ts_base,
    _ts_base.map(lambda s: s + "Z"),
    _ts_base.map(lambda s: s + "+09:00"),
    _ts_base.map(lambda s: s + "+00:00"),
    _ts_base.map(lambda s: s + ".123"),
    _ts_base.map(lambda s: s + ".5"),
)

# coords: exact boundaries, one-cent-past boundaries, in-range, garbage
_coord_num = st.one_of(
    st.just("-90.00"),
    st.just("90.00"),
    st.just("-90.01"),
    st.just("90.01"),
    st.just("-180.00"),
    st.just("180.00"),
    st.just("-180.01"),
    st.just("180.01"),
    st.just("0.00"),
    st.integers(-20000, 20000).map(lambda c: f"{c / 100.0:.2f}"),
)
_coord = st.one_of(
    st.none(), st.just("abc"), st.just(""), st.just("12,5"), _coord_num
)

# values: .5 ties (exact in binary -> HALF_EVEN in both engines),
# zero/negative rejects, garbage, scientific notation, in-range
_value = st.one_of(
    st.none(),
    st.just("oops"),
    st.just(""),
    st.just("0"),
    st.just("0.00"),
    st.just("0.50"),
    st.just("1.50"),
    st.just("2.50"),
    st.just("3.50"),
    st.just("-12.25"),
    st.just("1e3"),
    st.integers(-99999, 99999999).map(lambda c: f"{c / 100.0:.2f}"),
)

_unit = st.one_of(
    st.none(),
    st.sampled_from(["cpm", "CPM", "Cpm", "cPm", "usv", "uSv", "", " cpm"]),
)

_record = st.tuples(
    _captured_time,
    _coord,
    _coord,
    _value,
    _unit,
    st.integers(1_500_000_000_000, 1_900_000_000_000),  # ingestion epoch ms
)

_batch = st.lists(_record, min_size=40, max_size=120)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(batch=_batch)
def test_validator_parity_on_fuzzed_records(spark, batch):
    rows = [
        (i, ct, lat, lon, val, unit, ing)
        for i, (ct, lat, lon, val, unit, ing) in enumerate(batch)
    ]
    sdf = spark.createDataFrame(rows, _BRONZE_SCHEMA)
    silver = validate_enrich(sdf)

    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(
            rows,
            columns=[
                "event_id",
                "captured_time",
                "latitude",
                "longitude",
                "value",
                "unit",
                "ingestion_timestamp",
            ],
        ).astype(
            {
                "event_id": "int64",
                "ingestion_timestamp": "int64",
                "captured_time": "object",
                "latitude": "object",
                "longitude": "object",
                "value": "object",
                "unit": "object",
            }
        )
        con.register("fuzz_bronze", pdf)
        ok, msg = compare_spark_duck(
            silver, con, silver_sql_over("SELECT * FROM fuzz_bronze")
        )
        assert ok, msg
    finally:
        con.close()


def test_validator_parity_worst_case_lattice(spark):
    """Deterministic cross-product of the nastiest per-field values --
    a fixed floor under the randomized fuzz (hypothesis shrinks, this
    never moves)."""
    cts = [None, "not-a-time", "2024-06-01 10:00:00Z", "2024-06-01 10:00:00.5"]
    coords = [None, "abc", "-90.00", "90.01"]
    vals = [None, "0.50", "-12.25", "2.50"]
    units = [None, "CPM", "usv", "cpm"]
    rows = []
    i = 0
    for ct in cts:
        for lat in coords:
            for lon in coords:
                for v in vals:
                    for u in units:
                        rows.append((i, ct, lat, lon, v, u, 1_700_000_000_000))
                        i += 1
    sdf = spark.createDataFrame(rows, _BRONZE_SCHEMA)
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(
            rows,
            columns=[
                "event_id",
                "captured_time",
                "latitude",
                "longitude",
                "value",
                "unit",
                "ingestion_timestamp",
            ],
        )
        con.register("fuzz_bronze", pdf)
        ok, msg = compare_spark_duck(
            validate_enrich(sdf), con, silver_sql_over("SELECT * FROM fuzz_bronze")
        )
        assert ok, msg
    finally:
        con.close()


def test_silver_sql_over_substitutes():
    sql = silver_sql_over("SELECT * FROM fuzz_bronze")
    assert "fuzz_bronze" in sql and "FROM events" not in sql
