from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_streaming_dashboard_spark.session import get_spark
from big_data_streaming_dashboard_spark.tables import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (timestamps -> isoformat, floats -> repr), sort rows.

    Type-preserving on purpose: int `44`, float `44.0`, and Decimal
    `44` all canonicalize DIFFERENTLY. The r2 driver flagged
    `doc_shard_packing` because DuckDB's windowed SUM(BIGINT) returns
    HUGEINT where Spark returns BIGINT; the old fetchall()-based
    comparison collapsed both to Python int and passed locally. The
    local harness must fail exactly where the driver fails."""
    import datetime
    import decimal
    import math

    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "\x00"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, decimal.Decimal):
            return f"dec:{v}"
        if isinstance(v, datetime.datetime):
            return v.isoformat(sep=" ")
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def compare_spark_duck(spark_df, duck_con, sql, limit_diff=8):
    """Replicates the driver's check: row count + sorted-column value
    multiset equality. Returns (ok, message).

    DuckDB results are fetched through Arrow, not fetchall():
    fetchall() coerces HUGEINT to Python int (masking engine type
    drift the driver detects), while Arrow keeps HUGEINT as
    decimal128 the way the driver's materialization does."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [
        tuple(row[c] for c in d_cols) for row in res.arrow().to_pylist()
    ]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [
            f"  spark={a}\n   duck={b}" for a, b in zip(sn, dn) if a != b
        ][:limit_diff]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
