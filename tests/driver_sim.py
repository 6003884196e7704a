"""Plain-session driver simulation: run the committed DRIVER_WINDOW
end-to-end the way the driver's correctness harness does -- a DEFAULT
SparkSession (none of the package session factory's configs, so a
query depending on a test-session conf fails HERE, not in the driver
run), sf0.01 parquet, DuckDB oracles, the same row-count/schema/
value-hash comparison (`tests.conftest.compare_spark_duck`).

Run it before committing a window swap (the r13/r14 ritual)::

    python -m tests.driver_sim

Exit code 0 iff every window entry is green. Not a pytest test: the
full window takes minutes and test_oracle already covers every
oracle pair per suite run under the package session -- this exists
for the plain-session + exact-window-order gate only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from big_data_streaming_dashboard_spark.plans import (
        oracle_sql_dict,
        queries_dict,
    )
    from big_data_streaming_dashboard_spark.plans.registry import DRIVER_WINDOW
    from big_data_streaming_dashboard_spark.tables import TABLE_NAMES
    from tests.conftest import compare_spark_duck

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    qs, oq = queries_dict(), oracle_sql_dict()
    fails: list[str] = []
    # the driver's t1 smoke gate first: entry() on the plain session
    # must load sf0.001 and return rows with a stable schema (r18 --
    # the sim covered only the t2 window sweep before)
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "__spark_entry__",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__spark_entry__.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        smoke = mod.entry(spark)
        n = smoke.count()
        print(f"OK  entry() smoke ({n} rows, {smoke.schema.simpleString()[:80]})")
        if n < 0:
            fails.append("entry")
    except Exception as ex:  # noqa: BLE001
        print(f"FAIL entry() smoke -- {type(ex).__name__}: {ex}")
        fails.append("entry")
    for name in DRIVER_WINDOW:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oq:
                ok, msg = compare_spark_duck(df, con, oq[name])
            else:
                ok, msg = df.count() >= 0, "rows-only"
        except Exception as ex:  # noqa: BLE001 -- report, keep sweeping
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        print(
            f"{'OK ' if ok else 'FAIL'} {name} ({time.time() - t0:.1f}s)"
            + ("" if ok else f" -- {msg[:300]}"),
            flush=True,
        )
        if not ok:
            fails.append(name)
    print(f"SUMMARY: {len(DRIVER_WINDOW) - len(fails)}/{len(DRIVER_WINDOW)} ok; fails={fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
