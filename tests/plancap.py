"""Plan-capture + per-exchange metrics harness (r18 optimization round).

Two entry points:

* ``python -m tests.plancap dump <out_dir> <suffix> <query ...>`` --
  write ``<out_dir>/<query>_<suffix>.txt`` with the FORMATTED explain
  of each named registry query at $SPARK_GRAFT_SF_DIR (plan only; no
  action beyond what plan construction itself runs).

* ``python -m tests.plancap exchanges <query> [sf_dir]`` -- execute the
  query once with the noop sink, then walk the EXECUTED plan and print
  every Exchange/Scan/Join node with its key metrics (shuffle bytes
  written, rows, data size) so the byte budget per exchange is
  attributable (guide section 1: measure first; section 2.3: shuffle
  fewer bytes).

Uses the same session factory as bench.py so plans match the benched
ones.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_streaming_dashboard_spark.plans import queries_dict
from big_data_streaming_dashboard_spark.session import get_spark


def _explain_formatted(df) -> str:
    jdf = df._jdf
    qe = jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def dump(out_dir: str, suffix: str, names: list[str], sf_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="plancap",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    fns = queries_dict()
    for name in names:
        df = fns[name](spark, sf_dir)
        text = _explain_formatted(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


_METRIC_KEYS = (
    "shuffle bytes written",
    "shuffle records written",
    "records read",
    "number of output rows",
    "data size",
    "spill size",
    "number of files read",
    "size of files read",
)


def _walk(node, depth, lines):
    name = node.nodeName()
    interesting = (
        "Exchange" in name
        or "Scan" in name
        or "Join" in name
        or "Aggregate" in name
        or "Sort" == name.strip()
        or "Window" in name
        or "Generate" in name
    )
    if interesting:
        all_metrics = "Exchange" in name or "Scan" in name
        mets = []
        mit = node.metrics().iterator()
        while mit.hasNext():
            t = mit.next()
            key, m = t._1(), t._2()
            if all_metrics or key in ("numOutputRows", "spillSize", "dataSize"):
                mets.append(f"{key}={m.value()}")
        lines.append("  " * depth + f"{name}: " + ", ".join(sorted(mets)))
    it = node.children().iterator()
    while it.hasNext():
        _walk(it.next(), depth + 1, lines)
    # adaptive plans hide the executed tree behind QueryStageExec /
    # AdaptiveSparkPlanExec boundaries
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), depth + 1, lines)
    elif cls.endswith("QueryStageExec"):
        _walk(node.plan(), depth + 1, lines)
    elif cls in ("InMemoryTableScanExec",):
        pass


def exchanges(name: str, sf_dir: str) -> None:
    import time

    spark = get_spark(
        app_name="plancap-exchanges",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    fns = queries_dict()
    t0 = time.perf_counter()
    df = fns[name](spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(f"{name}: plan {t1 - t0:.2f}s exec {t2 - t1:.2f}s")
    # the noop write runs its own QueryExecution; re-execute the SAME
    # QE so the walked plan carries the metrics (verify-skill gotcha)
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    lines: list[str] = []
    _walk(qe.executedPlan(), 0, lines)
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if sys.argv[1] == "dump":
        dump(sys.argv[2], sys.argv[3], sys.argv[4:], sf)
    elif sys.argv[1] == "exchanges":
        exchanges(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else sf)
