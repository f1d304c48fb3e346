"""Per-query optimization instrument (round 13).

    python scripts/profile_query.py [--plans DIR --tag before] q_a q_b ...

For each named query: best-of-N wall time through the same noop-sink
methodology as bench.py, plus a plan-shape summary (Exchange count, join
strategies, Python-eval nodes, PushedFilters presence).  With --plans DIR
the full ``explain("formatted")`` text of the EXECUTED (AQE-final) plan is
written to DIR/<name>_<tag>.txt — the committed evidence for plan-diff
claims in OPTIMIZATION_r13.md.

Isolated runs only: the full-suite bench interleaves 331 queries on a
co-tenant host, which inflates small queries 2-3x at suite tail (measured
round 13); before/after numbers for a single optimization must come from
this script, not from two full-suite runs.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> str:
    # the formatted explain numbers every physical operator "(n) Name";
    # count those lines, not free-text mentions (window specs etc.)
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)
    interesting = (
        "Exchange",
        "BroadcastExchange",
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "BatchEvalPython",
        "ArrowEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "PythonMapInArrow",
        "Window",
        "WindowGroupLimit",
        "Sort",
        "AQEShuffleRead",
        "Scan",
    )
    counts = {k: ops.count(k) for k in interesting}
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data_pipeline_cursor_spark.registry import get_queries
    from data_pipeline_cursor_spark.session import get_spark

    spark = get_spark("profile")
    queries = get_queries()
    # same warm-up as bench.py so first-query numbers are comparable
    from data_pipeline_cursor_spark.sources.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, args.sf, name).write.format("noop").mode("overwrite").save()

    for name in args.names:
        if name not in queries:
            print(f"{name}: UNKNOWN")
            continue
        fn = queries[name]
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        # executed plan of the final build (collect finalizes AQE on THIS
        # DataFrame's QueryExecution; cheap at fixture scale)
        df = fn(spark, args.sf)
        df.collect()
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            # private PySpark internals (_jdf / _jvm ExplainMode) shift
            # across versions — fall back to the public explain capture so
            # the timing half keeps working (round-13 ADVICE)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        print(f"{name}: best={best:.3f}s  [{plan_summary(plan)}]")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)


if __name__ == "__main__":
    main()
