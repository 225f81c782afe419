#!/usr/bin/env python3
"""Capture `.explain("formatted")` for every bench query into
plans/r16/<query>_<tag>.txt (the optimization round's before/after plan
evidence). Usage: python scripts/capture_plans.py before [q73 q64 ...]

Plans are captured at the bench scale ($SPARK_GRAFT_SF_DIR, default
sf0.1) through the same session factory bench.py uses. For the
streaming/foreachBatch rows the printed plan is the final read (their
work runs eagerly during query construction — PLANS.md note); the plan
file still pins scan pushdown and the probe-side shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crossbar_data_process_spark import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    from crossbar_data_process_spark.plans.queries import (
        BENCH_QUERIES,
        QUERIES,
    )

    names = sys.argv[2:] or list(BENCH_QUERIES)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines")
    spark.stop()


if __name__ == "__main__":
    main()
