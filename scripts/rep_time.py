#!/usr/bin/env python3
"""Repeat one bench query N times in ONE session and print each wall +
the median of runs 2..N (warm-JVM measurement for A/B decisions; the
bench's own cold-first-run methodology is unchanged). Queries use
pid-scoped /tmp dirs, so repeats are self-contained.

Usage: python scripts/rep_time.py q73_semantic_dedup_ingest [n] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crossbar_data_process_spark import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name=f"rep_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    from crossbar_data_process_spark.plans.queries import QUERIES

    QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()
    walls = []
    for i in range(n):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
    warm = walls[1:] or walls
    print(
        f"{name}: runs {walls}  warm-median {statistics.median(warm):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
