#!/usr/bin/env python3
"""Z-order read-path probe (VERDICT r7 #6): write sf0.1 lineitem twice —
z-ordered on (l_orderkey, l_suppkey) and plain-sorted on l_orderkey (the
control every warehouse already has) — then read each with a selective
predicate on the SECOND clustered column and record:

- footer-prunable files: how many of the written files a parquet reader
  must touch, straight from the real footer min/max stats (the exact
  math scan-side pruning does);
- prunable row-groups, same stats one level down;
- Spark wall-clock for the filtered aggregate on each layout.

A plain sort clusters only its leading column, so an l_suppkey predicate
touches every file; the z-order interleave gives BOTH columns narrow
per-file spans, so most files drop out. Numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as papq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/zorder_probe_r08"


def footer_stats(path: str, col: str):
    """[(n_row_groups, [(min,max), ...])] per file."""
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = papq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(col)
        spans = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
        out.append(spans)
    return out


def prunable(spans_per_file, lo, hi):
    files_hit = rgs_hit = files_total = rgs_total = 0
    for spans in spans_per_file:
        files_total += 1
        hit_file = False
        for mn, mx in spans:
            rgs_total += 1
            if not (mx < lo or mn > hi):
                rgs_hit += 1
                hit_file = True
        files_hit += hit_file
    return {
        "files_read": files_hit, "files_total": files_total,
        "row_groups_read": rgs_hit, "row_groups_total": rgs_total,
    }


def main() -> None:
    from pyspark.sql import functions as F

    from crossbar_data_process_spark import get_spark
    from crossbar_data_process_spark.sources.writers import write_zordered

    spark = get_spark(app_name="zorder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")

    zpath, spath = f"{OUT}/zorder", f"{OUT}/sorted"
    write_zordered(li, zpath, ["l_orderkey", "l_suppkey"], target_files=32)
    (
        li.repartitionByRange(32, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # selective predicate on the SECOND clustered column: a 2%-wide
    # l_suppkey band (fixed, not corpus-derived)
    lo, hi = 100, 119
    report = {}
    for label, path in (("zorder", zpath), ("plain_sort", spath)):
        report[label] = prunable(footer_stats(path, "l_suppkey"), lo, hi)
        t0 = time.perf_counter()
        n = (
            spark.read.parquet(path)
            .filter(F.col("l_suppkey").between(lo, hi))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
            .collect()[0]["n"]
        )
        report[label]["rows_matched"] = int(n)
        report[label]["spark_sec"] = round(time.perf_counter() - t0, 3)
    # sanity: identical result set on both layouts
    assert report["zorder"]["rows_matched"] == report["plain_sort"]["rows_matched"]
    print(json.dumps({"metric": "zorder_read_probe", "predicate":
                      f"l_suppkey BETWEEN {lo} AND {hi}", **report}))
    spark.stop()


if __name__ == "__main__":
    main()
