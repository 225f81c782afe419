#!/usr/bin/env python3
"""BM25 index compaction probe (r14, VERDICT r13 #3): land N daily-style
ingest batches into the persisted BM25 silver, then measure what the
tf/dl bin-pack compaction actually buys — parquet file count under tf/
(the probe-time listing + footer-open cost, which scales with file count,
not bytes), probe wall before/after on an identical fixed workload, and
a bit-identical ranking check (compaction must be invisible to
``bm25_topk_indexed`` except in I/O shape).

Run: python scripts/bm25_compact_probe.py [--batches N] [--batch-rows M]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = "/tmp/bm25_compact_probe_r14"


def gen_batch(spark, start: int, rows: int):
    """Deterministic synthetic docs, generated scan-side: ~40 tokens from
    a 5k-word vocabulary via hash expressions."""
    return spark.range(start, start + rows).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id") * 997 + j), F.lit(5000)).cast(
                        "string"
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    )


def _tf_files(path: str) -> tuple[int, int]:
    files = glob.glob(f"{path}/tf/**/*.parquet", recursive=True)
    dirs = glob.glob(f"{path}/tf/batch=*/term_bucket=*")
    return len(files), len(dirs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-rows", type=int, default=20_000)
    args = ap.parse_args()

    from crossbar_data_process_spark import get_spark
    from crossbar_data_process_spark.operators.retrieval import (
        bm25_index_ingest,
        bm25_topk_indexed,
        compact_bm25_index,
    )

    shutil.rmtree(ROOT, ignore_errors=True)
    # input-sized AQE margin (session.py, r15): generated docs are
    # invisible to the SF-dir signal (~400 text bytes/doc)
    spark = get_spark(
        app_name="bm25_compact_probe",
        input_bytes=args.batches * args.batch_rows * 400,
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "bm25_compact_probe",
        "batches": args.batches,
        "batch_rows": args.batch_rows,
    }
    walls = []
    for b in range(args.batches):
        bdf = gen_batch(spark, b * args.batch_rows, args.batch_rows)
        t0 = time.perf_counter()
        bm25_index_ingest(bdf, ROOT, f"b{b:03d}")
        walls.append(round(time.perf_counter() - t0, 3))
    out["ingest_walls"] = walls

    queries = spark.range(0, 32).select(
        F.col("id").alias("query_id"),
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * 13 + 7), F.lit(5000)).cast(
                "string"
            ),
            F.lit(" w"),
            F.pmod(F.xxhash64(F.col("id") * 17 + 3), F.lit(5000)).cast(
                "string"
            ),
        ).alias("query_text"),
    ).localCheckpoint()

    def probe():
        t0 = time.perf_counter()
        rows = sorted(
            (r.query_id, r.rnk, r.doc_id, str(r.score))
            for r in bm25_topk_indexed(spark, ROOT, queries).collect()
        )
        return round(time.perf_counter() - t0, 3), rows

    files0, dirs0 = _tf_files(ROOT)
    wall0, rows0 = probe()
    t0 = time.perf_counter()
    compact_bm25_index(spark, ROOT)
    compact_wall = round(time.perf_counter() - t0, 3)
    files1, dirs1 = _tf_files(ROOT)
    wall1, rows1 = probe()
    out.update(
        {
            "tf_files_before": files0,
            "tf_bucket_dirs_before": dirs0,
            "tf_files_after": files1,
            "tf_bucket_dirs_after": dirs1,
            "probe_wall_before": wall0,
            "probe_wall_after": wall1,
            "compact_wall": compact_wall,
            "rankings_identical": rows0 == rows1,
            "n_ranked_rows": len(rows0),
        }
    )
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
