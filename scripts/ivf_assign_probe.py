#!/usr/bin/env python3
"""IVF assignment-cost probe (VERDICT r12 #1): measure flat vs two-level
coarse assignment walls at SemDeDup's production quantizer granularity
(nlist = n / 250) on 250k / 1M / 5M-row clustered corpora, with
flat-vs-two-level assignment agreement as the quality gauge.

The law being probed: flat ``ivf_assign`` costs O(nlist) dot products
per row, so with nlist = n/250 the corpus assignment is n²/250 dots;
the two-level quantizer (``fit_two_level`` → ``assign_frame``) costs
O(√nlist·(1+probes)) per row — still Θ(n^1.5) asymptotically under the
nlist ∝ n policy, but with a √nlist/(1+probes) work advantage over flat
that GROWS with the corpus (≈25× at 1M, ≈47× at 5M — measured, r13
BASELINE) — and its PLAN carries no leaf literals (the broadcast-join
transport), so driver plan-build / analysis time stays flat too. Flat
at 5M/nlist=20000 would be ~1e11 dot products plus a ~1.3M-literal plan
— the probe exists to show that wall, not to die on it (see the
size-ladder note below). Past ~100M rows the same move recurses (a
third level buys another √ntop factor); nothing below assumes depth 2.

Corpora are generated distributed (spark.range + hash exprs, no driver
lists) and staged to /tmp parquet ONCE per size so every timed run reads
identical bytes. Flat is measured on a SMALL size ladder (62.5k/125k/250k
— its per-2x slope of ~4 already proves the n^2/250 law; 1M flat is ~90
minutes of 32-core churn, the wall itself), two-level on the big ladder.
Run:
    python scripts/ivf_assign_probe.py \
        [--flat-sizes 62500,125000,250000] \
        [--two-sizes 250000,1000000,5000000]
Prints one JSON line {"metric": "ivf_assign_probe", "rows": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crossbar_data_process_spark import get_spark
from crossbar_data_process_spark.operators.ivf import (
    assign_frame_arrow,
    fit_two_level,
    ivf_assign,
    ivf_fit,
)

DIM = 64
CLUSTER_SIZE = 250  # the SemDeDup E[cluster] policy: nlist = n / 250
STAGE_DIR = "/tmp/ivf_assign_probe"


def gen(spark, n: int, ncenters: int):
    """center(id % ncenters) + noise, both pure hash expressions."""
    g = F.col("id") % ncenters

    def comp(j):
        center = F.pmod(F.xxhash64(g * 97 + j), F.lit(2000)) / 1000.0 - 1.0
        noise = (
            F.pmod(F.xxhash64(F.col("id") * 131 + j), F.lit(2000)) / 1000.0
            - 1.0
        ) * 0.15
        return (center + noise).cast("float")

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(DIM)]).alias("embedding"),
    )


def stage(spark, n: int, nlist: int) -> str:
    path = f"{STAGE_DIR}/n{n}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        shutil.rmtree(path, ignore_errors=True)
        gen(spark, n, nlist).write.mode("overwrite").parquet(path)
    return path


def _time_assign(df) -> tuple[float, int]:
    """Wall of a full assignment pass, forced by a 1-row aggregate that
    consumes every cluster id (count + sum — nothing can be pruned)."""
    t0 = time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cluster").alias("s")
    ).collect()[0]
    return time.perf_counter() - t0, int(row.n)


def run(spark, n: int, with_flat: bool, with_jvm_two: bool = True) -> dict:
    nlist = max(8, n // CLUSTER_SIZE)
    corpus = spark.read.parquet(stage(spark, n, nlist))
    t0 = time.perf_counter()
    cents = ivf_fit(
        corpus,
        dim=DIM,
        nlist=nlist,
        iters=2,
        driver_fit_rows=max(20_000, 4 * nlist),
    )
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    tl = fit_two_level(cents)
    t_fit_top = time.perf_counter() - t0

    if with_jvm_two:
        t_two, rows = _time_assign(
            tl.assign_frame(corpus, "embedding", out_col="cluster")
        )
        assert rows == n
    else:
        t_two = None  # --arrow-only rerun; JVM walls already on record

    # the Arrow/BLAS backend (r13): same assignments, BLAS arithmetic —
    # the gap between these columns and the JVM ones is pure
    # interpreted-HOF overhead (HOFs never codegen; jstack-confirmed)
    t_arrow_flat, rows_af = _time_assign(
        assign_frame_arrow(corpus, "embedding", cents)
    )
    assert rows_af == n
    t_arrow_two, rows_at = _time_assign(
        assign_frame_arrow(corpus, "embedding", cents, two_level=tl)
    )
    assert rows_at == n

    out = {
        "n": n,
        "nlist": nlist,
        "ntop": len(tl.top),
        "t_fit": round(t_fit, 2),
        "t_fit_top": round(t_fit_top, 2),
        "t_assign_two_level": round(t_two, 2) if t_two is not None else None,
        "t_assign_arrow_flat": round(t_arrow_flat, 2),
        "t_assign_arrow_two": round(t_arrow_two, 2),
    }
    # flat on the big ladder is the measured wall this probe exists to
    # retire (1M/nlist=4000 ~ 90 min; 5M/nlist=20000 ~ 1e11 dots plus a
    # ~1.3M-literal plan) — skipped there, not faked
    if with_flat:
        flat_df = corpus.withColumn(
            "cluster", ivf_assign(F.col("embedding"), cents)
        )
        t_flat, _ = _time_assign(flat_df)
        out["t_assign_flat"] = round(t_flat, 2)
        # agreement on a bounded sample (collecting n full assignments is
        # not the probe's job): md5-style deterministic carve of ~20k ids
        sample = corpus.filter(F.col("vec_id") % max(1, n // 20_000) == 0)
        both = tl.assign_frame(sample, "embedding", out_col="two").join(
            sample.select(
                "vec_id", ivf_assign(F.col("embedding"), cents).alias("flat")
            ),
            "vec_id",
        )
        agree = both.agg(
            F.avg((F.col("two") == F.col("flat")).cast("double")).alias("a")
        ).collect()[0].a
        out["agreement"] = round(float(agree), 4)
    else:
        out["t_assign_flat"] = None
        out["agreement"] = None
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat-sizes", default="62500,125000,250000")
    ap.add_argument("--two-sizes", default="250000,1000000,5000000")
    ap.add_argument(
        "--arrow-only",
        action="store_true",
        help="skip the slow JVM paths (flat AND two-level) — re-measure "
        "just the Arrow columns against already-recorded JVM walls",
    )
    args = ap.parse_args()

    flat_sizes = [int(s) for s in args.flat_sizes.split(",") if s]
    two_sizes = [int(s) for s in args.two_sizes.split(",") if s]
    # input-sized AQE margin (session.py, r15): generated vectors are
    # invisible to the SF-dir signal — declare the largest probe corpus
    # (default=0 keeps the both-ladders-empty invocation working, where
    # the margin is moot anyway — review pass 2)
    spark = get_spark(
        app_name="ivf_assign_probe",
        input_bytes=max(flat_sizes + two_sizes, default=0) * DIM * 8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sorted(set(flat_sizes) | set(two_sizes)):
        rows.append(
            run(
                spark,
                n,
                with_flat=n in flat_sizes and not args.arrow_only,
                with_jvm_two=not args.arrow_only,
            )
        )
        print(json.dumps(rows[-1]), file=sys.stderr)  # progress
    print(json.dumps({"metric": "ivf_assign_probe", "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
