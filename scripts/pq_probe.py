#!/usr/bin/env python3
"""PQ scale probe (r11): measures the claims operators/pq.py makes.

1. encode slope: pq_encode wall at N and 10N corpus rows (a pure
   scan-side projection must scale ~linearly, no shuffle);
2. ADC probe slope: ivf_pq_topk_assigned wall at both scales with a FIXED
   10-query workload (workload-pinning rule);
3. silver bytes: on-disk size of the SAME corpus as float silver
   (ivf.write_assigned_corpus), int8 silver (quantize=True), and PQ
   silver (pq.write_pq_corpus) — the storage claim, measured, plus the
   byte fraction a nprobe/nlist probe touches (sum of probed cluster
   directories vs the whole silver).

The corpus is synthesized DISTRIBUTED (spark.range + hash expressions —
no driver-side data) with mild cluster structure (16 planted directions)
so IVF assignment is non-degenerate. Numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM, M, K = 64, 4, 16
NLIST, NPROBE = 32, 4
SMALL, BIG = 100_000, 1_000_000
ROOT = "/tmp/pq_probe_r11"


def _corpus(spark, n: int):
    """Deterministic mildly-clustered corpus: 16 planted directions plus
    per-component hash noise — generated distributed, no driver lists."""
    cl = F.pmod(F.col("id"), F.lit(16)).cast("double")
    return spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.sin(cl * 7.0 + i.cast("double")) * 2.0
            + (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(10000)).cast("double")
                / 10000.0
                - 0.5
            ),
        ).alias("embedding"),
    )


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    from crossbar_data_process_spark import get_spark
    from crossbar_data_process_spark.operators.ivf import (
        ivf_fit_with_diagnostics,
        write_assigned_corpus,
        _probe_list,
    )
    from crossbar_data_process_spark.operators.pq import (
        ivf_pq_topk_assigned,
        pq_codebooks_fixed,
        pq_encode,
        write_pq_corpus,
    )

    spark = get_spark(app_name="pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    books = pq_codebooks_fixed(DIM, M, K)
    out: dict[str, dict] = {}

    for label, n in (("small", SMALL), ("big", BIG)):
        corpus = _corpus(spark, n)
        corpus.limit(1).collect()  # warm codegen outside the timings
        res: dict[str, float] = {"rows": n}

        t0 = time.perf_counter()
        pq_encode(corpus, books, keep_vec=False).write.mode(
            "overwrite"
        ).parquet(f"{ROOT}/{label}/encoded_flat")
        res["encode_write_s"] = round(time.perf_counter() - t0, 3)

        cents, diag = ivf_fit_with_diagnostics(
            corpus, dim=DIM, nlist=NLIST, iters=2, driver_fit_rows=2048
        )
        res["quantizer_mean_top1"] = round(diag["mean_top1"], 3)

        fpath = f"{ROOT}/{label}/silver_f"
        qpath = f"{ROOT}/{label}/silver_i8"
        ppath = f"{ROOT}/{label}/silver_pq"
        write_assigned_corpus(corpus, cents, fpath)
        write_assigned_corpus(corpus, cents, qpath, quantize=True)
        t0 = time.perf_counter()
        write_pq_corpus(corpus, cents, books, ppath)
        res["pq_silver_write_s"] = round(time.perf_counter() - t0, 3)
        res["bytes_float"] = _du(fpath)
        res["bytes_int8"] = _du(qpath)
        res["bytes_pq"] = _du(ppath)

        # fixed 10-query workload (vec_id < 10 — the pinning rule)
        q = corpus.filter(F.col("vec_id") < 10)
        topk = ivf_pq_topk_assigned(
            spark, ppath, q, cents, books, k=10, nprobe=NPROBE
        )
        t0 = time.perf_counter()
        topk.count()
        res["pq_probe_s"] = round(time.perf_counter() - t0, 3)

        # byte fraction a SINGLE query's probe touches (mean over the
        # workload) — the partition-pruning claim is per-query; the
        # 10-query UNION collectively covers most of the 32 lists
        # (10 × nprobe=4 slots) and would overstate the scan
        per_query = q.select(
            "vec_id",
            _probe_list(F.col("embedding"), cents, NPROBE).alias("cs"),
        ).collect()
        fracs = []
        union: set[int] = set()
        for r in per_query:
            union.update(r.cs)
            touched = sum(
                _du(f"{ppath}/cluster={c}")
                for c in r.cs
                if os.path.exists(f"{ppath}/cluster={c}")
            )
            fracs.append(touched / res["bytes_pq"])
        res["probe_bytes_fraction_per_query"] = round(
            sum(fracs) / len(fracs), 4
        )
        res["probed_clusters_union"] = len(union)

        out[label] = res
        print(json.dumps({label: res}), flush=True)

    slopes = {
        k: round(out["big"][k] / out["small"][k], 2)
        for k in ("encode_write_s", "pq_silver_write_s", "pq_probe_s")
        if out["small"][k] > 0
    }
    ratios = {
        "pq_vs_float_bytes": round(
            out["big"]["bytes_float"] / out["big"]["bytes_pq"], 1
        ),
        "pq_vs_int8_bytes": round(
            out["big"]["bytes_int8"] / out["big"]["bytes_pq"], 1
        ),
    }
    print(json.dumps({"slopes_10x": slopes, "byte_ratios": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
