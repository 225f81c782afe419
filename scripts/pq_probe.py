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

import argparse
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


def residual_recall(spark) -> None:
    """--residual (r12, VERDICT r11 #5): recall-vs-bitrate at 1M rows.

    For raw and residual PQ at two code rates (m=4/k=16 — the oracle
    rate — and m=8/k=32 — the rate the r11 tier study showed resolves
    within-cell ties), measure against the SAME pruned candidate set
    (nprobe/nlist in-probe exact L2 top-10 — isolates PQ ranking loss
    from coarse-quantizer loss):
      - recall@10 of the silver's ADC ranking vs the in-probe exact;
      - mean ADC relative distance error |adc − d²|/d² over the ANN
        pairs (the tie-free estimator-quality metric — the r11 round
        memory's lesson that planted-dup recall alone misleads at low
        bitrate).
    Fits use the same bounded-sample contract as production
    (pq_fit / pq_fit_residual, driver_fit_rows=2048).

    Ground truth needs PLANTED true neighbors: the synthetic bulk is
    ~125k near-EQUIDISTANT candidates per query (within a planted
    direction all pairs differ by two iid noise draws), so the exact
    top-10 of the bulk is decided at noise margins no quantizer — and
    no realistic ANN user — cares about (first measurement of this
    probe read recall ≈ 0 for every config for exactly that reason).
    Each query gets 10 planted neighbors at small deterministic
    perturbation (true d² ≈ 0.5 vs bulk ≈ 10), so recall measures
    whether ADC separates GENUINELY near vectors from the bulk — the
    actual ANN task — at each bitrate."""
    from crossbar_data_process_spark.operators.ivf import (
        _probe_list,
        ivf_assign,
        ivf_fit_with_diagnostics,
    )
    from crossbar_data_process_spark.operators.materialize import materialize
    from crossbar_data_process_spark.operators.pq import (
        ivf_pq_topk_assigned,
        pq_fit,
        pq_fit_residual,
        write_pq_corpus,
    )
    from crossbar_data_process_spark.operators.topk import top_k_per_group

    n = BIG
    base = _corpus(spark, n)
    # 10 planted neighbors per query vector: query embedding + 0.3-amp
    # hash noise (same cluster by construction — the perturbation is far
    # inside the planted-direction separation). materialize() breaks the
    # generated-expression lineage BEFORE the self-joins below (the r10
    # transform-capture attribute-dedup trap).
    qbase = _corpus(spark, 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("__qv")
    )
    plants = (
        spark.range(0, 100)
        .select(
            (F.lit(n) + F.col("id")).alias("vec_id"),
            (F.col("id") / 10).cast("long").alias("qid"),
        )
        .join(qbase, "qid")
        .select(
            "vec_id",
            F.transform(
                F.col("__qv"),
                lambda x, i: x
                + (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), i), F.lit(1000)
                    ).cast("double")
                    / 1000.0
                    - 0.5
                )
                * 0.3,
            ).alias("embedding"),
        )
    )
    corpus = materialize(base.unionByName(plants))
    cents, diag = ivf_fit_with_diagnostics(
        corpus, dim=DIM, nlist=NLIST, iters=2, driver_fit_rows=2048
    )
    q = corpus.filter(F.col("vec_id") < 10)

    # in-probe exact ground truth: the same candidate set the silver
    # probe scans (assign × probed lists), ranked by TRUE squared L2
    assigned = corpus.withColumn(
        "cluster", ivf_assign(F.col("embedding"), cents)
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        "cluster",
    )
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.explode(_probe_list(F.col("embedding"), cents, NPROBE)).alias(
            "cluster"
        ),
    )
    # the production distance expression itself (fold order pinned to the
    # SQL oracle's) — not a re-derivation that could drift (r12 review)
    from crossbar_data_process_spark.operators.pq import _sqdist

    d2 = _sqdist(F.col("__qv"), F.col("__cv"))
    cand = materialize(
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    exact = top_k_per_group(
        cand, ["query_id"], [F.asc("d2"), F.asc("neighbor_id")], 10
    ).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    table = []
    for mode, m, k in (
        ("raw", 4, 16),
        ("residual", 4, 16),
        ("raw", 8, 32),
        ("residual", 8, 32),
    ):
        if mode == "raw":
            books = pq_fit(corpus, DIM, m=m, k=k, driver_fit_rows=2048)
            centers = None
        else:
            centers, books = pq_fit_residual(
                corpus, DIM, cents, m=m, k=k, driver_fit_rows=2048
            )
        path = f"{ROOT}/residual/{mode}_m{m}k{k}"
        t0 = time.perf_counter()
        write_pq_corpus(
            corpus, cents, books, path, residual_centers=centers
        )
        write_s = round(time.perf_counter() - t0, 3)
        ann = ivf_pq_topk_assigned(
            spark, path, q, cents, books, k=10, nprobe=NPROBE
        )
        # true d² for the ANN pairs: equi-join back to the candidate table
        scored = ann.join(cand, ["query_id", "neighbor_id"]).select(
            "query_id", "neighbor_id", "adc", "d2"
        )
        rows = scored.collect()
        hits = sum(
            1 for r in rows if r.neighbor_id in truth.get(r.query_id, set())
        )
        recall = hits / sum(len(v) for v in truth.values())
        rel = [abs(r.adc - r.d2) / r.d2 for r in rows if r.d2 > 0]
        table.append(
            {
                "mode": mode,
                "m": m,
                "k": k,
                "code_bytes_per_vec": m,  # k ≤ 256 ⇒ one byte per subspace
                "recall_at_10_in_probe": round(recall, 4),
                "adc_mean_rel_err": round(sum(rel) / len(rel), 4),
                "silver_write_s": write_s,
            }
        )
        print(json.dumps(table[-1]), flush=True)
    print(
        json.dumps(
            {
                "rows": n,
                "nlist": NLIST,
                "nprobe": NPROBE,
                "quantizer_mean_top1": round(diag["mean_top1"], 3),
                "recall_table": table,
            }
        )
    )


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

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--residual",
        action="store_true",
        help="run the residual-PQ recall-vs-bitrate study at 1M rows "
        "instead of the standard scale probe",
    )
    args = ap.parse_args()

    # input-sized AQE margin (session.py, r15): generated vectors are
    # invisible to the SF-dir signal (~1M rows at the residual study /
    # the 10x encode ladder)
    spark = get_spark(app_name="pq-probe", input_bytes=1_000_000 * DIM * 8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.residual:
        residual_recall(spark)
        spark.stop()
        return
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
