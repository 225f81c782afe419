#!/usr/bin/env python3
"""ANN streaming-ingest probe (streaming/ann_ingest.py): N constant-size
micro-batches of embeddings through `ivf_ingest_writer` against a GROWING
cluster-partitioned silver — per-batch wall must stay flat (assignment is
a pure projection and the write touches only the batch's own leaves;
nothing reads the accumulated silver). Batches are generated DISTRIBUTED
(spark.range + hash expressions — no driver-side vector lists).

Run: python scripts/ann_ingest_probe.py [--batches N] [--batch-rows M]

With --compact (r10): after the batches land, run `compact_ivf_silver`
over all committed batches and measure what compaction actually buys —
parquet file count (the probe-time listing/footer-open cost that scales
with file count, not bytes), probe wall before/after on an identical
fixed workload, and a bit-identical probe-answer check (compaction must
be invisible to `ivf_topk_assigned` except in I/O shape).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crossbar_data_process_spark import get_spark
from crossbar_data_process_spark.operators.ivf import ivf_fit
from crossbar_data_process_spark.streaming.ann_ingest import (
    ivf_ingest_writer,
    read_assigned_silver,
)

ROOT = "/tmp/ann_ingest_probe_r09"
DIM = 32


def gen_batch(spark, start: int, rows: int):
    """Deterministic pseudo-random unit-scale vectors, generated scan-side:
    component j of vector i = hash(i, j) mapped to [-1, 1)."""
    return spark.range(start, start + rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id") * 131 + j), F.lit(2000)) / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--batch-rows", type=int, default=20_000)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument(
        "--dedup",
        type=float,
        default=None,
        metavar="TAU",
        help="run the sink with dedup_threshold=TAU (incremental "
        "semantic dedup): per-batch wall must stay flat because the "
        "flag is a cluster-pruned batch-broadcast join",
    )
    ap.add_argument(
        "--pq",
        action="store_true",
        help="run the sink with pq_codebooks (r11): batches land as "
        "m-byte PQ codes; per-batch wall must stay flat — encode is a "
        "batch-sized projection and nothing reads the accumulated silver",
    )
    ap.add_argument(
        "--nlist",
        type=int,
        default=16,
        help="quantizer granularity; scale runs size it for E[cluster]"
        "≈250 (1M-row batches → thousands of lists)",
    )
    ap.add_argument(
        "--backend",
        choices=("jvm", "arrow"),
        default="jvm",
        help="assignment backend inside the sink (r14, VERDICT r13 #2: "
        "the arrow/BLAS path landed in r13 commit 84aeeec but was "
        "unmeasured at ≥1M-row batches)",
    )
    ap.add_argument(
        "--pair-backend",
        choices=("jvm", "arrow"),
        default="jvm",
        help="arithmetic backend for the dedup-mode scoring (r15, "
        "VERDICT r14 #1): 'arrow' scores the within-batch pairs AND the "
        "cross-silver flag as grouped BLAS matmuls instead of one "
        "interpreted JVM dot per candidate",
    )
    ap.add_argument(
        "--refit-nlist",
        type=int,
        default=None,
        help="after the batches land, refit the silver to THIS nlist "
        "(blue/green) and ingest one more batch on the refitted silver "
        "— measures the cluster-population lever the dedup-mode cost "
        "statement points at instead of asserting it. 0 = size from "
        "the landed rows via suggest_nlist (the E[cluster]~250 posture, "
        "r16); explicit overshoots >4x warn via refit_ivf_silver",
    )
    ap.add_argument(
        "--two-level",
        action="store_true",
        help="wrap the centroids in the O(√nlist)-per-row two-level "
        "quantizer for sink-side assignment",
    )
    args = ap.parse_args()

    shutil.rmtree(ROOT, ignore_errors=True)
    # input-sized AQE margin (session.py, r15): the generated batches are
    # invisible to the SF-dir signal — declare their float64 vector bytes
    spark = get_spark(
        app_name="ann_ingest_probe",
        input_bytes=args.batches * args.batch_rows * DIM * 8,
    )
    spark.sparkContext.setLogLevel("ERROR")

    fit_corpus = gen_batch(spark, 0, args.batch_rows)
    cents = ivf_fit(
        fit_corpus,
        dim=DIM,
        nlist=args.nlist,
        iters=2,
        driver_fit_rows=max(2048, 8 * args.nlist),
    )
    tl = None
    if args.two_level:
        from crossbar_data_process_spark.operators.ivf import fit_two_level

        tl = fit_two_level(cents)
    books = None
    if args.pq:
        from crossbar_data_process_spark.operators.pq import pq_fit

        books = pq_fit(fit_corpus, dim=DIM, m=4, k=16, iters=4)
    sink = ivf_ingest_writer(
        spark,
        cents,
        f"{ROOT}/silver",
        metrics_dir=f"{ROOT}/metrics",
        dedup_threshold=args.dedup,
        pq_codebooks=books,
        two_level=tl,
        assign_backend=args.backend,
        pair_backend=args.pair_backend,
    )

    walls = []
    for b in range(args.batches):
        bdf = gen_batch(spark, b * args.batch_rows, args.batch_rows)
        t0 = time.perf_counter()
        sink(bdf, b)
        walls.append(time.perf_counter() - t0)
        print(f"batch {b:2d}: wall {walls[-1]:5.2f}s")
    total = read_assigned_silver(spark, f"{ROOT}/silver").count()
    early, late = np.mean(walls[1:4]), np.mean(walls[-3:])
    print(
        f"\nflatness: mean(batches 1-3) {early:.2f}s vs mean(last 3) "
        f"{late:.2f}s  ratio {late / early:.2f}  (silver grew to {total} vectors)"
    )
    if args.dedup is not None:
        # the operational loop's detect half (r16, VERDICT r15 #1): the
        # drop-rate verdict over the run's own metrics — a dup-storm or a
        # broken τ trips "over_dropping" here instead of only showing up
        # as a silver that quietly stopped growing. Metrics-sized fold.
        from crossbar_data_process_spark.streaming.ann_ingest import (
            dedup_rate_verdict,
        )

        v = dedup_rate_verdict(spark, f"{ROOT}/metrics", last_n_batches=5)
        print(
            f"dedup drop-rate verdict (last 5 batches): {v['verdict']}  "
            f"rate {v['drop_rate']:.4f}  "
            f"({v['n_landed']}/{v['n_vectors']} landed)"
        )
    # the composed single pane (r16): drift + landed skew + drop rate →
    # actions; one column-pruned corpus scan (the skew gauge) — the
    # maintenance-cadence call, not per-batch work
    from crossbar_data_process_spark.streaming.ann_ingest import (
        maintenance_verdict,
    )

    # nlist/dim come from the silver's own quantizer stamp (r16: an
    # explicit wrong nlist silently mis-scales skew_factor — measured
    # live: 800 against a 16-list silver read skew 56 on healthy data)
    mv = maintenance_verdict(spark, f"{ROOT}/silver", f"{ROOT}/metrics")
    print(
        f"maintenance verdict: actions={mv['actions'] or ['none']}  "
        f"regime={mv['drift']['regime']}  "
        f"skew_factor={mv['skew']['skew_factor']}  "
        f"suggested_nlist={mv['suggested_nlist']}"
    )
    if args.refit_nlist is not None:
        _refit_phase(spark, args)
    if args.compact:
        _compaction_phase(spark, cents, args.batches, books)
    spark.stop()


def _refit_phase(spark, args) -> None:
    """--refit-nlist M (r15, the cluster-population posture EXERCISED):
    after the batches land, the dedup-mode cost statement says per-batch
    wall grows with cluster populations at fixed nlist and the lever is
    a REFIT to a larger quantizer — this leg measures the loop instead
    of asserting it: cluster stats → blue/green refit at M lists →
    a fresh sink on the refitted silver → one more batch, with the
    per-batch wall before/after printed side by side."""
    from crossbar_data_process_spark.streaming.ann_ingest import (
        cluster_size_stats,
        ivf_ingest_writer,
        refit_ivf_silver,
    )

    pre = cluster_size_stats(spark, f"{ROOT}/silver")
    t0 = time.perf_counter()
    rep = refit_ivf_silver(
        spark,
        f"{ROOT}/silver",
        f"{ROOT}/silver_refit",
        # 0 → None → suggest_nlist over the landed rows (the codified
        # E[cluster]≈250 posture, r16); explicit values warn on >4×
        # overshoot inside refit_ivf_silver
        nlist=args.refit_nlist or None,
        iters=2,
        require_clustered=False,  # synthetic hash vectors are isotropic
    )
    t_refit = time.perf_counter() - t0
    post = cluster_size_stats(spark, f"{ROOT}/silver_refit")
    # the refit contract: the NEXT sink takes the returned centroids AND
    # the returned two_level — refit_ivf_silver re-assigned the silver
    # two-level whenever refit_nlist ≥ its threshold, so pairing the
    # refitted silver with a flat sink would file a batch vector in a
    # different cluster than its landed twin and silently miss dups
    # (review pass 2)
    sink2 = ivf_ingest_writer(
        spark,
        rep["centroids"],
        f"{ROOT}/silver_refit",
        metrics_dir=f"{ROOT}/metrics_refit",
        dedup_threshold=args.dedup,
        two_level=rep["two_level"],
        assign_backend=args.backend,
        pair_backend=args.pair_backend,
    )
    bdf = gen_batch(spark, args.batches * args.batch_rows, args.batch_rows)
    t0 = time.perf_counter()
    sink2(bdf, args.batches)
    t_batch = time.perf_counter() - t0
    print(
        f"\nrefit leg: nlist {args.nlist} -> {rep['nlist']} "
        f"({rep['rows']} rows re-assigned in {t_refit:.2f}s)\n"
        f"  mean cluster pop {pre['mean']:.0f} -> {post['mean']:.0f}  "
        f"(max {pre['max']} -> {post['max']})\n"
        f"  next {args.batch_rows}-row batch on the refitted silver: "
        f"{t_batch:.2f}s"
    )


def _silver_files(silver: str) -> tuple[int, int]:
    """(parquet files, batch-leaf dirs) under the cluster-partitioned tree."""
    files = leaves = 0
    for dirpath, _dirnames, filenames in os.walk(silver):
        base = os.path.basename(dirpath)
        if base.startswith("__batch_id="):
            leaves += 1
        files += sum(f.endswith(".parquet") for f in filenames)
    return files, leaves


def _compaction_phase(spark, cents, batches: int, books=None) -> None:
    from crossbar_data_process_spark.operators.ivf import ivf_topk_assigned
    from crossbar_data_process_spark.operators.pq import ivf_pq_topk_assigned
    from crossbar_data_process_spark.streaming.ann_ingest import (
        compact_ivf_silver,
    )

    silver = f"{ROOT}/silver"
    queries = gen_batch(spark, 0, 64)

    # a PQ silver stores codes only: probe it with the ADC reader (a raw
    # ivf_topk_assigned would select the nonexistent embedding column —
    # r11 review round 3)
    def probe() -> tuple[float, list]:
        t0 = time.perf_counter()
        if books is not None:
            rows = sorted(
                (r.query_id, r.rnk, r.neighbor_id, r.adc)
                for r in ivf_pq_topk_assigned(
                    spark, silver, queries, cents, books, k=10, nprobe=4
                ).collect()
            )
        else:
            rows = sorted(
                (r.query_id, r.rnk, r.neighbor_id, round(r.cosine, 6))
                for r in ivf_topk_assigned(
                    spark, silver, queries, cents, k=10, nprobe=4
                ).collect()
            )
        return time.perf_counter() - t0, rows

    f0, l0 = _silver_files(silver)
    w1, want = probe()
    w2, _ = probe()  # warm repeat: listing/footers cached
    t0 = time.perf_counter()
    rep = compact_ivf_silver(spark, silver, before_batch=batches)
    tc = time.perf_counter() - t0
    f1, l1 = _silver_files(silver)
    w3, got = probe()
    w4, got2 = probe()
    assert got == want and got2 == want, "compaction changed probe answers"
    print(
        f"\ncompaction: {rep['compacted_batches']} batches x "
        f"{rep['clusters']} clusters ({rep['rows']} rows) in {tc:.2f}s\n"
        f"  files {f0} -> {f1}   batch leaves {l0} -> {l1}\n"
        f"  probe wall cold/warm {w1:.2f}/{w2:.2f}s pre  ->  "
        f"{w3:.2f}/{w4:.2f}s post  (answers bit-identical)"
    )


if __name__ == "__main__":
    main()
