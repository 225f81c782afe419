#!/usr/bin/env python3
"""Semantic-dedup scale probe (operators/similarity.semantic_dedup):
measure the Σc² candidate claim on deterministic clustered corpora at N
and 10N vectors, holding EXPECTED CLUSTER SIZE constant (nlist scales
with the corpus — the SemDeDup production posture; with nlist FIXED,
per-cluster populations grow linearly and the pair stage grows
quadratically, which is the documented anti-pattern, not a plan).

Corpora are generated distributed (spark.range + hash exprs, no driver
lists): every 20th vector is a tiny-noise copy of its predecessor (the
planted near-dup), everything else is center + noise. Reports wall
clock, survivor counts, and the plant-detection rate at both sizes.

Run: python scripts/semdedup_probe.py [--small N] [--factor K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crossbar_data_process_spark import get_spark
from crossbar_data_process_spark.operators.ivf import ivf_fit
from crossbar_data_process_spark.operators.similarity import semantic_dedup

DIM = 32
CLUSTER_SIZE = 500  # expected vectors per fitted list, held constant


def gen(spark, n: int, ncenters: int):
    """id i: center(base % ncenters) + 0.3-noise; every 20th id copies its
    predecessor's vector plus 1e-4 jitter (the planted near-dup)."""
    base = F.when(
        F.col("id") % 20 == 19, F.col("id") - 1
    ).otherwise(F.col("id"))
    g = base % ncenters

    def comp(j):
        center = (
            F.pmod(F.xxhash64(g * 73 + j), F.lit(2000)) / 1000.0 - 1.0
        )
        noise = (
            F.pmod(F.xxhash64(base * 131 + j), F.lit(2000)) / 1000.0 - 1.0
        ) * 0.3
        jitter = (
            F.pmod(F.xxhash64(F.col("id") * 17 + j), F.lit(2000)) / 1000.0
            - 1.0
        ) * 1e-4
        return (center + noise + jitter).cast("float")

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(DIM)]).alias("embedding"),
    )


def run(spark, n: int, backend: str = "jvm") -> dict:
    ncenters = max(8, n // CLUSTER_SIZE)
    corpus = gen(spark, n, ncenters)
    t0 = time.perf_counter()
    cents = ivf_fit(
        corpus, dim=DIM, nlist=ncenters, iters=2, driver_fit_rows=20_000
    )
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = semantic_dedup(
        corpus,
        cents,
        threshold=0.999,
        assign_backend="arrow" if backend != "jvm" else "jvm",
        pair_backend=backend if backend != "jvm" else "jvm",
    )
    survivors = out.count()
    t_dedup = time.perf_counter() - t0
    plants = n // 20
    return {
        "n": n,
        "nlist": ncenters,
        "backend": backend,
        "t_fit": round(t_fit, 2),
        "t_dedup": round(t_dedup, 2),
        "survivors": survivors,
        "dropped": n - survivors,
        "plants": plants,
        "plant_recall": round((n - survivors) / plants, 3),
    }


def gen_skewed(spark, n: int, ncenters: int, hot: int = 36):
    """The measured r12 skew shape (36 hot clusters carried 66% of 813M
    candidate pairs at 500k docs): half the corpus lands in ``hot``
    clusters, half spreads uniformly over the rest — every 20th vector is
    still the planted near-dup copy of its predecessor.

    Hot clusters are POINT MASSES (jitter-scale noise), not diffuse
    blobs: fitted k-means SHATTERS a diffuse blob across many lists
    (measured r13 — a Gaussian hot blob probed at relief 1.00× because
    the quantizer balanced it away), but near-identical vectors collapse
    to one point the fit cannot split — which is exactly the production
    source of hot lists (boilerplate/duplicated text embedding to
    near-identical vectors, the r12 llm_build Zipf measurement)."""
    base = F.when(
        F.col("id") % 20 == 19, F.col("id") - 1
    ).otherwise(F.col("id"))
    is_hot = F.pmod(F.xxhash64(base * 7 + 3), F.lit(2)) == 0
    g = F.when(
        is_hot,
        F.pmod(F.xxhash64(base * 11 + 5), F.lit(hot)),
    ).otherwise(
        F.lit(hot) + F.pmod(F.xxhash64(base * 13 + 9), F.lit(ncenters - hot))
    )

    def comp(j):
        center = (
            F.pmod(F.xxhash64(g * 73 + j), F.lit(2000)) / 1000.0 - 1.0
        )
        # hot = point mass (irreducible hot list); cold = diffuse blob
        noise = (
            F.pmod(F.xxhash64(base * 131 + j), F.lit(2000)) / 1000.0 - 1.0
        ) * F.when(is_hot, F.lit(1e-4)).otherwise(F.lit(0.3))
        jitter = (
            F.pmod(F.xxhash64(F.col("id") * 17 + j), F.lit(2000)) / 1000.0
            - 1.0
        ) * 1e-4
        return (center + noise + jitter).cast("float")

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(DIM)]).alias("embedding"),
    )


def run_skew(spark, n: int, hot: int = 36, backend: str = "jvm") -> dict:
    """Straggler probe (VERDICT r12 #2): on a skewed corpus the pair set
    is identical with and without sub-sharding — what changes is the TASK
    shape, so the wall difference IS the straggler relief (a cluster-keyed
    join floors at the hottest cluster's single task; the s×s grid splits
    it across ~s² tasks on 32 cores)."""
    from crossbar_data_process_spark.operators.similarity import (
        cluster_cap_stats,
        neighbor_pairs_ivf,
    )

    ncenters = max(64, n // CLUSTER_SIZE)
    corpus = gen_skewed(spark, n, ncenters, hot=hot)
    cents = ivf_fit(
        corpus, dim=DIM, nlist=ncenters, iters=2, driver_fit_rows=20_000
    )
    # stats computed on the SAME backend the probe row is labeled with
    # (r13 ADVICE: a --backend jvm row used to carry arrow-computed stats)
    stats = cluster_cap_stats(corpus, cents, assign_backend=backend).collect()[0]
    out = {
        "n": n,
        "nlist": ncenters,
        "hot": hot,
        "backend": backend,
        "max_cluster": int(stats.max_cluster),
        "n_sharded_clusters": int(stats.n_sharded_clusters),
        "n_sharded_docs": int(stats.n_sharded_docs),
    }
    for label, target in (("unsharded", None), ("sharded", 2000)):
        t0 = time.perf_counter()
        pairs = neighbor_pairs_ivf(
            corpus,
            cents,
            threshold=0.999,
            shard_target=target,
            assign_backend="arrow" if backend != "jvm" else "jvm",
            pair_backend=backend if backend != "jvm" else "jvm",
        ).count()
        out[f"t_pairs_{label}"] = round(time.perf_counter() - t0, 2)
        out[f"pairs_{label}"] = pairs
    assert out["pairs_unsharded"] == out["pairs_sharded"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=50_000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run the hot-cluster straggler probe instead of the slope pair",
    )
    ap.add_argument(
        "--hot",
        type=int,
        default=36,
        help="hot-cluster count for --skew (36 = the measured r12 shape; "
        "a few mega-clusters << cores shows the pure straggler floor)",
    )
    ap.add_argument(
        "--backend",
        default="jvm",
        choices=("jvm", "arrow"),
        help="--skew pair/assignment backend (arrow = BLAS cogroup path)",
    )
    args = ap.parse_args()

    # input-sized AQE margin (session.py, r15): generated vectors are
    # invisible to the SF-dir signal — declare their float64 bytes
    spark = get_spark(
        app_name="semdedup_probe",
        input_bytes=args.small * args.factor * DIM * 8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.skew:
        res = run_skew(
            spark, args.small * args.factor, hot=args.hot, backend=args.backend
        )
        print("\nskew probe:", res)
        print(
            "straggler relief (unsharded/sharded wall): "
            f"{res['t_pairs_unsharded'] / res['t_pairs_sharded']:.2f}x"
        )
        spark.stop()
        return
    small = run(spark, args.small, backend=args.backend)
    big = run(spark, args.small * args.factor, backend=args.backend)
    print("\nsmall:", small)
    print("big:  ", big)
    print(
        f"slope (dedup wall, {args.factor}x corpus at constant cluster "
        f"size): {big['t_dedup'] / small['t_dedup']:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
