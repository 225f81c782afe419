#!/usr/bin/env python3
"""LSH mega-bucket cap probe (r14, VERDICT r13 #4): measure what the
``max_bucket_size`` lever actually costs in recall at corpus scale, and
what ``cap_mode="anchor"`` (star linking) buys back.

For the Zipf corpus at ``--n`` docs, runs the near-dup pipeline
(minhash_lsh_pairs @ threshold 0.5 → resolve_neardups) under three
postures and diffs the SURVIVOR sets (the quantity curation actually
ships):

- ``drop``:   cap 64, over-cap buckets dropped (the r12 default);
- ``anchor``: cap 64, over-cap buckets star-linked (b−1 linear pairs);
- ``truth``:  uncapped (only with ``--include-uncapped`` — quadratic in
  mega-bucket size; measured >79 GB spill at 500k in r12, so the flag
  exists for the scales where truth is computable).

Survivor diffs are computed engine-side (left-anti counts), never
collected. Prints ONE JSON line.

Usage: python scripts/lsh_cap_probe.py [--n 50000] [--include-uncapped]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAP = 64
THRESHOLD = 0.5


def _load_probe_module():
    spec = importlib.util.spec_from_file_location(
        "sf1_probe",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "sf1_probe.py"
        ),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    return probe


def _corpus(spark, n: int):
    """n docs of the shared Zipf recipe (near-dup plant every 25th, exact
    double every 100th) — generated under a probe-local recipe dir so the
    llm_build corpora are never clobbered."""
    probe = _load_probe_module()
    path = f"/tmp/lsh_cap_probe_zipf_{n}"
    marker = f"{path}/_recipe.json"
    recipe = {"n": n, "seed": 20260816, "gen": "zipf_texts", "rg": 65536}
    have = None
    try:
        with open(marker) as f:
            have = json.load(f)
    except (OSError, ValueError):
        pass
    if have != recipe:
        import shutil

        tmp = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        probe.write_zipf_documents(
            tmp, probe.zipf_texts(n, seed=recipe["seed"]), n,
            row_group_size=65536,
        )
        with open(f"{tmp}/_recipe.json", "w") as f:
            json.dump(recipe, f, sort_keys=True)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    return spark.read.parquet(f"{path}/documents.parquet").select(
        "doc_id", "text"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--include-uncapped", action="store_true")
    args = ap.parse_args()

    from crossbar_data_process_spark import get_spark
    from crossbar_data_process_spark.operators.textdedup import (
        lsh_cap_stats,
        minhash_lsh_pairs,
        resolve_neardups,
    )

    # input-sized AQE margin (session.py, r15): the zipf corpus is
    # invisible to the SF-dir signal — ~360 parquet bytes/doc measured
    spark = get_spark(input_bytes=args.n * 360)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _corpus(spark, args.n)

    out: dict = {"metric": "lsh_cap_probe", "n": args.n, "cap": CAP}
    caps = lsh_cap_stats(docs, max_bucket_size=CAP).collect()[0]
    out["bucket_stats"] = {
        "n_buckets": int(caps.n_buckets),
        "max_bucket": int(caps.max_bucket),
        "over_cap_buckets": int(caps.n_dropped_buckets),
        "over_cap_memberships": int(caps.n_dropped_memberships),
        "docs_affected": int(caps.n_docs_affected),
    }

    survivors: dict[str, object] = {}

    def run(name: str, **kw) -> None:
        t = time.monotonic()
        pairs = minhash_lsh_pairs(docs, threshold=THRESHOLD, **kw)
        surv = resolve_neardups(docs, pairs).select("doc_id")
        # materialize the survivor set once (diffs below reuse it)
        surv = surv.localCheckpoint()
        n = surv.count()
        out[name] = {"sec": round(time.monotonic() - t, 3), "survivors": n}
        survivors[name] = surv

    run("drop", max_bucket_size=CAP)
    run("anchor", max_bucket_size=CAP, cap_mode="anchor")
    if args.include_uncapped:
        run("truth", max_bucket_size=None)

    def diff(a: str, b: str) -> dict:
        sa, sb = survivors[a], survivors[b]
        return {
            f"only_{a}": sa.join(sb, "doc_id", "left_anti").count(),
            f"only_{b}": sb.join(sa, "doc_id", "left_anti").count(),
        }

    out["drop_vs_anchor"] = diff("drop", "anchor")
    if args.include_uncapped:
        out["drop_vs_truth"] = diff("drop", "truth")
        out["anchor_vs_truth"] = diff("anchor", "truth")
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
