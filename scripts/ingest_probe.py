#!/usr/bin/env python3
"""Streaming incremental-dedup ingest scale probe (r8 VERDICT #2).

`streaming/ingest.py` is the production daily-ingest shape; its r8
evidence was functional (replay idempotence, batch exclusion) but not
scale. This probe runs N sequential micro-batches of CONSTANT size
through the actual `dedup_ingest_writer` sink against an index that
GROWS with every batch (seeded with a 5k-doc corpus, +~2k docs/batch)
and records per-batch wall-clock. The "work is batch-sized" claim holds
iff the curve is flat — a slope in batch number would mean per-batch
cost scales with the accumulated index, which at 100 TB (years of daily
batches) is the difference between a constant-cost nightly job and one
that eventually never finishes.

Batch composition models a real crawl: ~80% fresh documents, ~10% exact
re-ingests of already-landed docs (the fp fast path MUST flag them),
~5% near-dups of landed docs (the LSH probe path), ~5% within-batch
duplicates (the micro-batch's own dedup). Text statistics are the same
Zipf-realistic generator family as scripts/sf1_probe.py (20k vocab,
s=1.07).

Run: python scripts/ingest_probe.py [--batches N] [--batch-rows M]
Output: one table row per batch (wall, gold rows, flagged rows) plus a
flatness summary (mean of batches 2-4 vs last 3 batches) — recorded in
BASELINE.md "Streaming ingest scale probe".
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crossbar_data_process_spark import get_spark
from crossbar_data_process_spark.streaming.ingest import (
    dedup_ingest_writer,
    seed_dedup_index,
)

ROOT = "/tmp/ingest_probe_r09"
VOCAB_SIZE = 20_000
ZIPF_S = 1.07
_HEAD_WORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "that", "are",
    "from", "or", "had", "but", "not", "have", "they", "his", "her", "we",
]


class _Gen:
    """Deterministic Zipf text generator with a memory of landed docs so
    later batches can re-ingest exact and near copies of them."""

    def __init__(self, seed: int = 20260814):
        self.rng = np.random.default_rng(seed)
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        probs = ranks ** -ZIPF_S
        self.probs = probs / probs.sum()
        self.vocab = np.array(
            _HEAD_WORDS
            + [f"w{i}" for i in range(VOCAB_SIZE - len(_HEAD_WORDS))]
        )
        self.landed: list[str] = []  # texts that went into gold/seed
        self.next_id = 0

    def fresh(self, n: int) -> list[str]:
        lens = self.rng.integers(60, 201, n)
        draws = self.rng.choice(
            VOCAB_SIZE, size=int(lens.sum()), p=self.probs
        )
        texts, off = [], 0
        for ln in lens:
            texts.append(" ".join(self.vocab[draws[off : off + ln]]))
            off += int(ln)
        return texts

    def near_of(self, text: str) -> str:
        toks = text.split()
        keep = int(len(toks) * 0.9)
        tail = self.vocab[
            self.rng.choice(VOCAB_SIZE, size=len(toks) - keep, p=self.probs)
        ]
        return " ".join(toks[:keep] + list(tail))

    def batch(self, rows: int) -> list[tuple[int, str]]:
        n_fresh = int(rows * 0.80)
        n_exact = int(rows * 0.10)
        n_near = int(rows * 0.05)
        texts = self.fresh(n_fresh)
        pool = self.landed if self.landed else texts
        idx = self.rng.integers(0, len(pool), n_exact + n_near)
        texts += [pool[i] for i in idx[:n_exact]]
        texts += [self.near_of(pool[i]) for i in idx[n_exact:]]
        # within-batch dups: exact copies of this batch's own fresh docs
        dup_idx = self.rng.integers(0, n_fresh, rows - len(texts))
        texts += [texts[i] for i in dup_idx]
        out = [(self.next_id + i, t) for i, t in enumerate(texts)]
        self.next_id += len(texts)
        # only the fresh docs are expected to land — remember those
        self.landed.extend(texts[:n_fresh])
        return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-rows", type=int, default=2000)
    ap.add_argument("--seed-rows", type=int, default=5000)
    args = ap.parse_args()

    shutil.rmtree(ROOT, ignore_errors=True)
    index_dir, gold_dir = f"{ROOT}/index", f"{ROOT}/gold"

    # input-sized AQE margin (session.py, r15): generated docs are
    # invisible to the SF-dir signal (~400 text bytes/doc)
    spark = get_spark(
        app_name="ingest_probe",
        input_bytes=(args.seed_rows + args.batches * args.batch_rows) * 400,
    )
    spark.sparkContext.setLogLevel("ERROR")

    gen = _Gen()
    seed_texts = gen.fresh(args.seed_rows)
    gen.landed.extend(seed_texts)
    seed = spark.createDataFrame(
        [(i, t) for i, t in enumerate(seed_texts)], "doc_id long, text string"
    )
    gen.next_id = args.seed_rows

    t0 = time.perf_counter()
    seed_dedup_index(seed, index_dir)
    print(f"seed: {args.seed_rows} docs, {time.perf_counter() - t0:.2f}s")

    sink = dedup_ingest_writer(spark, index_dir, gold_dir)

    walls: list[float] = []
    for b in range(args.batches):
        rows = gen.batch(args.batch_rows)
        bdf = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
        t0 = time.perf_counter()
        sink(bdf, b)
        wall = time.perf_counter() - t0
        walls.append(wall)
        landed = spark.read.parquet(gold_dir).filter(
            f"__batch_id = {b}"
        ).count()
        fp_rows = spark.read.parquet(f"{index_dir}/fingerprints").count()
        print(
            f"batch {b:2d}: wall {wall:6.2f}s  landed {landed:5d}/"
            f"{args.batch_rows}  index_fp_rows {fp_rows:6d}"
        )

    early = np.mean(walls[1:4])
    late = np.mean(walls[-3:])
    print(
        f"\nflatness: mean(batches 1-3) {early:.2f}s vs mean(last 3) "
        f"{late:.2f}s  ratio {late / early:.2f} "
        f"(flat ⇒ ~1.0; index grew {args.seed_rows} → "
        f"~{args.seed_rows + args.batches * int(args.batch_rows * 0.8)} docs)"
    )

    # ---- compaction effect (r09): same-size probe batch before/after
    # consolidating all committed partitions; the wall at local scale is
    # floor-dominated, the structural win is the file/partition count
    from crossbar_data_process_spark.streaming.ingest import (
        compact_dedup_index,
    )

    def index_files() -> tuple[int, int]:
        nf = np = 0
        for name in ("fingerprints", "buckets", "shingles"):
            for root, dirs, files in os.walk(f"{index_dir}/{name}"):
                np += sum(d.startswith("__batch_id=") for d in dirs)
                nf += sum(f.endswith(".parquet") for f in files)
        return np, nf

    def probe_batch(b: int) -> float:
        rows = gen.batch(args.batch_rows)
        bdf = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
        t0 = time.perf_counter()
        sink(bdf, b)
        return time.perf_counter() - t0

    np_pre, nf_pre = index_files()
    w_pre = probe_batch(args.batches)
    t0 = time.perf_counter()
    report = compact_dedup_index(spark, index_dir, before_batch=args.batches + 1)
    t_compact = time.perf_counter() - t0
    np_post, nf_post = index_files()
    w_post = probe_batch(args.batches + 1)
    print(
        f"compaction: partitions/table {np_pre // 3} -> {np_post // 3}, "
        f"parquet files {nf_pre} -> {nf_post} "
        f"({report['fingerprints']['rows']} fp rows, {t_compact:.2f}s); "
        f"probe-batch wall {w_pre:.2f}s pre vs {w_post:.2f}s post"
    )
    spark.stop()


if __name__ == "__main__":
    main()
