#!/usr/bin/env python3
"""One-off sf1 scaling probe (VERDICT r5 #10 / r4 #7).

No driver-generated sf1 exists, so this synthesizes a 10x replica of
sf0.1 into /tmp purely as a PERFORMANCE probe (never a correctness
input): each replica offsets every join key consistently (orders keep
their lineitems, customers their orders, suppliers their lineitems) so
per-replica join structure matches the original; document texts get a
replica-suffix token so the near-dup/LSH structure scales linearly
instead of creating artificial 10-way exact-dup clusters whose candidate
pairs would grow quadratically BY CONSTRUCTION of the data.

Runs the 5 most expensive headline queries at sf0.1 and at the
synthetic sf1, one warm session, and prints per-query slopes
(t_sf1 / t_sf0.1; linear scaling at 10x data = slope <= ~10 once the
per-query fixed floor is subtracted).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# r07: regenerated layout (events now replicated too) — new dir so a stale
# r06 tree can't be half-reused
DST = "/tmp/sfprobe_sf1_r07"
REPLICAS = 10

# r07: probe the FULL headline set (VERDICT r6 #4), not just the 5 most
# expensive — resolved at runtime from the bench list so the two can't
# drift.
from crossbar_data_process_spark.plans.queries import BENCH_QUERIES  # noqa: E402

PROBE_QUERIES = list(BENCH_QUERIES)

# key -> offset unit must exceed the key's max at sf0.1
OFFSETS = {
    "l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
    "l_suppkey": 1_000_000, "s_suppkey": 1_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
}


def _gen() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "lineitem": ["l_orderkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "embeddings": ["vec_id"],
        # events: replica users keep their own event streams (user_id
        # offset matches orders' o_custkey offset so the q57 as-of join
        # structure is preserved); identical timestamps model 10× traffic
        "events": ["event_id", "user_id"],
    }
    for table, keys in specs.items():
        cols = [f.name for f in pq.read_schema(f"{SRC}/{table}.parquet")]
        sel = ", ".join(
            f"{c} + i * {OFFSETS[c]} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{table}.parquet'), "
            f"range(0, {REPLICAS}) t(i)) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
    # documents: offset id AND perturb text per replica (see module docstring)
    con.execute(
        f"COPY (SELECT doc_id + i * {OFFSETS['doc_id']} AS doc_id, "
        f"text || ' r' || i AS text, lang, source, n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet'), "
        f"range(0, {REPLICAS}) t(i)) TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    for table in ("part", "nation", "region"):
        src = f"{SRC}/{table}.parquet"
        if os.path.exists(src):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) "
                f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
            )


def main() -> None:
    from crossbar_data_process_spark import get_spark
    from crossbar_data_process_spark.plans.queries import QUERIES

    if not os.path.exists(f"{DST}/lineitem.parquet"):
        _gen()
    spark = get_spark(app_name="sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"](spark, SRC).limit(1).collect()  # warm

    out: dict[str, dict[str, float]] = {}
    for name in PROBE_QUERIES:
        times = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            times[label] = round(time.perf_counter() - t0, 3)
        times["slope"] = round(times["sf1"] / times["sf0.1"], 2)
        out[name] = times
        print(json.dumps({name: times}), flush=True)
    print(json.dumps({"probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
