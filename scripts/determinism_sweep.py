#!/usr/bin/env python3
"""Determinism sweep (the per-round bit-identical-results check cited in
COVERAGE.md "Scale evidence"): run EVERY declared query under two
deliberately different execution geometries — wide (local[32], 200
shuffle partitions) and narrow (local[6], 5 partitions) — in separate
JVMs, canonicalize each result (columns sorted by name, rows sorted, full
float repr), hash it, and compare.

Any mismatch is an order-dependent aggregate, an unstable tie-break, or
RNG leakage — exactly the bug class the engine's DECIMAL-accumulation /
total-order / md5-everything conventions exist to prevent.

Usage: python scripts/determinism_sweep.py [sf_dir]   (default sf0.01)
Exit code 1 if any query hashes differently.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import hashlib, json, math, os, sys
sys.path.insert(0, %(repo)r)
from crossbar_data_process_spark import get_spark
from crossbar_data_process_spark.plans.queries import QUERIES

sf_dir = %(sf_dir)r
spark = get_spark(app_name="determinism",
                  master=%(master)r, shuffle_partitions=%(parts)d)
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name, fn in QUERIES.items():
    df = fn(spark, sf_dir).toPandas()
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append("<NULL>")
            elif isinstance(v, float):
                canon.append(repr(float(v)))
            elif isinstance(v, (list, tuple)):
                canon.append(str(list(v)))
            else:
                canon.append(str(v))
        rows.append("\x1f".join(canon))
    rows.sort()
    out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
print("SWEEPJSON:" + json.dumps(out))
spark.stop()
"""


def run(master: str, parts: int, sf_dir: str) -> dict[str, str]:
    code = _WORKER % {
        "repo": REPO, "sf_dir": sf_dir, "master": master, "parts": parts,
    }
    env = dict(os.environ, SPARK_GRAFT_CPUS=master.strip("local[]"))
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SWEEPJSON:"):
            return json.loads(line[len("SWEEPJSON:"):])
    raise RuntimeError(f"worker failed (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wide = run("local[32]", 200, sf_dir)
    narrow = run("local[6]", 5, sf_dir)
    bad = [q for q in wide if wide[q] != narrow.get(q)]
    print(json.dumps({
        "queries": len(wide),
        "mismatches": bad,
        "sf_dir": sf_dir,
    }))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
