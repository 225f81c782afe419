#!/usr/bin/env python3
"""Phase-level profile of q73's body (diagnosis only): replicates the
query with timestamps at each phase boundary, then buckets the event
log's jobs into phases. Prints per-phase wall, job count, sum of job
walls, and the residual (driver-side planning/py4j)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crossbar_data_process_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix=f"phaseprof_{os.getpid()}_")
    spark = get_spark(
        app_name="phaseprof_q73",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from crossbar_data_process_spark.operators.ivf import (
        ivf_fit,
        ivf_topk_assigned,
        suggest_nlist,
    )
    from crossbar_data_process_spark.plans.queries import QUERIES, _t
    from crossbar_data_process_spark.streaming.ann_ingest import (
        ivf_ingest_writer,
    )

    QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    marks: list[tuple[str, float]] = []

    def mark(name: str) -> None:
        marks.append((name, time.time() * 1000))

    mark("setup")
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 10)
    dim = e.select(F.size("embedding")).first()[0]
    n = e.count()
    nl = suggest_nlist(n)
    mark("fit")
    cents = ivf_fit(
        e, dim=dim, nlist=nl, iters=2,
        driver_fit_rows=max(2048, 8 * nl), n_rows=n,
    )
    silver = os.path.join(
        tempfile.gettempdir(), f"phaseprof_silver_{os.getpid()}"
    )
    shutil.rmtree(silver, ignore_errors=True)
    sink = ivf_ingest_writer(
        spark, cents, silver, dedup_threshold=0.999,
        assign_backend="arrow", pair_backend="arrow",
    )
    plants = (
        q.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        .unionByName(
            e.filter(F.col("vec_id") < 2).select(
                (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
            )
        )
    )
    b0 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    b1 = e.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1).unionByName(plants)
    mark("sink0")
    sink(b0, 0)
    mark("sink1")
    sink(b1, 1)
    mark("replay")
    sink(b1, 1)
    mark("probe")
    out = ivf_topk_assigned(spark, silver, q, cents, k=5, nprobe=nl)
    out.select(
        "query_id", "neighbor_id", "cosine",
        F.col("rnk").cast("long").alias("rnk"),
    ).count()
    mark("end")
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.rmtree(silver, ignore_errors=True)

    jobs = []
    path = os.path.join(log_dir, app_id)
    with open(path) as fh:
        starts = {}
        for line in fh:
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerJobStart":
                starts[ev["Job ID"]] = ev["Submission Time"]
            elif ev.get("Event") == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    jobs.append((starts[jid], ev["Completion Time"]))
    print(f"\n== q73 phases ==")
    for i in range(len(marks) - 1):
        name, t0 = marks[i]
        _, t1 = marks[i + 1]
        ph = [(s, e2) for s, e2 in jobs if t0 <= s < t1]
        jsum = sum(e2 - s for s, e2 in ph) / 1000.0
        print(
            f"{name:>8}: wall {(t1 - t0) / 1000.0:6.2f}s  jobs {len(ph):3d}  "
            f"job-sum {jsum:6.2f}s  driver-residual "
            f"{(t1 - t0) / 1000.0 - jsum:6.2f}s"
        )
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
