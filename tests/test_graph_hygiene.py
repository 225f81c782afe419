"""Cache hygiene of iterative graph jobs + size-aware mapping joins.

VERDICT r01 items 3-4: iterative jobs must not accumulate persisted storage
linearly with iteration count, and broadcast_map/fallback_map must not force
a broadcast hint by default (a mapping small at test scale can be tens of GB
at production scale).
"""

from __future__ import annotations

import gc
import time

import pytest

from pyspark.sql import functions as F

from crossbar_data_process_spark.graph.components import connected_components
from crossbar_data_process_spark.graph.hierarchy import transitive_closure
from crossbar_data_process_spark.graph.pagerank import pagerank
from crossbar_data_process_spark.operators.mapping import broadcast_map, fallback_map


def _storage_entries(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _settled_storage_delta(spark, before: int, timeout_s: float = 20.0) -> int:
    """Storage-entry delta after giving the async unpersist + ContextCleaner
    a chance to run (non-blocking unpersist and GC-driven checkpoint cleanup
    are both asynchronous)."""
    deadline = time.monotonic() + timeout_s
    delta = _storage_entries(spark) - before
    while delta > 0 and time.monotonic() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        delta = _storage_entries(spark) - before
    return delta


@pytest.mark.slow
def test_components_30_iters_storage_bounded(spark):
    # Path graph: the min label travels one hop per iteration, so a 40-node
    # path does NOT converge within 30 iterations — the loop runs all 30.
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id int")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src int, dst int"
    )
    before = _storage_entries(spark)
    # driver_max_edges=None: this test pins the LOOP's storage hygiene —
    # the r16 small-graph fast path would otherwise resolve this tiny
    # graph driver-side and exercise nothing
    out = connected_components(
        nodes, edges, max_iters=30, checkpoint_every=5, driver_max_edges=None
    )
    rows = out.collect()
    assert len(rows) == n
    # after 30 iterations every node within 30 hops of node 0 carries label 0
    labels = {r["id"]: r["component"] for r in rows}
    assert labels[30] == 0 and labels[0] == 0
    # unfixed behavior: ~2 entries per iteration (60+). Fixed: the live
    # iteration + a handful of not-yet-GC'd localCheckpoint blocks.
    assert _settled_storage_delta(spark, before) <= 10


def test_components_fast_path_matches_loop(spark):
    """The r16 small-graph fast path (bounded driver union-find +
    broadcast map) must return the IDENTICAL (id, component) set as the
    distributed propagation loop — including isolated nodes, duplicate
    edges, self-loops, and edges whose endpoint is OUTSIDE ``nodes``
    (which the loop cannot propagate through and the fast path must
    filter out)."""
    import random

    rng = random.Random(41)
    nodes = spark.createDataFrame(
        [(i,) for i in range(60)], "id long"
    )
    edge_rows = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    # endpoints outside `nodes` must not link 3 and 7 (x=999 holds no
    # label in the loop); duplicate + self-loop edges are harmless
    edge_rows += [(3, 999), (999, 7), (5, 5), (10, 11), (10, 11)]
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    fast = {
        (r.id, r.component)
        for r in connected_components(nodes, edges).collect()
    }
    loop = {
        (r.id, r.component)
        for r in connected_components(
            nodes, edges, driver_max_edges=None
        ).collect()
    }
    assert fast == loop
    # over-budget graphs fall back to the loop (same answer)
    capped = {
        (r.id, r.component)
        for r in connected_components(
            nodes, edges, driver_max_edges=3
        ).collect()
    }
    assert capped == loop
    # the endpoints_in_nodes contract (resolve_neardups' shape): when
    # every endpoint IS in nodes, skipping the semi-joins changes nothing
    in_nodes = spark.createDataFrame(
        [(a, b) for a, b in edge_rows if a < 60 and b < 60],
        "src long, dst long",
    )
    assert {
        (r.id, r.component)
        for r in connected_components(
            nodes, in_nodes, endpoints_in_nodes=True
        ).collect()
    } == {
        (r.id, r.component)
        for r in connected_components(
            nodes, in_nodes, driver_max_edges=None
        ).collect()
    }


@pytest.mark.slow
def test_pagerank_storage_bounded_and_converges(spark):
    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id int")
    # ring + one dangling node (no out-edges) to exercise the dangling path
    edges = spark.createDataFrame(
        [(i, (i + 1) % (n - 1)) for i in range(n - 1)], "src int, dst int"
    )
    before = _storage_entries(spark)
    out = pagerank(nodes, edges, iters=12, checkpoint_every=5)
    total = out.agg(F.sum("rank").alias("s")).collect()[0]["s"]
    assert abs(total - 1.0) < 1e-9
    assert _settled_storage_delta(spark, before) <= 8


@pytest.mark.slow
def test_transitive_closure_storage_bounded(spark):
    # 18-deep chain → 17 iterations of frontier extension
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(18)], "parent string, child string"
    )
    before = _storage_entries(spark)
    out = transitive_closure(edges, max_iters=20, checkpoint_every=5)
    # closure of a chain of 19 nodes = 19*18/2 pairs
    assert out.count() == 19 * 18 // 2
    assert _settled_storage_delta(spark, before) <= 10


def _spark_plan(df) -> str:
    # pre-AQE physical plan: shows the join strategy Catalyst picked from
    # stats + hints (AQE may still convert at runtime — the point here is
    # whether WE forced a hint, not what AQE later decides)
    return df._jdf.queryExecution().sparkPlan().toString()


def test_broadcast_map_auto_respects_threshold(spark):
    fact = spark.range(0, 10000).select(F.col("id").alias("k"))
    mapping = spark.range(0, 100).select(
        F.col("id").alias("mk"), (F.col("id") * 2).alias("mv")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        auto_plan = _spark_plan(
            broadcast_map(fact, mapping, on=[("k", "mk")], value_col="mv",
                          out_col="v")
        )
        # auto must NOT override the user's threshold with a forced hint
        assert "BroadcastHashJoin" not in auto_plan
        forced_plan = _spark_plan(
            broadcast_map(fact, mapping, on=[("k", "mk")], value_col="mv",
                          out_col="v", broadcast=True)
        )
        assert "BroadcastHashJoin" in forced_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # under the normal threshold, stats on the tiny mapping still broadcast
    auto_small = _spark_plan(
        broadcast_map(fact, mapping, on=[("k", "mk")], value_col="mv",
                      out_col="v")
    )
    assert "BroadcastHashJoin" in auto_small


def test_fallback_map_auto_respects_threshold(spark):
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    m1 = spark.range(0, 50).select(F.col("id").alias("a"), F.lit("x").alias("v1"))
    m2 = spark.range(0, 50).select(F.col("id").alias("b"), F.lit("y").alias("v2"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _spark_plan(
            fallback_map(fact, [(m1, "a", "v1"), (m2, "b", "v2")],
                         key_col="k", out_col="hit")
        )
        assert "BroadcastHashJoin" not in plan
        plan_forced = _spark_plan(
            fallback_map(fact, [(m1, "a", "v1"), (m2, "b", "v2")],
                         key_col="k", out_col="hit", broadcast=True)
        )
        assert "BroadcastHashJoin" in plan_forced
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_textdedup_caches_released_after_gc(spark):
    """ngram/minhash near-dup intermediates must not pin storage for the
    session lifetime (ADVICE r01): materialization goes through non-eager
    localCheckpoint, whose blocks the ContextCleaner frees once the plan is
    garbage-collected. Since r07 a BOUNDED pin (operators/materialize.py,
    maxlen=8) holds the most recent pre-checkpoint plans so their SQLMetric
    accumulators survive late task completions (the BENCH_r06 noise fix) —
    eviction-or-flush, then GC, must still release everything."""
    from crossbar_data_process_spark.operators.materialize import flush_pins
    from crossbar_data_process_spark.operators.textdedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta tok{i % 7} epsilon zeta")
         for i in range(200)],
        "doc_id long, text string",
    )
    before = _storage_entries(spark)
    out = ngram_jaccard_pairs(docs, threshold=0.2)
    out.count()
    out2 = minhash_lsh_pairs(docs, threshold=0.2)
    out2.count()
    del out, out2
    flush_pins()
    assert _settled_storage_delta(spark, before) <= 0
