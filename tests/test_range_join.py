"""Bucketed range join (operators/rangejoin.py): exact containment
semantics vs a naive reference, dedup-free by construction, and the plan
property the operator exists for — an equi-join shuffle on the bucket id,
never a nested loop or cartesian."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.rangejoin import (
    bucketed_range_join,
)


def _frames(spark, pts, ivs):
    p = spark.createDataFrame([(i, float(v)) for i, v in enumerate(pts)],
                              "pid long, v double")
    iv = spark.createDataFrame(
        [(j, float(lo), float(hi)) for j, (lo, hi) in enumerate(ivs)],
        "iid long, lo double, hi double",
    )
    return p, iv


def _naive(pts, ivs):
    return {
        (i, j)
        for i, v in enumerate(pts)
        for j, (lo, hi) in enumerate(ivs)
        if lo <= hi and lo <= v <= hi
    }


def test_inner_matches_naive_and_is_dedup_free(spark):
    pts = [0.5, 3.0, 7.2, -2.5, 10.0]
    # intervals spanning multiple buckets, nested, negative, degenerate
    ivs = [(0.0, 8.0), (2.9, 3.1), (-5.0, -1.0), (9.0, 9.5), (4.0, 2.0)]
    p, iv = _frames(spark, pts, ivs)
    rows = bucketed_range_join(p, iv, "v", "lo", "hi", bucket_width=1.0).collect()
    got = [(r.pid, r.iid) for r in rows]
    assert sorted(got) == sorted(_naive(pts, ivs))  # no duplicates, exact set


def test_left_keeps_unmatched_points(spark):
    p, iv = _frames(spark, [1.0, 100.0], [(0.0, 2.0)])
    out = {r.pid: r.iid for r in bucketed_range_join(
        p, iv, "v", "lo", "hi", 1.0, how="left").collect()}
    assert out == {0: 0, 1: None}


def test_plan_is_equi_join_not_nested_loop(spark):
    p, iv = _frames(spark, [1.0, 2.0], [(0.0, 5.0)])
    plan = (
        bucketed_range_join(p, iv, "v", "lo", "hi", 1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__rj_bucket" in plan  # the join really keys on the bucket


def test_left_plan_is_equi_join_not_nested_loop(spark):
    """The left form's key claim: same single equi join (bucket key drives
    the shuffle, BETWEEN rides as residual), no second scan of points, no
    nested loop."""
    p, iv = _frames(spark, [1.0, 2.0], [(0.0, 5.0)])
    plan = (
        bucketed_range_join(p, iv, "v", "lo", "hi", 1.0, how="left")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__rj_bucket" in plan
    # exactly one (equi) join operator → points scanned once
    n_joins = sum(
        plan.count(op)
        for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1, plan


def test_rejects_reserved_internal_names(spark):
    p = spark.createDataFrame([(1, 1.0, 5)], "pid long, v double, __rj_bucket int")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="internal bucket"):
        bucketed_range_join(p, iv, "v", "lo", "hi", 1.0)


def test_rejects_overlapping_schemas_and_bad_width(spark):
    p = spark.createDataFrame([(1, 1.0)], "pid long, v double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "pid long, lo double, hi double")
    with pytest.raises(ValueError, match="share column names"):
        bucketed_range_join(p, iv, "v", "lo", "hi", 1.0)
    iv2 = iv.withColumnRenamed("pid", "iid")
    with pytest.raises(ValueError, match="positive"):
        bucketed_range_join(p, iv2, "v", "lo", "hi", 0.0)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    pts=st.lists(st.integers(-20, 20), min_size=1, max_size=8),
    ivs=st.lists(
        st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
        min_size=1, max_size=6,
    ),
    width=st.sampled_from([0.5, 1.0, 3.0, 10.0]),
)
def test_property_matches_naive(spark, pts, ivs, width):
    p, iv = _frames(spark, pts, ivs)
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(p, iv, "v", "lo", "hi", width).collect()
    )
    assert got == sorted(_naive(pts, ivs))


# ---------- generalized backward as-of join (union + window, one shuffle)


def _naive_asof(lefts, rights, allow_exact):
    """Per-row reference: latest right (ts, value) strictly before (or at,
    when allow_exact) each left ts, same key."""
    out = {}
    for lid, key, lts in lefts:
        best = None
        for rkey, rts, val in rights:
            if rkey != key:
                continue
            if rts < lts or (allow_exact and rts == lts):
                if best is None or rts > best[0]:
                    best = (rts, val)
        out[lid] = best
    return out


@pytest.mark.parametrize("allow_exact", [False, True])
def test_asof_join_matches_naive(spark, allow_exact):
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    lefts = [  # (lid, key, ts)
        (1, "u1", 10.0), (2, "u1", 20.0), (3, "u1", 5.0),
        (4, "u2", 10.0), (5, "u3", 50.0),  # u3 has no right rows
        (6, "u1", 15.0),
    ]
    rights = [  # (key, ts, value)
        ("u1", 5.0, 100.0), ("u1", 15.0, 200.0), ("u2", 10.0, 300.0),
        ("u2", 2.0, 400.0),
    ]
    ldf = spark.createDataFrame(lefts, "lid long, key string, lts double")
    rdf = spark.createDataFrame(rights, "key string, rts double, val double")
    got = {
        r.lid: (r.matched_rts, r.val)
        for r in asof_join(
            ldf, rdf, by="key", left_ts="lts", right_ts="rts",
            value_cols=["val"], allow_exact=allow_exact,
        ).collect()
    }
    expect = _naive_asof(lefts, rights, allow_exact)
    assert set(got) == set(expect)  # every left row survives
    for lid, best in expect.items():
        assert got[lid] == (best if best else (None, None)), (lid, allow_exact)


def test_asof_join_single_shuffle_no_join_operator(spark):
    """The claimed plan: union + one window exchange on the key — no join
    node at all."""
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    ldf = spark.createDataFrame([(1, "a", 1.0)], "lid long, key string, lts double")
    rdf = spark.createDataFrame([("a", 0.5, 9.0)], "key string, rts double, val double")
    plan = (
        asof_join(ldf, rdf, "key", "lts", "rts", ["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, op
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_value_cols_come_from_one_row(spark):
    """All value columns + matched_ts must come from the SAME right row:
    a NULL in one value column of the latest preceding right row must NOT
    be backfilled from an older row (per-column windows would mix rows)."""
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    ldf = spark.createDataFrame([(1, "a", 10.0)], "lid long, key string, lts double")
    rdf = spark.createDataFrame(
        [("a", 1.0, 100.0, "old"), ("a", 5.0, None, "new")],
        "key string, rts double, x double, tag string",
    )
    row = asof_join(
        ldf, rdf, by="key", left_ts="lts", right_ts="rts",
        value_cols=["x", "tag"],
    ).collect()[0]
    # latest preceding row is (5.0, NULL, 'new') — taken atomically
    assert row.matched_rts == 5.0
    assert row.x is None
    assert row.tag == "new"


def test_asof_join_ignores_null_right_ts(spark):
    """Right rows with NULL right_ts are unknowable under the as-of
    predicate: they must never match (previously NULLS FIRST ordering made
    them propagate to every left row)."""
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    ldf = spark.createDataFrame([(1, "a", 10.0)], "lid long, key string, lts double")
    rdf = spark.createDataFrame(
        [("a", None, 999.0)], "key string, rts double, val double"
    )
    row = asof_join(
        ldf, rdf, by="key", left_ts="lts", right_ts="rts", value_cols=["val"]
    ).collect()[0]
    assert row.val is None and row.matched_rts is None


def test_asof_join_rejects_reserved_column_names(spark):
    from crossbar_data_process_spark.operators.rangejoin import asof_join

    rdf = spark.createDataFrame([("a", 1.0, 2.0)], "key string, rts double, val double")
    bad = spark.createDataFrame(
        [(1, "a", 1.0, 0)], "lid long, key string, lts double, __ts int"
    )
    with pytest.raises(ValueError, match="internal"):
        asof_join(bad, rdf, "key", "lts", "rts", ["val"])
    clash = spark.createDataFrame(
        [(1, "a", 1.0, 0.0)], "lid long, key string, lts double, matched_rts double"
    )
    with pytest.raises(ValueError, match="internal"):
        asof_join(clash, rdf, "key", "lts", "rts", ["val"])
