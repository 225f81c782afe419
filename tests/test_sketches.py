"""Approximate/sketch aggregates (SURVEY §2.4 'not present in reference,
free in Spark'): HLL++ distinct counts and quantile sketches — sanity-bound
against exact answers on the driver tables. These are the scale path where
exact distinct/quantile would shuffle too much state."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.select(
        F.median("l_extendedprice").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


# ------------------------------------------------- mergeable sketch silver
def test_sketch_silver_rollup_matches_exact(spark):
    """Build the fine-grained sketch table once, then answer three coarser
    questions purely from it — each within HLL tolerance of the exact
    answer computed from raw data."""
    from crossbar_data_process_spark.operators.sketches import (
        distinct_sketch_table,
        rollup_distinct,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(
        li, ["l_returnflag", "l_linestatus"], "l_partkey"
    ).localCheckpoint()

    def exact(keys):
        if keys:
            return {
                tuple(r[k] for k in keys): r.n
                for r in li.groupBy(*keys)
                .agg(F.countDistinct("l_partkey").alias("n"))
                .collect()
            }
        return {(): li.select(F.countDistinct("l_partkey")).collect()[0][0]}

    for keys in (["l_returnflag", "l_linestatus"], ["l_returnflag"], []):
        got = {
            tuple(r[k] for k in keys): r.distinct_est
            for r in (
                rollup_distinct(silver, keys).collect()
                if keys
                else [rollup_distinct(silver, []).collect()[0]]
            )
        }
        want = exact(keys)
        assert set(got) == set(want)
        for cell in want:
            assert abs(got[cell] - want[cell]) / max(want[cell], 1) < 0.05, (
                keys, cell, got[cell], want[cell],
            )


def test_sketch_union_is_order_independent(spark):
    """Merging is commutative/associative: rollups from a shuffled,
    re-partitioned silver table give the identical estimate."""
    from crossbar_data_process_spark.operators.sketches import (
        distinct_sketch_table,
        rollup_distinct,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    a = rollup_distinct(silver.repartition(1), []).collect()[0].distinct_est
    b = rollup_distinct(silver.repartition(7), []).collect()[0].distinct_est
    assert a == b


def test_sketch_rows_not_resent(spark):
    """The silver row count is bounded by the key-space cardinality — the
    whole point: rollups read cells, not corpus rows."""
    from crossbar_data_process_spark.operators.sketches import distinct_sketch_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    silver = distinct_sketch_table(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    assert silver.count() <= 6  # 3 flags x 2 statuses in TPC-H
