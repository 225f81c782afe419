"""Salting operators (operators/skew.py): semantics identical to the
unsalted forms, salt visible in the physical join keys, deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.skew import (
    salted_collect_set,
    salted_join,
)

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_unsalted(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    s = spark.read.parquet(f"{SF}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(s, ["l_suppkey"]).groupBy("l_suppkey").count()
    salted = salted_join(li, s, ["l_suppkey"], salt=4).groupBy("l_suppkey").count()
    assert {(r.l_suppkey, r["count"]) for r in plain.collect()} == {
        (r.l_suppkey, r["count"]) for r in salted.collect()
    }


def test_salted_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "z")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(big, small, ["k"], how="left", salt=4).collect()
    assert len(out) == 4  # row multiplicity preserved, no dup matches
    by_v = {r.v: r.name for r in out}
    assert by_v["a"] == "one" and by_v["z"] is None


def test_salt_in_physical_join_keys(spark):
    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    plan = (
        salted_join(big, small, ["k"], salt=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan  # the join really is keyed on (k, __salt)


def test_salted_collect_set_matches_unsalted(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    plain = {
        r.o_custkey: sorted(r.vals)
        for r in o.groupBy("o_custkey")
        .agg(F.collect_set("o_orderpriority").alias("vals"))
        .collect()
    }
    salted = {
        r.o_custkey: list(r.vals)
        for r in salted_collect_set(
            o, ["o_custkey"], "o_orderpriority", out_col="vals", salt=4
        ).collect()
    }
    assert plain == salted
