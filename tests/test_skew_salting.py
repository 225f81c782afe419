"""Salting operators (operators/skew.py): semantics identical to the
unsalted forms, salt visible in the physical join keys, deterministic."""

from __future__ import annotations

import pytest
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


def test_salted_join_rejects_small_side_preserving_how(spark):
    """'right'/'full' would emit each unmatched small-side row salt× —
    rejected up front (ADVICE r03)."""
    big = spark.createDataFrame([("k", 1)], "k string, v int")
    small = spark.createDataFrame([("k", 9)], "k string, w int")
    for how in ("right", "full", "rightouter", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on=["k"], how=how)


def _skewed_fixture(spark, n=20_000, hot_frac=0.5, n_keys=64):
    """One key ('hot') holds ~half the rows; the rest spread uniformly."""
    n_hot = int(n * hot_frac)
    df = spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"N{i}") for i in range(n_keys)],
        "k string, name string",
    )
    return df, dim


def _max_partition_frac(df, *cols):
    """Fraction of all rows landing in the fullest hash partition when
    shuffled on ``cols`` — the max-task skew a shuffle-hash join on those
    keys would see."""
    sizes = [
        r.n
        for r in df.repartition(32, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return max(sizes) / sum(sizes)


def test_salted_join_spreads_hot_key(spark):
    """VERDICT r03 #5: on a 50%-hot-key fixture the salted join's shuffle
    partitioning spreads the hot key across ``salt`` reducers — max-task
    share drops from ~half of all rows to ~1/salt of that — while the join
    result is row-for-row identical to the unsalted join."""
    big, dim = _skewed_fixture(spark)
    salt = 8

    # semantics: identical multiset of output rows
    plain = big.join(dim, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(big, dim, ["k"], salt=salt).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }

    # skew: measure the big side's shuffle partitioning as the join sees it
    from crossbar_data_process_spark.operators.skew import _SALT

    salted_big = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    unsalted_frac = _max_partition_frac(big, "k")
    salted_frac = _max_partition_frac(salted_big, "k", _SALT)
    assert unsalted_frac >= 0.45  # the hot key really dominates one task
    # spreading over `salt` reducers should cut the max task substantially
    assert salted_frac < unsalted_frac / 2, (unsalted_frac, salted_frac)


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


def test_salt_cols_subset_is_semantics_preserving(spark):
    """salt_cols (hash only a couple of per-row-varying columns instead
    of the whole wide row) must not change the join result."""
    from pyspark.sql import functions as F

    from crossbar_data_process_spark.operators.skew import salted_join

    big = spark.range(500).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("rowid"),
        F.concat(F.lit("pad_"), F.col("id")).alias("wide1"),
        (F.col("id") * 7).alias("wide2"),
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {
        tuple(r)
        for r in salted_join(
            big, small, on=["k"], salt=8, salt_cols=["rowid"]
        ).collect()
    }
    assert salted == plain
