"""Profiling + expectation gate (operators/profiling.py): DuckDB-checked
statistics and single-scan plan shape."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.profiling import (
    check_expectations,
    profile_table,
)

PATH = "/root/testdata/sf0.001/orders.parquet"


def test_profile_matches_duckdb(spark):
    df = spark.read.parquet(PATH)
    prof = {r.column: r for r in profile_table(df).collect()}
    want = duckdb.sql(
        f"""SELECT COUNT(*) AS n,
                   SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nulls,
                   COUNT(DISTINCT o_custkey) AS dist,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS mn,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS mx
            FROM read_parquet('{PATH}')"""
    ).fetchone()
    assert set(prof) == set(df.columns)
    for r in prof.values():
        assert r.n_rows == want[0]
    assert prof["o_orderpriority"].n_nulls == want[1]
    # HLL estimate within its documented tolerance of exact
    assert abs(prof["o_custkey"].n_distinct_approx - want[2]) / want[2] < 0.1
    assert prof["o_orderkey"].min == want[3]
    assert prof["o_orderkey"].max == want[4]
    assert prof["o_orderkey"].n_nulls == 0 and prof["o_orderkey"].null_ratio == 0.0


def test_expectations_gate(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", -3), (3, None, 10), (4, "d", None)],
        "id long, name string, qty int",
    )
    report = {
        r.rule: (r.n_violations, r["pass"])
        for r in check_expectations(
            df,
            {
                "id_positive": F.col("id") > 0,
                "name_not_null": F.col("name").isNotNull(),
                "qty_non_negative": F.col("qty") >= 0,  # NULL qty = violation
            },
        ).collect()
    }
    assert report == {
        "id_positive": (0, True),
        "name_not_null": (1, False),
        "qty_non_negative": (2, False),  # -3 and the NULL
    }


def test_expectations_single_scan(spark):
    """All rules fold into ONE aggregation job over one scan — the plan has
    exactly one Exchange (the global agg) no matter how many rules."""
    df = spark.read.parquet(PATH)
    rules = {f"r{i}": F.col("o_orderkey") >= i for i in range(12)}
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((~F.coalesce(c, F.lit(False))).cast("long")).alias(f"__viol_{n}")
        for n, c in rules.items()
    ]
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial+final of one agg
