"""Snapshot diff (operators/diff.py): add/remove/change classification,
NULL-safe comparison, changed-column attribution, and a DuckDB
cross-check on the real tables."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.diff import diff_snapshots


def test_diff_classifies_and_attributes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, name string, val int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 41), (5, "e", 50)],
        "id long, name string, val int",
    )
    got = {
        r.id: (r.change, sorted(r.changed_cols))
        for r in diff_snapshots(old, new, ["id"]).collect()
    }
    assert got == {
        1: ("removed", []),
        2: ("unchanged", []),
        3: ("changed", ["val"]),       # NULL -> 30 counts as a change
        4: ("changed", ["name", "val"]),
        5: ("added", []),
    }


def test_diff_compare_subset_and_composite_key(spark):
    old = spark.createDataFrame(
        [(1, "x", "keep", "noise1")], "a int, b string, watched string, ignored string"
    )
    new = spark.createDataFrame(
        [(1, "x", "keep", "noise2")], "a int, b string, watched string, ignored string"
    )
    [r] = diff_snapshots(old, new, ["a", "b"], compare=["watched"]).collect()
    assert (r.a, r.b, r.change) == (1, "x", "unchanged")


def test_diff_matches_duckdb_on_real_tables(spark):
    """Perturb sf0.001 orders (drop some, modify some, add some) and check
    the classification against an independent DuckDB diff."""
    path = "/root/testdata/sf0.001/orders.parquet"
    old = spark.read.parquet(path)
    new = (
        old.filter(F.col("o_orderkey") % 10 != 0)  # remove 10%
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("Z")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 10 == 3).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    got = (
        diff_snapshots(old, new, ["o_orderkey"], compare=["o_orderstatus"])
        .groupBy("change")
        .count()
    )
    counts = {r.change: r["count"] for r in got.collect()}
    want = dict(
        duckdb.sql(
            f"""
            WITH o AS (SELECT * FROM read_parquet('{path}')),
            n AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'Z'
                          ELSE o_orderstatus END AS o_orderstatus
              FROM o WHERE o_orderkey % 10 <> 0
              UNION ALL
              SELECT o_orderkey + 10000000 AS o_orderkey, o_orderstatus
              FROM o WHERE o_orderkey % 10 = 3)
            SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                          THEN 'changed'
                        ELSE 'unchanged' END AS change, COUNT(*) AS c
            FROM o FULL OUTER JOIN n USING (o_orderkey) GROUP BY 1
            """
        ).fetchall()
    )
    assert counts == want
