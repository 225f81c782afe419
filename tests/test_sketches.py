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
