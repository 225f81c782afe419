"""Bucketing evidence for the scale story (SURVEY §7.1: "bucketed gold
tables on join keys"): two tables bucketed+sorted on the merge key join
WITHOUT any shuffle exchange — at 100 TB this removes the dominant cost of
the reference's merge chains. Asserted on the physical plan."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark):
    tmp = tempfile.mkdtemp(prefix="bucketed_wh_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)
    for t in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")

    (
        orders.write.mode("overwrite")
        .option("path", f"{warehouse}/orders_bkt")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
    )
    (
        lineitem.write.mode("overwrite")
        .option("path", f"{warehouse}/lineitem_bkt")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bkt")
    )

    o = spark.table("orders_bkt")
    li = spark.table("lineitem_bkt")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the invariant that matters at scale: neither join side is re-shuffled
    # on the key (bucket layout is the partitioning); AQE may still choose
    # broadcast for a tiny side — equally shuffle-free
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan

    # and it computes the right thing
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expected.collect())
    )
