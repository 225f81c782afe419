"""EC hierarchy derivation tests (FIXTURES.md F8 EC variant; reference
ec.py:274-313): 4-level dotted codes with '-' placeholders, tombstone
exclusion, full-chain closure via the generic transitive_closure."""

from __future__ import annotations

from pyspark.sql import Row

from crossbar_data_process_spark.functions.ec import ec_hierarchy_edges
from crossbar_data_process_spark.graph.hierarchy import transitive_closure


def test_ec_hierarchy_edges(spark):
    df = spark.createDataFrame(
        [
            Row(ec="1.-.-.-", name="Oxidoreductases"),
            Row(ec="1.1.-.-", name="Acting on CH-OH"),
            Row(ec="1.1.1.-", name="With NAD+"),
            Row(ec="1.1.1.1", name="Alcohol dehydrogenase"),
            Row(ec="2.7.-.-", name="Transferring phosphorus"),
            Row(ec="1.1.1.2", name="Transferred entry: 1.1.1.1"),
            Row(ec="3.4.21.1", name="Deleted"),
        ]
    )
    edges = {
        (r.child, r.parent, r.level) for r in ec_hierarchy_edges(df).collect()
    }
    assert edges == {
        ("1.1.-.-", "1.-.-.-", 2),
        ("1.1.1.-", "1.1.-.-", 3),
        ("1.1.1.1", "1.1.1.-", 4),
        ("2.7.-.-", "2.-.-.-", 2),
    }


def test_ec_closure_ancestors(spark):
    df = spark.createDataFrame(
        [
            Row(ec="1.-.-.-", name="L1"),
            Row(ec="1.1.-.-", name="L2"),
            Row(ec="1.1.1.-", name="L3"),
            Row(ec="1.1.1.1", name="L4"),
        ]
    )
    edges = ec_hierarchy_edges(df).select(
        "parent", "child"
    )
    closure = transitive_closure(edges, "parent", "child")
    anc = {
        r.ancestor
        for r in closure.filter(closure.descendant == "1.1.1.1").collect()
    }
    assert anc == {"1.1.1.-", "1.1.-.-", "1.-.-.-"}
