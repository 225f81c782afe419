"""Golden test for the TF–gene adapter (plans/tf_gen.py; FIXTURES.md F9):
COMPLEX fan-out, mapping drops, X5 group resolution and the pairwise
effect_resolve coalescer across sources."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crossbar_data_process_spark.plans.tf_gen import (
    collectri_process,
    merge_tf_gen,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    interactions = spark.createDataFrame(
        [
            # COMPLEX fans out to two members; one member unmapped -> drops
            Row(tf="COMPLEX:P1_P9", target="P3", pubmed="11;12", effect=1),
            # same pair again with Unknown -> {Activation, Unknown} -> Activation
            Row(tf="P1", target="P3", pubmed="13", effect=0),
            # conflicting pair -> NULL -> dropped
            Row(tf="P2", target="P3", pubmed=None, effect=1),
            Row(tf="P2", target="P3", pubmed="14", effect=-1),
            # plain repression pair
            Row(tf="P2", target="P4", pubmed="15", effect=-1),
        ]
    )
    u2e = spark.createDataFrame(
        [
            Row(uniprot="P1", entrez="101"),
            Row(uniprot="P2", entrez="102"),
            Row(uniprot="P3", entrez="103"),
            Row(uniprot="P4", entrez="104"),
            # P9 intentionally unmapped
        ]
    )
    return interactions, u2e


def test_collectri_process(spark, fixtures):
    interactions, u2e = fixtures
    out = {(r.tf, r.target): r for r in collectri_process(interactions, u2e).collect()}
    # P9 member dropped (unmapped); (101,103) = {Activation via complex,
    # Unknown} -> Activation with pubmed union; (102,103) conflict dropped
    assert set(out) == {("101", "103"), ("102", "104")}
    a = out[("101", "103")]
    assert a.tf_effect == "Activation"
    assert a.pubmed_ids == ["11", "12", "13"]
    assert a.source == ["CollecTRI"]
    assert out[("102", "104")].tf_effect == "Repression"


def test_merge_tf_gen(spark, fixtures):
    interactions, u2e = fixtures
    collectri = collectri_process(interactions, u2e)
    dorothea = spark.createDataFrame(
        [
            # agrees with collectri on (101,103)
            Row(tf="101", target="103", tf_effect="Unknown",
                dorothea_confidence="A"),
            # conflicts with collectri's Repression on (102,104) -> dropped
            Row(tf="102", target="104", tf_effect="Activation",
                dorothea_confidence="B"),
            # dorothea-only pair
            Row(tf="105", target="106", tf_effect="Repression",
                dorothea_confidence="C"),
        ]
    ).withColumn("source", F.array(F.lit("DoRothEA"))).withColumn(
        "pubmed_ids", F.lit(None).cast("array<string>")
    )
    trrust = spark.createDataFrame(
        [Row(tf="105", target="106", tf_effect="Repression",
             trrust_pmid="16")]
    ).withColumn("source", F.array(F.lit("TRRUST")))

    merged = {(r.tf, r.target): r for r in
              merge_tf_gen(dorothea, collectri, trrust).collect()}
    assert set(merged) == {("101", "103"), ("105", "106")}
    a = merged[("101", "103")]
    # Unknown (dorothea) + Activation (collectri) -> Activation;
    # source order follows merge order (dorothea first)
    assert a.tf_effect == "Activation"
    assert a.source == ["DoRothEA", "CollecTRI"]
    assert a.dorothea_confidence == "A"
    b = merged[("105", "106")]
    assert b.tf_effect == "Repression"
    assert b.source == ["DoRothEA", "TRRUST"]
    assert b.trrust_pmid == "16"
