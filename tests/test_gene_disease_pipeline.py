"""Golden test for the gene–disease merge tree (plans/gene_disease.py;
FIXTURES.md F5): seven overlapping sources, X4 unions over source /
variant_source / dbsnp_id, per-source scores passing through."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.plans.gene_disease import merge_gene_disease


@pytest.fixture(scope="module")
def gda_sources(spark):
    mk = lambda rows: spark.createDataFrame(rows)  # noqa: E731
    return {
        "opentargets": mk(
            [Row(gene_id="G1", disease_id="MONDO:1", opentargets_score=0.9),
             Row(gene_id="G2", disease_id="MONDO:2", opentargets_score=0.4)]
        ),
        "diseases_knowledge": mk(
            [Row(gene_id="G1", disease_id="MONDO:1",
                 diseases_confidence_score=3.5)]
        ),
        "diseases_experimental": mk(
            [Row(gene_id="G1", disease_id="MONDO:1",
                 diseases_confidence_score=2.0),
             Row(gene_id="G3", disease_id="MONDO:3",
                 diseases_confidence_score=1.1)]
        ),
        "kegg": mk([Row(gene_id="G2", disease_id="MONDO:2")]),
        "clinvar": mk(
            [Row(gene_id="G1", disease_id="MONDO:1",
                 clinical_significance="Pathogenic", review_status=2,
                 dbsnp_id="rs1", variant_source="ClinVar")]
        ),
        "humsavar": mk(
            [Row(gene_id="G1", disease_id="MONDO:1", dbsnp_id="rs2",
                 variant_source="UniProt")]
        ),
        "disgenet_gda": mk(
            [Row(gene_id="G1", disease_id="MONDO:1",
                 disgenet_gene_disease_score=0.7),
             Row(gene_id="G4", disease_id="MONDO:4",
                 disgenet_gene_disease_score=0.2)]
        ),
        "disgenet_vda": mk(
            [Row(gene_id="G1", disease_id="MONDO:1",
                 disgenet_variant_disease_score=0.6, dbsnp_id="rs1")]
        ),
    }


def test_merge_gene_disease(spark, gda_sources):
    out = merge_gene_disease(gda_sources)
    rows = {(r.gene_id, r.disease_id): r for r in out.collect()}
    assert set(rows) == {("G1", "MONDO:1"), ("G2", "MONDO:2"),
                         ("G3", "MONDO:3"), ("G4", "MONDO:4")}

    g1 = rows[("G1", "MONDO:1")]
    # source union in merge-tree order: opentargets, then the diseases
    # pair (knowledge before experimental), then clinvar/humsavar, then
    # the disgenet pair
    assert g1.source == [
        "opentargets", "diseases_knowledge", "diseases_experimental",
        "clinvar", "humsavar", "disgenet_gda", "disgenet_vda",
    ]
    # knowledge score wins first-non-null within the diseases pair
    assert g1.diseases_confidence_score == 3.5
    assert g1.opentargets_score == 0.9
    assert g1.disgenet_gene_disease_score == 0.7
    assert g1.disgenet_variant_disease_score == 0.6
    # X4 unions: dbsnp rs1 appears in clinvar and disgenet_vda — deduped,
    # first occurrence order preserved
    assert g1.dbsnp_id == ["rs1", "rs2"]
    assert g1.variant_source == ["ClinVar", "UniProt"]

    g2 = rows[("G2", "MONDO:2")]
    assert g2.source == ["opentargets", "kegg"]
    assert g2.dbsnp_id is None

    assert rows[("G3", "MONDO:3")].source == ["diseases_experimental"]
    assert rows[("G4", "MONDO:4")].source == ["disgenet_gda"]


def test_merge_gene_disease_subset_of_sources(spark, gda_sources):
    # the reference gates sources on edge_types config — merging any subset
    # must work and keep the same reconciliation semantics
    subset = {k: gda_sources[k] for k in ("kegg", "humsavar")}
    out = merge_gene_disease(subset)
    rows = {(r.gene_id, r.disease_id): r for r in out.collect()}
    assert set(rows) == {("G2", "MONDO:2"), ("G1", "MONDO:1")}
    assert rows[("G1", "MONDO:1")].source == ["humsavar"]
