"""Golden test for the pathway adapter: U1 unions, the disease-pathway
merge, and the derived-key equivalents of the reference's O(n²) loops."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from crossbar_data_process_spark.plans.pathway import (
    equivalent_kegg_pathways,
    equivalent_reactome_pathways,
    merge_disease_pathway,
    union_pathway_edges,
)


def test_union_pathway_edges(spark):
    kegg = spark.createDataFrame(
        [Row(protein="P1", pathway_id="hsa00010", source="KEGG")]
    )
    reactome = spark.createDataFrame(
        [Row(protein="P1", pathway_id="R-HSA-70171", source="Reactome",
             evidence="TAS")]
    )
    out = union_pathway_edges(kegg, reactome)
    assert out.count() == 2
    assert set(out.columns) == {"protein", "pathway_id", "source", "evidence"}


def test_merge_disease_pathway(spark):
    kegg = spark.createDataFrame(
        [Row(disease_id="MONDO:1", pathway_id="hsa05200")]
    ).withColumn("source", F.array(F.lit("KEGG")))
    ctd = spark.createDataFrame(
        [Row(disease_id="MONDO:1", pathway_id="hsa05200"),
         Row(disease_id="MONDO:2", pathway_id="R-HSA-1")]
    ).withColumn("source", F.array(F.lit("CTD")))
    out = {(r.disease_id, r.pathway_id): r
           for r in merge_disease_pathway(kegg, ctd).collect()}
    assert out[("MONDO:1", "hsa05200")].source == ["KEGG", "CTD"]
    assert out[("MONDO:2", "R-HSA-1")].source == ["CTD"]


def test_equivalent_kegg_pathways(spark):
    p = spark.createDataFrame(
        [Row(pathway_id="hsa00010"), Row(pathway_id="mmu00010"),
         Row(pathway_id="hsa00020")]
    )
    pairs = {(r.src, r.dst) for r in equivalent_kegg_pathways(p).collect()}
    assert pairs == {
        ("kegg.pathway:hsa00010", "kegg.pathway:mmu00010"),
        ("kegg.pathway:mmu00010", "kegg.pathway:hsa00010"),
    }


def test_equivalent_reactome_pathways(spark):
    p = spark.createDataFrame(
        [Row(pathway_id="R-HSA-70171"), Row(pathway_id="R-MMU-70171"),
         Row(pathway_id="R-HSA-99999")]
    )
    pairs = {(r.src, r.dst) for r in equivalent_reactome_pathways(p).collect()}
    assert pairs == {
        ("kegg.pathway:R-HSA-70171", "kegg.pathway:R-MMU-70171"),
        ("kegg.pathway:R-MMU-70171", "kegg.pathway:R-HSA-70171"),
    }
