"""Golden tests for the orthology, side-effect, and phenotype adapters —
completing the reference adapter inventory."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from crossbar_data_process_spark.plans.orthology import (
    merge_orthology,
    oma_process,
)
from crossbar_data_process_spark.plans.phenotype import hpo_disease_process
from crossbar_data_process_spark.plans.side_effect import merge_drug_side_effect


def test_oma_process_and_merge(spark):
    oma = spark.createDataFrame(
        [
            Row(entry_a="A_HUMAN", entry_b="B_MOUSE", relation_type="1:1",
                score=87.6),
            # reciprocal with lower score -> deduped away
            Row(entry_a="B_MOUSE", entry_b="A_HUMAN", relation_type="1:1",
                score=50.2),
            Row(entry_a="A_HUMAN", entry_b="C_RAT", relation_type="1:n",
                score=33.3),
            # unmapped entry name -> dropped
            Row(entry_a="Z_FLY", entry_b="A_HUMAN", relation_type="1:1",
                score=99.0),
        ]
    )
    n2u = spark.createDataFrame(
        [Row(entry_name="A_HUMAN", uniprot="P1"),
         Row(entry_name="B_MOUSE", uniprot="P2"),
         Row(entry_name="C_RAT", uniprot="P3")]
    )
    u2e = spark.createDataFrame(
        [Row(uniprot="P1", entrez="1"), Row(uniprot="P2", entrez="2"),
         Row(uniprot="P3", entrez="3")]
    )
    out = {(r.entrez_a, r.entrez_b): r
           for r in oma_process(oma, n2u, u2e).collect()}
    assert set(out) == {("1", "2"), ("1", "3")}
    assert out[("1", "2")].oma_orthology_score == 88  # round(87.6)

    pypath_orth = spark.createDataFrame(
        [Row(entrez_a="1", entrez_b="2", pypath_relation="ortholog")]
    ).withColumn("source", F.array(F.lit("pypath")))
    merged = {(r.entrez_a, r.entrez_b): r
              for r in merge_orthology(
                  oma_process(oma, n2u, u2e), pypath_orth
              ).collect()}
    assert merged[("1", "2")].source == ["OMA", "pypath"]
    assert merged[("1", "3")].source == ["OMA"]


def test_merge_drug_side_effect(spark):
    adrecs = spark.createDataFrame(
        [Row(drugbank_id="DB1", meddra_id="M1", adrecs_freq="12.5%")]
    ).withColumnRenamed("adrecs_freq", "frequency")
    sider = spark.createDataFrame(
        [Row(drugbank_id="DB1", meddra_id="M1"),
         Row(drugbank_id="DB2", meddra_id="M2"),
         Row(drugbank_id="DB2", meddra_id="M2")]  # dup -> A3 dedup
    )
    offsides = spark.createDataFrame(
        [Row(drugbank_id="DB2", meddra_id="M2", proportional_reporting_ratio=2.1)]
    )
    out = {(r.drugbank_id, r.meddra_id): r
           for r in merge_drug_side_effect(adrecs, sider, offsides).collect()}
    assert len(out) == 2
    assert out[("DB1", "M1")].source == ["ADReCS", "SIDER"]
    assert out[("DB1", "M1")].frequency == 12.5
    assert out[("DB2", "M2")].source == ["SIDER", "OffSides"]
    assert out[("DB2", "M2")].proportional_reporting_ratio == 2.1


def test_hpo_disease_process(spark):
    hpo = spark.createDataFrame(
        [
            Row(hpo_id="HP:1", omim="OMIM:100", pmid="PMID:1;PMID:2",
                evidence="PCS"),
            Row(hpo_id="HP:1", omim="OMIM:100", pmid="PMID:3",
                evidence="TAS"),
            Row(hpo_id="HP:1", omim="OMIM:100", pmid=None, evidence="IEA"),
            Row(hpo_id="HP:2", omim="ORPHA:55", pmid=None, evidence="PCS"),
            Row(hpo_id="HP:3", omim="OMIM:999", pmid=None, evidence="PCS"),
        ]
    )
    o2m = spark.createDataFrame([Row(omim="100", mondo="MONDO:0001")])
    out = {(r.hpo_id, r.disease_id): r
           for r in hpo_disease_process(hpo, o2m).collect()}
    # ORPHA row dropped (not OMIM), OMIM:999 unmapped, IEA blacklisted
    assert set(out) == {("HP:1", "MONDO:0001")}
    r = out[("HP:1", "MONDO:0001")]
    assert r.pubmed_ids == ["1", "2", "3"]
    assert r.evidence == "PCS"
