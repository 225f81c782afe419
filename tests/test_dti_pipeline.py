"""Golden test for the six-way DTI merge (plans/dti.py) on FIXTURES.md
F4-shaped fixtures: every coalescer (X3 references union, X4 source union,
X7 first-non-null) must fire across overlapping pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.plans.dti import merge_all_dtis


@pytest.fixture(scope="module")
def dti_sources(spark):
    drugbank = spark.createDataFrame(
        [
            Row(drugbank_id="DB1", uniprot_id="P1",
                mechanism_of_action_type="Inhibitor", references="r1|r2",
                known_action="yes"),
            Row(drugbank_id="DB2", uniprot_id="P2",
                mechanism_of_action_type=None, references=None,
                known_action="unknown"),
        ]
    )
    chembl = spark.createDataFrame(
        [
            # overlaps DB1/P1: references union fires, moa first-non-null
            # keeps drugbank's (lower-cased)
            Row(drugbank_id="DB1", uniprot_id="P1", pchembl=7.2,
                activity_value=12.0, activity_type="IC50",
                references="r2|r3", confidence_score=9,
                direct_interaction=True, disease_efficacy=False,
                mechanism_of_action_type="Antagonist"),
            Row(drugbank_id="DB3", uniprot_id="P3", pchembl=6.1,
                activity_value=40.0, activity_type="Ki",
                references="r4", confidence_score=7,
                direct_interaction=False, disease_efficacy=True,
                mechanism_of_action_type="Agonist"),
        ]
    )
    pharos = spark.createDataFrame(
        [
            # overlaps DB1/P1 with a different pchembl: chembl's wins
            # (left-to-right priority); overlaps DB3/P3 activity_type:
            # chembl's Ki wins
            Row(drugbank_id="DB1", uniprot_id="P1", activity_type="EC50",
                mechanism_of_action_type="Blocker", pchembl=5.0,
                references="r5"),
            Row(drugbank_id="DB3", uniprot_id="P3", activity_type="Kd",
                mechanism_of_action_type=None, pchembl=None,
                references=None),
        ]
    )
    dgidb = spark.createDataFrame(
        [
            Row(drugbank_id="DB2", uniprot_id="P2",
                mechanism_of_action_type="Modulator", dgidb_score=0.8,
                references="r6|r1"),
        ]
    )
    stitch = spark.createDataFrame(
        [
            Row(drugbank_id="DB1", uniprot_id="P1", stitch_combined_score=700),
            Row(drugbank_id="DB4", uniprot_id="P4", stitch_combined_score=400),
        ]
    )
    kegg = spark.createDataFrame(
        [Row(drugbank_id="DB4", uniprot_id="P4")]
    )
    return dict(drugbank=drugbank, chembl=chembl, pharos=pharos,
                dgidb=dgidb, stitch=stitch, kegg=kegg)


def test_merge_all_dtis(spark, dti_sources):
    out = merge_all_dtis(dti_sources)
    rows = {(r.drugbank_id, r.uniprot_id): r for r in out.collect()}
    assert set(rows) == {("DB1", "P1"), ("DB2", "P2"), ("DB3", "P3"),
                         ("DB4", "P4")}

    db1 = rows[("DB1", "P1")]
    # X4 source union preserves merge order
    assert db1.source == ["drugbank", "chembl", "pharos", "stitch"]
    # X3 references union, first-occurrence order
    assert db1.references == ["r1", "r2", "r3", "r5"]
    # X7 first-non-null with left priority + lower-casing
    assert db1.mechanism_of_action_type == "inhibitor"
    assert db1.pchembl == 7.2
    assert db1.activity_type == "IC50"
    assert db1.stitch_combined_score == 700
    assert db1.known_action == "yes"

    db2 = rows[("DB2", "P2")]
    assert db2.source == ["drugbank", "dgidb"]
    assert db2.references == ["r6", "r1"]
    assert db2.mechanism_of_action_type == "modulator"
    assert db2.dgidb_score == 0.8

    db3 = rows[("DB3", "P3")]
    assert db3.source == ["chembl", "pharos"]
    assert db3.activity_type == "Ki"
    assert db3.pchembl == 6.1
    assert db3.references == ["r4"]

    db4 = rows[("DB4", "P4")]
    assert db4.source == ["stitch", "kegg"]
    assert db4.references is None
    assert db4.pchembl is None
