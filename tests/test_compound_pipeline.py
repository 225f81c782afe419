"""Golden test for the compound CTI adapter (plans/compound.py): the X1/X2
aggregate alignment (middle row picked at the activity_value-sorted middle),
X3 unions, disjointness anti-join, and the stitch merge."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crossbar_data_process_spark.plans.compound import (
    chembl_reduce,
    drop_drugbank_mapped,
    merge_all_ctis,
)


@pytest.fixture(scope="module")
def activities(spark):
    return spark.createDataFrame(
        [
            # group (P1, C1): activity_values [10, 20, 30, 40] ->
            # median 25.0; middle row (len//2 = index 2) -> value 30's row
            Row(uniprot_id="P1", chembl="C1", pchembl=5.0, activity_value=10.0,
                activity_type="IC50", confidence_score=7,
                assay_chembl="A1|A2", references="r1"),
            Row(uniprot_id="P1", chembl="C1", pchembl=6.0, activity_value=30.0,
                activity_type="Ki", confidence_score=9,
                assay_chembl="A2", references="r2|r1"),
            Row(uniprot_id="P1", chembl="C1", pchembl=7.0, activity_value=20.0,
                activity_type="EC50", confidence_score=8,
                assay_chembl=None, references=None),
            Row(uniprot_id="P1", chembl="C1", pchembl=None, activity_value=40.0,
                activity_type="Kd", confidence_score=6,
                assay_chembl="A3", references="r3"),
            # singleton group
            Row(uniprot_id="P2", chembl="C2", pchembl=4.4, activity_value=99.0,
                activity_type="IC50", confidence_score=5,
                assay_chembl="A9", references="r9"),
        ]
    )


def test_chembl_reduce(spark, activities):
    out = {(r.uniprot_id, r.chembl): r for r in chembl_reduce(activities).collect()}
    g = out[("P1", "C1")]
    assert g.activity_value == 25.0          # median of 10,20,30,40
    assert g.pchembl == 6.0                  # median of 5,6,7 (null dropped)
    # middle row by activity_value order [10,20,30,40] -> index 2 -> 30 -> Ki
    assert g.activity_type == "Ki"
    assert g.confidence_score == 9
    assert g.assay_chembl == ["A1", "A2", "A3"]   # pipe-split union, sorted
    assert g.references == ["r1", "r2", "r3"]
    assert out[("P2", "C2")].activity_type == "IC50"


def test_disjointness_and_merge(spark, activities):
    chembl = chembl_reduce(activities)
    mapping = spark.createDataFrame([Row(chembl="C2", drugbank="DB9")])
    compounds_only = drop_drugbank_mapped(chembl, mapping)
    assert {r.chembl for r in compounds_only.collect()} == {"C1"}

    stitch = spark.createDataFrame(
        [Row(uniprot_id="P1", chembl="C1", stitch_combined_score=800),
         Row(uniprot_id="P3", chembl="C3", stitch_combined_score=500)]
    ).withColumn("source", F.array(F.lit("STITCH")))
    merged = {(r.uniprot_id, r.chembl): r
              for r in merge_all_ctis(compounds_only, stitch).collect()}
    assert merged[("P1", "C1")].source == ["ChEMBL", "STITCH"]
    assert merged[("P1", "C1")].stitch_combined_score == 800
    assert merged[("P3", "C3")].source == ["STITCH"]
    assert merged[("P3", "C3")].pchembl is None
