"""Compound–target interaction (CTI) adapter (reference node_data/
compound.py): the ChEMBL activity reduction — the densest use of the X1/X2/
X3 aggregate dialect — plus the ChEMBL⊕STITCH merge and the drug/compound
disjointness anti-join.

Reference semantics:
- ChEMBL reduction (compound.py:199-211): sort by activity_value, group by
  (uniprot_id, chembl): median pchembl/activity_value (X1, 3dp), middle-row
  activity_type/confidence_score aligned to the activity_value order (X2),
  pipe-union assay/references (X3).
- Drug/compound disjointness (compound.py:179,391): compounds that map to a
  DrugBank id are *drugs*, not compounds — anti-join vs the mapping (P5).
- Merge (compound.py:330-350): chembl ⊕ stitch on (uniprot_id, chembl)
  with X4 source union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.aggregates import (
    agg_median,
    agg_middle_row_by,
    pipe_union_agg,
)
from crossbar_data_process_spark.operators.filters import anti_filter
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

CTI_KEY = ["uniprot_id", "chembl"]


def chembl_reduce(activities: DataFrame) -> DataFrame:
    """Per-(target, compound) reduction of raw ChEMBL activity rows."""
    return (
        activities.groupBy("uniprot_id", "chembl")
        .agg(
            agg_median("pchembl").alias("pchembl"),
            agg_median("activity_value").alias("activity_value"),
            agg_middle_row_by("activity_value", "activity_type").alias(
                "activity_type"
            ),
            agg_middle_row_by("activity_value", "confidence_score").alias(
                "confidence_score"
            ),
            pipe_union_agg("assay_chembl").alias("assay_chembl"),
            pipe_union_agg("references").alias("references"),
        )
        .withColumn("source", F.array(F.lit("ChEMBL")))
    )


def drop_drugbank_mapped(
    compounds: DataFrame, chembl_to_drugbank: DataFrame
) -> DataFrame:
    """P5 disjointness: anything with a DrugBank mapping belongs to the
    drug adapter, not the compound adapter (compound.py:179,391)."""
    return anti_filter(compounds, chembl_to_drugbank, [("chembl", "chembl")])


def merge_all_ctis(chembl: DataFrame, stitch: DataFrame) -> DataFrame:
    """chembl ⊕ stitch on (uniprot_id, chembl), X4 source union
    (compound.py:330-350); stitch carries stitch_combined_score through."""
    return outer_merge(
        [chembl, stitch],
        on=CTI_KEY,
        specs=[CoalesceSpec("source", "array_union")],
    )
