"""DDI (drug–drug interaction) merge — reference ``merge_all_ddis``
(node_data/drug.py:1169-1189): KEGG and DDInter DDI tables, each
symmetric-deduped per source, outer-merged on the directed (drug1, drug2)
key with X4 source union.

Reference semantics reproduced:
- KEGG DDI (drug.py:604-643): contraindication/precaution flags render to a
  ``recommendation`` string (both → ``"contraindication|precaution"``),
  blank → NULL (drug.py:637 ``replace("", np.nan)``), source "Kegg",
  then frozenset-keyed symmetric dedup keeping the first row (drug.py:640).
- DDInter (drug.py:670-698): tuple-valued level/actions are '|'-joined,
  source "DDInter", same symmetric dedup (drug.py:693).
- merge (drug.py:1177-1186): pandas outer merge on ["drug1","drug2"]
  (directed — the per-source dedup already canonicalized each side's
  orientation arbitrarily), ``merge_source_column`` (X4) on source.

Engine notes: the frozenset dedup is ``dedup_undirected`` — one window
shuffle on the unordered pair, no global sort; the reference kept whichever
orientation its set-iteration happened to emit first, which is
nondeterministic — callers here pass an explicit ``order_by`` total order.
The outer merge is one Catalyst plan; both sides shuffle on the same
composite key so the exchange is reused, and at scale the silver DDI tables
would be bucketed on (drug1, drug2) making the merge shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.dedup import dedup_undirected
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

DDI_KEY = ["drug1", "drug2"]

DDI_SPECS = [CoalesceSpec("source", "array_union")]


def _blank_to_null(c: Column) -> Column:
    return F.when(c != "", c)


def normalize_kegg_ddi(
    df: DataFrame, order_by: list | None = None
) -> DataFrame:
    """KEGG DDI source normalization (drug.py:604-643): blank
    recommendation → NULL, provenance tag, symmetric dedup on the unordered
    pair. ``order_by`` picks the surviving duplicate (a deterministic
    replacement for the reference's set-iteration order)."""
    out = df.withColumn(
        "recommendation", _blank_to_null(F.col("recommendation"))
    ).withColumn("source", F.array(F.lit("Kegg")))
    return dedup_undirected(
        out,
        "drug1",
        "drug2",
        order_by=order_by
        # nulls_last so an orientation carrying a real recommendation beats a
        # blank→NULL one (Spark asc defaults NULLS FIRST, which would keep the
        # least-informative row); matches DuckDB's ASC NULLS LAST default so
        # the q43 oracle tie-breaks identically if NULLs appear.
        or [F.asc_nulls_last("recommendation"), F.asc("drug1"), F.asc("drug2")],
    )


def normalize_ddinter_ddi(
    df: DataFrame, order_by: list | None = None
) -> DataFrame:
    """DDInter source normalization (drug.py:670-698): multi-valued
    level/actions arrive '|'-joined (the engine keeps the encoded string —
    these columns pass through the merge untouched), provenance tag,
    symmetric dedup."""
    out = df.withColumn("source", F.array(F.lit("DDInter")))
    return dedup_undirected(
        out,
        "drug1",
        "drug2",
        order_by=order_by
        or [
            F.asc_nulls_last("interaction_level"),
            F.asc_nulls_last("interaction_type"),
            F.asc("drug1"),
            F.asc("drug2"),
        ],
    )


def merge_all_ddis(kegg: DataFrame, ddinter: DataFrame) -> DataFrame:
    """The drug.py:1177-1186 outer merge: directed composite key, X4 source
    union; KEGG-only columns (recommendation) and DDInter-only columns
    (interaction_level, interaction_type) pass through NULL-filled."""
    return outer_merge([kegg, ddinter], on=DDI_KEY, specs=DDI_SPECS)
