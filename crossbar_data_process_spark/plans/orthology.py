"""Orthology adapter (reference edge_data/orthology.py): OMA + pypath
orthology merge with score rounding and undirected-pair dedup.

Reference semantics:
- OMA normalization (orthology.py:195-207): entry-name→UniProt→entrez
  double mapping (J4 broadcast joins replace the chained driver dicts),
  ``round(score)`` (F7), score-desc sort then frozenset pair dedup
  (A4 keep-best: orthology.py:204-206).
- Merge (orthology.py:274-279): oma ⊕ pypath on (entrez_a, entrez_b) with
  X4 source union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.dedup import dedup_undirected
from crossbar_data_process_spark.operators.mapping import broadcast_map
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

ORTHOLOGY_KEY = ["entrez_a", "entrez_b"]


def oma_process(
    oma: DataFrame, name_to_uniprot: DataFrame, uniprot_to_entrez: DataFrame
) -> DataFrame:
    """``oma``: (entry_a, entry_b, relation_type, score double)."""
    df = oma
    for side in ("a", "b"):
        df = broadcast_map(
            df, name_to_uniprot, [(f"entry_{side}", "entry_name")], "uniprot",
            f"uniprot_{side}", how="inner",
        )
        df = broadcast_map(
            df, uniprot_to_entrez, [(f"uniprot_{side}", "uniprot")], "entrez",
            f"entrez_{side}", how="inner",
        )
    df = df.select(
        "entrez_a",
        "entrez_b",
        "relation_type",
        F.round("score").cast("long").alias("oma_orthology_score"),
        F.array(F.lit("OMA")).alias("source"),
    )
    return dedup_undirected(
        df,
        "entrez_a",
        "entrez_b",
        order_by=[
            F.desc("oma_orthology_score"),
            F.asc("relation_type"),
        ],
    )


def merge_orthology(oma: DataFrame, pypath_orth: DataFrame) -> DataFrame:
    return outer_merge(
        [oma, pypath_orth],
        on=ORTHOLOGY_KEY,
        specs=[CoalesceSpec("source", "array_union")],
    )
