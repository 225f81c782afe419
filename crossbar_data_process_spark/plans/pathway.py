"""Pathway adapter (reference node_data/pathway.py): union-all edge
assembly, the KEGG/Reactome equivalent-pathway self-join, and the
disease–pathway outer merge.

Reference semantics:
- protein/drug–pathway edges: plain UNION ALL of KEGG + Reactome tables
  (pathway.py:385-411, ``pd.concat``) → ``unionByName`` (U1).
- disease–pathway: kegg ⊕ ctd outer merge with X4 source union
  (pathway.py:413-430).
- equivalent-pathway edges (pathway.py:664-705): the reference runs O(n²)
  nested loops matching KEGG ids whose organism prefix is stripped
  (``p1[0][3:]``) and Reactome ids sharing the last ``-`` segment. The
  engine derives the key column and hash-joins — J6: O(n²) loop → one
  equi-join shuffle on the derived key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.ids import add_curie_prefix
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge


def union_pathway_edges(*sources: DataFrame) -> DataFrame:
    """U1 union-all of per-source edge tables (pathway.py:391,407);
    columns missing on one side NULL-fill."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def merge_disease_pathway(kegg: DataFrame, ctd: DataFrame) -> DataFrame:
    """kegg ⊕ ctd on (disease_id, pathway_id), X4 source union
    (pathway.py:413-430)."""
    return outer_merge(
        [kegg, ctd],
        on=["disease_id", "pathway_id"],
        specs=[CoalesceSpec("source", "array_union")],
    )


def equivalent_kegg_pathways(pathways: DataFrame, id_col: str = "pathway_id") -> DataFrame:
    """KEGG same-pathway-different-organism pairs: equal ids after the
    3-char organism prefix strip (pathway.py:667-684). Emits directed pairs
    (both orientations, excluding self) exactly like the reference's double
    loop, as CURIE-prefixed edges."""
    keyed = pathways.select(
        F.col(id_col).alias("pid"),
        F.substring(F.col(id_col), 4, 1000).alias("suffix"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.suffix") == F.col("b.suffix"))
        & (F.col("a.pid") != F.col("b.pid")),
    )
    return pairs.select(
        add_curie_prefix(F.col("a.pid"), "kegg.pathway").alias("src"),
        add_curie_prefix(F.col("b.pid"), "kegg.pathway").alias("dst"),
    )


def equivalent_reactome_pathways(
    pathways: DataFrame, id_col: str = "pathway_id"
) -> DataFrame:
    """Reactome cross-species pairs: equal last '-'-segment
    (pathway.py:687-705)."""
    keyed = pathways.select(
        F.col(id_col).alias("pid"),
        F.element_at(F.split(F.col(id_col), "-"), -1).alias("suffix"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.suffix") == F.col("b.suffix"))
        & (F.col("a.pid") != F.col("b.pid")),
    )
    return pairs.select(
        add_curie_prefix(F.col("a.pid"), "kegg.pathway").alias("src"),
        add_curie_prefix(F.col("b.pid"), "kegg.pathway").alias("dst"),
    )
