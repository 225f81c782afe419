"""Protein-domain (InterPro) adapter (reference node_data/domain.py):
domain node assembly from InterPro entries + per-protein annotation
fan-out to protein→domain edges.

Reference semantics:
- nodes (domain.py:100-139): per-entry prop assembly with xref attach from
  member/structural/external maps; driver dicts become broadcast-joined
  xref tables (J4); ``protein_count`` int cast (F7); CURIE prefixes (F6).
  The reference's scalar-vs-list flattening for singleton xref lists is a
  tuple-emission artifact — the engine keeps native arrays (SURVEY §7.0).
- edges (domain.py:143-157): one row per (protein, interpro annotation)
  with a ``locations`` array prop — the X9 explode over the annotation
  multimap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.ids import add_curie_prefix


def domain_nodes(
    entries: DataFrame,
    member_xrefs: DataFrame | None = None,
    external_xrefs: DataFrame | None = None,
) -> DataFrame:
    """``entries``: (interpro_id, name, type, protein_count string);
    xref tables: (interpro_id, db, ids array<string>). Returns
    (id, label, name, type, protein_count, pfam, ec)."""
    out = entries.select(
        add_curie_prefix("interpro_id", "interpro").alias("id"),
        F.lit("domain").alias("label"),
        F.col("interpro_id"),
        "name",
        "type",
        F.col("protein_count").cast("int").alias("protein_count"),
    )
    for xrefs, db, col in (
        (member_xrefs, "PFAM", "pfam"),
        (external_xrefs, "EC", "ec"),
    ):
        if xrefs is not None:
            side = xrefs.filter(F.col("db") == db).select(
                "interpro_id", F.col("ids").alias(col)
            )
            out = out.join(F.broadcast(side), "interpro_id", "left")
    return out.drop("interpro_id")


def protein_domain_edges(annotations: DataFrame) -> DataFrame:
    """``annotations``: (uniprot, annots array<struct<interpro_id, locations
    array<string>>>) — the reference's per-protein multimap. X9 explode →
    (src, dst, label, locations)."""
    ex = annotations.select(
        "uniprot", F.explode("annots").alias("a")
    )
    return ex.select(
        add_curie_prefix("uniprot", "uniprot").alias("src"),
        add_curie_prefix(F.col("a.interpro_id"), "interpro").alias("dst"),
        F.lit("Has").alias("label"),
        F.col("a.locations").alias("locations"),
    )
