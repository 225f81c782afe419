"""UniProt node-assembly adapter (reference node_data/uniprot.py, lifecycle
SURVEY §3.3): the reference downloads ~19 per-attribute dictionaries keyed
by accession and assembles wide node rows in a driver loop with chunked CSV
output (uniprot.py:74-167). The engine form: each attribute is a 2-column
DataFrame; a fold of 1:1 left joins on accession builds the wide table
(a columnar gather — all joins share the accession key, so consecutive
sort-merge joins reuse one exchange; at scale the attribute tables would be
bucketed by accession and the joins are shuffle-free).

Attribute-level semantics reproduced:
- ``xref_process`` (uniprot.py:37-46): multi-id xref strings keep their
  raw ';'-joined form, single-id strings lose the trailing ';' — the engine
  decodes to native arrays instead (SURVEY §7.0) which subsumes both cases.
- ``ensembl_process`` (uniprot.py:50-71): ENST ids are stripped of
  ``" ["``-suffixed alternative-transcript tags and ``.N`` versions, then
  mapped ENST→ENSG via a mapping *table* (broadcast join, J4) rather than
  pypath's per-id ``map_name`` calls; results deduped per accession.
- typed casts (uniprot.py:127-133): mass "12,345" → long, length → int.
- chunked export (uniprot.py:115-167) → ``write_chunked_csv``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.ids import clean_number, split_list


def assemble_nodes(attributes: dict[str, DataFrame], key: str = "accession") -> DataFrame:
    """Fold per-attribute 2-column tables (key, <attr>) into one wide node
    table via 1:1 left joins on the accession key, anchored on the first
    attribute's key set (the reference iterates uniprot ids from the
    primary dict, uniprot.py:115-119)."""
    dfs = list(attributes.values())
    return reduce(lambda acc, nxt: acc.join(nxt, on=key, how="left"), dfs)


def process_xrefs(df: DataFrame, col: str) -> DataFrame:
    """xref_process: ';'-joined xref string → native array (empty tokens
    dropped; trailing-';' single-id case handled by the split)."""
    return df.withColumn(col, split_list(col, ";"))


def process_ensembl(
    df: DataFrame, enst_map: DataFrame, col: str = "ensembl_transcript"
) -> DataFrame:
    """ensembl_process: per accession, clean each ENST token
    (``split(" [")[0]`` then ``split(".")[0]``), broadcast-map ENST→ENSG,
    collect the distinct gene ids. One explode + broadcast join + groupBy —
    no per-id driver calls."""
    cleaned = df.select(
        "accession",
        F.explode_outer(split_list(col, ";")).alias("enst_raw"),
    ).withColumn(
        "enst",
        F.element_at(F.split(F.element_at(F.split("enst_raw", " \\["), 1), "\\."), 1),
    )
    mapped = cleaned.join(F.broadcast(enst_map), on="enst", how="left")
    genes = mapped.groupBy("accession").agg(
        F.array_sort(
            F.array_distinct(
                F.filter(F.collect_list("ensg"), lambda x: x.isNotNull())
            )
        ).alias("ensembl_gene")
    )
    return df.join(genes, on="accession", how="left")


def cast_typed_columns(df: DataFrame) -> DataFrame:
    """Typed casts (uniprot.py:127-133): comma-grouped mass → long,
    length/organism_id → int."""
    out = df
    if "mass" in df.columns:
        out = out.withColumn("mass", clean_number("mass"))
    for c in ("length", "organism_id"):
        if c in df.columns:
            out = out.withColumn(c, F.col(c).cast("int"))
    return out
