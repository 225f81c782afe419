"""Gene–disease association 7-way merge (reference node_data/
disease.py:1207-1323, ``merge_gene_disease_edge_data``) — the reference's
widest merge, and a merge *tree* rather than a chain:

    diseases  = knowledge ⊕ experimental          (source union)
    disgenet  = gda ⊕ vda                         (source union)
    merged    = opentargets ⊕ diseases ⊕ kegg ⊕ clinvar ⊕ humsavar ⊕ disgenet

on key (gene_id, disease_id). Reconcilers: ``source`` / ``variant_source``
/ ``dbsnp_id`` are all X4 order-preserving unions (merge_source_column,
disease.py:1613-1623); every per-source score column passes through
NULL-filled. Upstream, each source's disease ids were normalized to MONDO
through the J5 fallback cascade (disease.py:1631-1654 →
operators/mapping.fallback_map).

Scale: the whole tree is one Catalyst plan keyed on (gene_id, disease_id);
disease hub keys (common cancers) are skewed — AQE skew-join splits them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

GDA_KEY = ["gene_id", "disease_id"]

GDA_SPECS = [
    CoalesceSpec("source", "array_union"),
    CoalesceSpec("variant_source", "array_union"),
    CoalesceSpec("dbsnp_id", "array_union"),
]

GDA_SOURCE_ORDER = [
    "opentargets",
    "diseases_knowledge",
    "diseases_experimental",
    "kegg",
    "clinvar",
    "humsavar",
    "disgenet_gda",
    "disgenet_vda",
]


def normalize_gda_source(df: DataFrame, source_name: str) -> DataFrame:
    """Tag provenance as a singleton array; promote scalar variant columns
    to arrays so X4 union applies uniformly."""
    out = df.withColumn("source", F.array(F.lit(source_name)))
    for c in ("variant_source", "dbsnp_id"):
        if c in df.columns:
            out = out.withColumn(c, F.when(F.col(c).isNotNull(), F.array(F.col(c))))
    return out


def merge_gene_disease(sources: dict[str, DataFrame]) -> DataFrame:
    """Reproduce the reference's merge tree. ``sources`` maps source name →
    DataFrame keyed by GDA_KEY; missing sources are skipped."""
    norm = {
        name: normalize_gda_source(df, name)
        for name, df in sources.items()
    }

    def pair(a: str, b: str) -> list[DataFrame]:
        present = [norm[n] for n in (a, b) if n in norm]
        if not present:
            return []
        if len(present) == 1:
            return present
        return [outer_merge(present, on=GDA_KEY, specs=GDA_SPECS)]

    diseases = pair("diseases_knowledge", "diseases_experimental")
    disgenet = pair("disgenet_gda", "disgenet_vda")
    chain = (
        ([norm["opentargets"]] if "opentargets" in norm else [])
        + diseases
        + ([norm["kegg"]] if "kegg" in norm else [])
        + ([norm["clinvar"]] if "clinvar" in norm else [])
        + ([norm["humsavar"]] if "humsavar" in norm else [])
        + disgenet
    )
    return outer_merge(chain, on=GDA_KEY, specs=GDA_SPECS)
