"""Disease–drug and disease–disease association merges — reference
``merge_disease_drug_edge_data`` (node_data/disease.py:1165-1203) and
``merge_disease_disease_edge_data`` (disease.py:1325-1345).

Disease–drug, reference semantics per source:
- CTD chemical–disease (disease.py:563-601): keep therapeutic
  DirectEvidence rows with PubMed refs and a CAS→DrugBank hit; the disease
  id maps db-locally into MONDO (disease.py:578-580 — a (db, local_id) →
  mondo lookup, J4); per (disease_id, drug_id) the pubmed strings union
  '|'-tokenwise (X3, ``merge_source_column`` applied to pubmed_ids at
  disease.py:595), source "CTD".
- ChEMBL indication (disease.py:603-638): max_phase > 0 gate
  (disease.py:616), ChEMBL→DrugBank map, MONDO ids pass through while other
  vocabularies map via mondo_mappings (disease.py:621-627); per-pair best
  row by max_phase desc (sort + drop_duplicates, disease.py:633-635 — A2
  keep_best), source "ChEMBL".
- KEGG indication (disease.py:640-690): per disease xref, the FIRST hit in
  vocabulary priority MeSH → OMIM → ICD-10 wins (the nested found-loop at
  disease.py:655-674 — J5 fallback_map), plain dedup, source "KEGG".
- merge (disease.py:1177-1191): ChEMBL ⊕ CTD ⊕ KEGG outer merges on
  (disease_id, drug_id), X4 source union at each step.

Disease–disease (DDA), reference semantics (disease.py:1020-1115,1325-1345):
per source (gene-overlap / variant-overlap) round jaccard to 3 dp and drop
zeros, map both endpoints to MONDO, symmetric frozenset dedup keeping the
best score (sort desc + duplicated(), disease.py:1057-1058 — A4 with
order_by), then outer-merge the two sources on the directed pair, X4 source
union, and drop self-pairs (``ne`` filter, disease.py:1338 — P8).

Scale: every lookup is a size-aware J4/J5 join; per-pair aggregates are one
hash shuffle each; the merge fold shares its composite-key exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.dedup import dedup_undirected, keep_best
from crossbar_data_process_spark.operators.filters import drop_self_pairs
from crossbar_data_process_spark.operators.mapping import broadcast_map, fallback_map
from crossbar_data_process_spark.operators.merge import CoalesceSpec, outer_merge

DISEASE_DRUG_KEY = ["disease_id", "drug_id"]
DDA_KEY = ["disease_id1", "disease_id2"]

_SOURCE_UNION = [CoalesceSpec("source", "array_union")]


def normalize_ctd_chemical_disease(
    ctd: DataFrame,
    cas_to_drugbank: DataFrame,
    mondo_map: DataFrame,
) -> DataFrame:
    """``ctd``: (disease_db, disease_local_id, cas_rn, direct_evidence,
    pubmed_ids: array<string>). ``mondo_map``: (db, local_id, mondo_id).
    ``cas_to_drugbank``: (cas_rn, drugbank_id)."""
    gated = ctd.filter(
        (F.col("direct_evidence") == "therapeutic")
        & F.col("cas_rn").isNotNull()
        & (F.size("pubmed_ids") > 0)
    )
    mapped = broadcast_map(
        gated,
        mondo_map,
        on=[("disease_db", "db"), ("disease_local_id", "local_id")],
        value_col="mondo_id",
        out_col="disease_id",
        how="inner",  # disease.py:579: unmapped disease ids are dropped
    )
    mapped = broadcast_map(
        mapped,
        cas_to_drugbank,
        on=[("cas_rn", "cas_rn")],
        value_col="drugbank_id",
        out_col="drug_id",
        how="inner",
    )
    # X3 union of '|'-tokens across duplicate pairs, rendered back to the
    # reference's string form (sorted for determinism — the reference's
    # set order was unspecified)
    from crossbar_data_process_spark.operators.aggregates import pipe_union_agg

    return (
        mapped.withColumn("pubmed_ids", F.array_join("pubmed_ids", "|"))
        .groupBy(*DISEASE_DRUG_KEY)
        .agg(F.array_join(pipe_union_agg("pubmed_ids"), "|").alias("pubmed_ids"))
        .withColumn("source", F.array(F.lit("CTD")))
    )


def normalize_chembl_indication(
    chembl: DataFrame,
    chembl_to_drugbank: DataFrame,
    mondo_map: DataFrame,
) -> DataFrame:
    """``chembl``: (efo_db, efo_local_id, molecule_chembl, max_phase).
    MONDO-prefixed ids skip the mapping (disease.py:624-627)."""
    gated = chembl.filter(F.col("max_phase") > 0.0)
    mapped = broadcast_map(
        gated,
        chembl_to_drugbank,
        on=[("molecule_chembl", "chembl_id")],
        value_col="drugbank_id",
        out_col="drug_id",
        how="inner",
    )
    with_mondo = broadcast_map(
        mapped,
        mondo_map,
        on=[("efo_db", "db"), ("efo_local_id", "local_id")],
        value_col="mondo_id",
        out_col="mapped_id",
        how="left",
    )
    resolved = with_mondo.withColumn(
        "disease_id",
        F.when(
            F.col("efo_db") == "MONDO",
            F.concat_ws(":", F.col("efo_db"), F.col("efo_local_id")),
        ).otherwise(F.col("mapped_id")),
    ).filter(F.col("disease_id").isNotNull())
    best = keep_best(
        resolved.select(*DISEASE_DRUG_KEY, "max_phase"),
        DISEASE_DRUG_KEY,
        [F.desc("max_phase")],
    )
    return best.withColumn("source", F.array(F.lit("ChEMBL")))


def normalize_kegg_indication(
    kegg: DataFrame,
    kegg_drug_to_drugbank: DataFrame,
    xref_maps: list[tuple[DataFrame, str, str]],
) -> DataFrame:
    """``kegg``: (kegg_drug_id, kegg_disease_id). ``xref_maps``: ordered
    [(mapping_df, key_col, mondo_col), ...] in the reference's MeSH → OMIM →
    ICD-10 priority (disease.py:652-674) — J5 first-hit cascade."""
    mapped = broadcast_map(
        kegg,
        kegg_drug_to_drugbank,
        on=[("kegg_drug_id", "kegg_drug_id")],
        value_col="drugbank_id",
        out_col="drug_id",
        how="inner",
    )
    resolved = fallback_map(
        mapped, xref_maps, key_col="kegg_disease_id", out_col="disease_id"
    ).filter(F.col("disease_id").isNotNull())
    return (
        resolved.select(*DISEASE_DRUG_KEY)
        .dropDuplicates(DISEASE_DRUG_KEY)
        .withColumn("source", F.array(F.lit("KEGG")))
    )


def merge_disease_drug(
    chembl: DataFrame, ctd: DataFrame, kegg: DataFrame
) -> DataFrame:
    """disease.py:1177-1191: ChEMBL ⊕ CTD, then ⊕ KEGG, X4 source union."""
    return outer_merge(
        [chembl, ctd, kegg], on=DISEASE_DRUG_KEY, specs=_SOURCE_UNION
    )


def normalize_dda_source(
    df: DataFrame,
    score_col: str,
    out_score_col: str,
    source_name: str,
) -> DataFrame:
    """One DisGeNET DDA source (disease.py:1092-1115): round score to 3 dp,
    drop zeros and unmapped endpoints, symmetric dedup keeping the best
    score (desc sort + frozenset duplicated)."""
    scored = (
        df.withColumn(out_score_col, F.round(F.col(score_col), 3))
        .filter(F.col(out_score_col) != 0.0)
        .filter(F.col("disease_id1").isNotNull() & F.col("disease_id2").isNotNull())
        .select(*DDA_KEY, out_score_col)
    )
    deduped = dedup_undirected(
        scored,
        "disease_id1",
        "disease_id2",
        order_by=[
            F.desc(out_score_col),
            F.asc("disease_id1"),
            F.asc("disease_id2"),
        ],
    )
    return deduped.withColumn("source", F.array(F.lit(source_name)))


def merge_disease_disease(
    dda_gene: DataFrame, dda_variant: DataFrame
) -> DataFrame:
    """disease.py:1331-1338: outer merge on the directed pair, X4 source
    union, then drop self-pairs (P8 ``ne`` filter)."""
    merged = outer_merge(
        [dda_gene, dda_variant], on=DDA_KEY, specs=_SOURCE_UNION
    )
    return drop_self_pairs(merged, "disease_id1", "disease_id2")
