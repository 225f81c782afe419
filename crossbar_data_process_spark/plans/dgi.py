"""DGI (drug–gene interaction) pipeline — reference ``process_ctd_data``
(node_data/drug.py:863-925) feeding ``get_dgi_edges`` (drug.py:1255-1289).

Reference semantics reproduced:
- keep CTD records whose InteractionActions contain EXACTLY ONE of
  {increases_expression, decreases_expression} (≥1 required at drug.py:871,
  >1 skipped as a bad entry at drug.py:875-880);
- map CasRN → DrugBank id, dropping unmapped rows (drug.py:872 dict gate);
- PubMedIDs '|'-joined (drug.py:883-886);
- group by (drugbank_id, entrez_id): X6 conflict detection on action_type —
  distinct values in the group → NULL → dropped (drug.py:902-913,917);
  references "first" (engine: deterministic min — the reference depended on
  input order);
- source "CTD" (drug.py:919);
- edge label derivation (drug.py:1267-1270): decreases_expression →
  drug_downregulates_gene, else drug_upregulates_gene (F9 when-ladder).

Scale: the CAS→DrugBank mapping is a J4 lookup join (size-aware broadcast);
the conflict aggregate is one hash shuffle on the composite key with
map-side partials; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.aggregates import conflict_resolve
from crossbar_data_process_spark.operators.mapping import broadcast_map

_EXPR_ACTIONS = ["increases_expression", "decreases_expression"]


def process_ctd_dgi(
    ctd: DataFrame,
    cas_to_drugbank: DataFrame,
    actions_col: str = "interaction_actions",
) -> DataFrame:
    """CTD chemical–gene rows → deduped, conflict-resolved DGI table.

    ``ctd``: (entrez_id, cas_rn, interaction_actions: array<string>,
    pubmed_ids: array<string>). ``cas_to_drugbank``: (cas_rn, drugbank_id).
    """
    # F.filter (not array_intersect, which would deduplicate) so a row listing
    # the same expression action TWICE counts 2 raw occurrences and is skipped
    # as a bad entry — exact parity with the reference's occurrence count
    # (drug.py:875-880).
    relevant = F.filter(
        F.col(actions_col),
        lambda a: a.isin(*_EXPR_ACTIONS),
    )
    filtered = (
        ctd.filter(F.col("entrez_id").isNotNull() & F.col("cas_rn").isNotNull())
        .withColumn("__rel", relevant)
        .filter(F.size("__rel") == 1)  # 0 → no expression action; ≥2 → bad entry
        .withColumn("action_type", F.element_at("__rel", 1))
        .withColumn("references", F.array_join("pubmed_ids", "|"))
        .drop("__rel")
    )
    mapped = broadcast_map(
        filtered,
        cas_to_drugbank,
        on=[("cas_rn", "cas_rn")],
        value_col="drugbank_id",
        out_col="drugbank_id",
        how="inner",  # drug.py:872: unmapped CasRN rows are dropped
    )
    resolved = (
        mapped.groupBy("drugbank_id", "entrez_id")
        .agg(
            conflict_resolve("action_type").alias("action_type"),
            F.min("references").alias("references"),
        )
        .filter(F.col("action_type").isNotNull())  # drug.py:917 dropna
        .withColumn("source", F.lit("CTD"))
    )
    return resolved


def dgi_edge_label(action_col: str = "action_type") -> Column:
    """F9 label derivation (drug.py:1267-1270)."""
    return F.when(
        F.col(action_col) == "decreases_expression",
        F.lit("drug_downregulates_gene"),
    ).otherwise(F.lit("drug_upregulates_gene"))


def dgi_input_label(action_col: str = "action_type") -> Column:
    """The INPUT label the schema contract keys the fan-out on
    (schema_config.yaml:379 ``label_in_input``)."""
    return F.when(
        F.col(action_col) == "decreases_expression",
        F.lit("drug_decreases_expression_gene"),
    ).otherwise(F.lit("drug_increases_expression_gene"))


def get_dgi_edges_by_label(
    ctd: DataFrame,
    cas_to_drugbank: DataFrame,
    registry=None,
) -> dict[str, DataFrame]:
    """Schema-driven label fan-out of the DGI association
    (schema_config.yaml:373-382): ONE logical table splits into the
    ``decreases_expression`` / ``increases_expression`` gold outputs, each
    conformed to the declared StructType (src/dst + source: str[],
    references: str[]). This is the declarative replacement for the ad-hoc
    when-ladder in ``dgi_edge_label`` — the schema, not the plan, owns the
    label mapping."""
    import os

    from crossbar_data_process_spark.functions.ids import add_curie_prefix
    from crossbar_data_process_spark.schema import SchemaRegistry

    if registry is None:
        registry = SchemaRegistry.from_yaml(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "schema",
                "example_schema.yaml",
            )
        )
    dgi = process_ctd_dgi(ctd, cas_to_drugbank)
    edges = dgi.select(
        add_curie_prefix("drugbank_id", "drugbank").alias("src"),
        add_curie_prefix(F.col("entrez_id").cast("string"), "ncbigene").alias(
            "dst"
        ),
        dgi_input_label().alias("label"),
        F.array(F.col("source")).alias("source"),
        F.split("references", "\\|").alias("references"),
    )
    return registry.fanout(edges, "small molecule to gene association")


def get_dgi_edges(
    ctd: DataFrame, cas_to_drugbank: DataFrame
) -> DataFrame:
    """The get_dgi_edges surface (drug.py:1255-1289): CURIE-prefixed
    endpoints, derived label, per-edge props."""
    from crossbar_data_process_spark.functions.ids import add_curie_prefix

    dgi = process_ctd_dgi(ctd, cas_to_drugbank)
    return dgi.select(
        add_curie_prefix("drugbank_id", "drugbank").alias("source_id"),
        add_curie_prefix(F.col("entrez_id").cast("string"), "ncbigene").alias(
            "target_id"
        ),
        dgi_edge_label().alias("label"),
        "references",
        F.col("source").alias("provenance"),
    )
