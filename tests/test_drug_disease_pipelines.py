"""Golden tests for the drug/disease merge chains flagged missing in
VERDICT r01: DDI (drug.py:1177-1189), DGI (drug.py:1253-1289 + :902-913),
disease–drug (disease.py:1160-1203), disease–disease (disease.py:1325-1345),
and drug node assembly (drug.py:1191-1220). Expected values are hand-derived
from the reference's pandas semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from crossbar_data_process_spark.plans.ddi import (
    merge_all_ddis,
    normalize_ddinter_ddi,
    normalize_kegg_ddi,
)
from crossbar_data_process_spark.plans.dgi import get_dgi_edges, process_ctd_dgi
from crossbar_data_process_spark.plans.disease_assoc import (
    merge_disease_disease,
    merge_disease_drug,
    normalize_chembl_indication,
    normalize_ctd_chemical_disease,
    normalize_dda_source,
    normalize_kegg_indication,
)
from crossbar_data_process_spark.plans.drug_nodes import (
    assemble_drug_nodes,
    to_node_rows,
)


# ---------------------------------------------------------------- DDI


def test_ddi_merge(spark):
    kegg = spark.createDataFrame(
        [
            # symmetric duplicate: (DB1,DB2) and (DB2,DB1) — one survives
            Row(drug1="DB1", drug2="DB2", recommendation="contraindication"),
            Row(drug1="DB2", drug2="DB1", recommendation="precaution"),
            Row(drug1="DB3", drug2="DB4", recommendation=""),  # blank -> NULL
            Row(drug1="DB7", drug2="DB8", recommendation="precaution"),
        ]
    )
    ddinter = spark.createDataFrame(
        [
            Row(drug1="DB2", drug2="DB1", interaction_level="Major",
                interaction_type="increase"),
            Row(drug1="DB5", drug2="DB6", interaction_level="Minor",
                interaction_type="decrease"),
            Row(drug1="DB7", drug2="DB8", interaction_level="Moderate",
                interaction_type="mixed"),
        ]
    )
    out = merge_all_ddis(normalize_kegg_ddi(kegg), normalize_ddinter_ddi(ddinter))
    rows = {(r.drug1, r.drug2): r for r in out.collect()}

    # kegg symmetric dedup kept the best-ordered orientation
    # (recommendation asc: contraindication < precaution)
    assert ("DB1", "DB2") in rows
    assert rows[("DB1", "DB2")].recommendation == "contraindication"
    assert rows[("DB1", "DB2")].source == ["Kegg"]
    # the merge key is directed (reference semantics): kegg's (DB1,DB2) and
    # ddinter's (DB2,DB1) remain distinct rows
    assert ("DB2", "DB1") in rows
    assert rows[("DB2", "DB1")].source == ["DDInter"]
    assert rows[("DB2", "DB1")].interaction_level == "Major"
    # blank recommendation nulled
    assert rows[("DB3", "DB4")].recommendation is None
    # same directed pair in both sources: X4 source union, columns coalesce
    db78 = rows[("DB7", "DB8")]
    assert db78.source == ["Kegg", "DDInter"]
    assert db78.recommendation == "precaution"
    assert db78.interaction_level == "Moderate"
    assert len(rows) == 5


# ---------------------------------------------------------------- DGI


@pytest.fixture(scope="module")
def dgi_inputs(spark):
    ctd = spark.createDataFrame(
        [
            # conflict pair: two records for (DB1, gene 1) with opposite
            # actions -> X6 NULL -> dropped
            Row(entrez_id=1, cas_rn="C1",
                interaction_actions=["increases_expression"],
                pubmed_ids=["p1"]),
            Row(entrez_id=1, cas_rn="C2",
                interaction_actions=["decreases_expression"],
                pubmed_ids=["p2"]),
            # kept: one expression action among others
            Row(entrez_id=2, cas_rn="C1",
                interaction_actions=["increases_expression", "binding"],
                pubmed_ids=["p1", "p2"]),
            # kept: downregulation
            Row(entrez_id=3, cas_rn="C3",
                interaction_actions=["decreases_expression"],
                pubmed_ids=[]),
            # skipped: both expression actions in ONE record (drug.py:875-880)
            Row(entrez_id=4, cas_rn="C1",
                interaction_actions=["increases_expression",
                                     "decreases_expression"],
                pubmed_ids=["p3"]),
            # skipped: no expression action
            Row(entrez_id=5, cas_rn="C1",
                interaction_actions=["binding"], pubmed_ids=["p4"]),
            # dropped: unmapped CasRN
            Row(entrez_id=6, cas_rn="CX",
                interaction_actions=["increases_expression"],
                pubmed_ids=["p5"]),
        ]
    )
    cas_map = spark.createDataFrame(
        [
            Row(cas_rn="C1", drugbank_id="DB1"),
            Row(cas_rn="C2", drugbank_id="DB1"),
            Row(cas_rn="C3", drugbank_id="DB2"),
        ]
    )
    return ctd, cas_map


def test_process_ctd_dgi(spark, dgi_inputs):
    ctd, cas_map = dgi_inputs
    out = process_ctd_dgi(ctd, cas_map)
    rows = {(r.drugbank_id, r.entrez_id): r for r in out.collect()}
    assert set(rows) == {("DB1", 2), ("DB2", 3)}
    assert rows[("DB1", 2)].action_type == "increases_expression"
    assert rows[("DB1", 2)].references == "p1|p2"
    assert rows[("DB1", 2)].source == "CTD"
    assert rows[("DB2", 3)].action_type == "decreases_expression"
    assert rows[("DB2", 3)].references == ""


def test_dgi_edges(spark, dgi_inputs):
    ctd, cas_map = dgi_inputs
    edges = {r.target_id: r for r in get_dgi_edges(ctd, cas_map).collect()}
    assert edges["ncbigene:2"].source_id == "drugbank:DB1"
    assert edges["ncbigene:2"].label == "drug_upregulates_gene"
    assert edges["ncbigene:3"].label == "drug_downregulates_gene"


# ------------------------------------------------- disease–drug three-way


@pytest.fixture(scope="module")
def disease_drug_sources(spark):
    mondo_map = spark.createDataFrame(
        [
            Row(db="MESH", local_id="M1", mondo_id="MONDO:0001"),
            Row(db="OMIM", local_id="O1", mondo_id="MONDO:0002"),
            Row(db="EFO", local_id="E1", mondo_id="MONDO:0003"),
        ]
    )
    cas_map = spark.createDataFrame([Row(cas_rn="C1", drugbank_id="DB1")])
    ctd = spark.createDataFrame(
        [
            # two records for the same pair: pubmed X3 pipe-union fires
            Row(disease_db="MESH", disease_local_id="M1", cas_rn="C1",
                direct_evidence="therapeutic", pubmed_ids=["p2", "p1"]),
            Row(disease_db="MESH", disease_local_id="M1", cas_rn="C1",
                direct_evidence="therapeutic", pubmed_ids=["p3", "p1"]),
            # dropped: marker evidence
            Row(disease_db="MESH", disease_local_id="M1", cas_rn="C1",
                direct_evidence="marker/mechanism", pubmed_ids=["p4"]),
            # dropped: unmapped disease
            Row(disease_db="MESH", disease_local_id="MX", cas_rn="C1",
                direct_evidence="therapeutic", pubmed_ids=["p5"]),
        ]
    )
    chembl_map = spark.createDataFrame(
        [Row(chembl_id="CH1", drugbank_id="DB1"),
         Row(chembl_id="CH2", drugbank_id="DB2")]
    )
    chembl = spark.createDataFrame(
        [
            # same pair twice: keep-best by max_phase desc
            Row(efo_db="EFO", efo_local_id="E1", molecule_chembl="CH1",
                max_phase=2.0),
            Row(efo_db="EFO", efo_local_id="E1", molecule_chembl="CH1",
                max_phase=4.0),
            # MONDO passthrough (no mapping row needed)
            Row(efo_db="MONDO", efo_local_id="0001", molecule_chembl="CH2",
                max_phase=3.0),
            # dropped: phase 0
            Row(efo_db="EFO", efo_local_id="E1", molecule_chembl="CH2",
                max_phase=0.0),
        ]
    )
    kegg_drug_map = spark.createDataFrame(
        [Row(kegg_drug_id="K1", drugbank_id="DB1")]
    )
    mesh_xref = spark.createDataFrame(
        [Row(kegg_disease_id="H1", mondo="MONDO:0001")]
    )
    omim_xref = spark.createDataFrame(
        [Row(kegg_disease_id="H1", mondo="MONDO:0009"),  # loses to MeSH
         Row(kegg_disease_id="H2", mondo="MONDO:0002")]
    )
    kegg = spark.createDataFrame(
        [Row(kegg_drug_id="K1", kegg_disease_id="H1"),
         Row(kegg_drug_id="K1", kegg_disease_id="H2"),
         Row(kegg_drug_id="KX", kegg_disease_id="H1")]  # unmapped drug
    )
    return dict(
        ctd=normalize_ctd_chemical_disease(ctd, cas_map, mondo_map),
        chembl=normalize_chembl_indication(chembl, chembl_map, mondo_map),
        kegg=normalize_kegg_indication(
            kegg, kegg_drug_map,
            [(mesh_xref, "kegg_disease_id", "mondo"),
             (omim_xref, "kegg_disease_id", "mondo")],
        ),
    )


def test_disease_drug_merge(spark, disease_drug_sources):
    s = disease_drug_sources
    ctd_rows = {(r.disease_id, r.drug_id): r for r in s["ctd"].collect()}
    assert set(ctd_rows) == {("MONDO:0001", "DB1")}
    # X3: union of pipe tokens, sorted, deduped
    assert ctd_rows[("MONDO:0001", "DB1")].pubmed_ids == "p1|p2|p3"

    chembl_rows = {(r.disease_id, r.drug_id): r for r in s["chembl"].collect()}
    assert chembl_rows[("MONDO:0003", "DB1")].max_phase == 4.0
    assert ("MONDO:0001", "DB2") in chembl_rows  # MONDO passthrough

    kegg_rows = {(r.disease_id, r.drug_id) for r in s["kegg"].collect()}
    # J5: H1 resolves via MeSH (first map) not OMIM
    assert kegg_rows == {("MONDO:0001", "DB1"), ("MONDO:0002", "DB1")}

    merged = merge_disease_drug(s["chembl"], s["ctd"], s["kegg"])
    rows = {(r.disease_id, r.drug_id): r for r in merged.collect()}
    assert set(rows) == {
        ("MONDO:0003", "DB1"),
        ("MONDO:0001", "DB2"),
        ("MONDO:0001", "DB1"),
        ("MONDO:0002", "DB1"),
    }
    # ChEMBL ⊕ CTD ⊕ KEGG priority order in the X4 union
    assert rows[("MONDO:0001", "DB1")].source == ["CTD", "KEGG"]
    assert rows[("MONDO:0003", "DB1")].source == ["ChEMBL"]
    assert rows[("MONDO:0001", "DB1")].pubmed_ids == "p1|p2|p3"
    assert rows[("MONDO:0003", "DB1")].max_phase == 4.0


# ------------------------------------------------- disease–disease (DDA)


def test_disease_disease_merge(spark):
    gene = spark.createDataFrame(
        [
            # symmetric duplicate: higher score survives as its orientation
            Row(disease_id1="MONDO:1", disease_id2="MONDO:2",
                jaccard_genes=0.51236),
            Row(disease_id1="MONDO:2", disease_id2="MONDO:1",
                jaccard_genes=0.812),
            # dropped: rounds to 0.0
            Row(disease_id1="MONDO:3", disease_id2="MONDO:4",
                jaccard_genes=0.0002),
            # self pair: survives per-source, dropped after merge
            Row(disease_id1="MONDO:5", disease_id2="MONDO:5",
                jaccard_genes=0.4),
            Row(disease_id1="MONDO:6", disease_id2="MONDO:7",
                jaccard_genes=0.3),
        ]
    )
    variant = spark.createDataFrame(
        [
            Row(disease_id1="MONDO:2", disease_id2="MONDO:1",
                jaccard_variants=0.25),
            Row(disease_id1="MONDO:8", disease_id2="MONDO:9",
                jaccard_variants=0.125),
        ]
    )
    g = normalize_dda_source(
        gene, "jaccard_genes", "disgenet_jaccard_genes_score",
        "Disgenet Disease-Disease Gene")
    v = normalize_dda_source(
        variant, "jaccard_variants", "disgenet_jaccard_variants_score",
        "Disgenet Disease-Disease Variant")
    out = merge_disease_disease(g, v)
    rows = {(r.disease_id1, r.disease_id2): r for r in out.collect()}

    # higher-score orientation (MONDO:2, MONDO:1) survived the A4 dedup and
    # aligned with the variant source's key -> both scores + source union
    pair = rows[("MONDO:2", "MONDO:1")]
    assert pair.disgenet_jaccard_genes_score == 0.812
    assert pair.disgenet_jaccard_variants_score == 0.25
    assert pair.source == [
        "Disgenet Disease-Disease Gene", "Disgenet Disease-Disease Variant"
    ]
    assert ("MONDO:5", "MONDO:5") not in rows  # P8 self-pair filter
    assert ("MONDO:3", "MONDO:4") not in rows  # zero-score drop
    assert set(rows) == {("MONDO:2", "MONDO:1"), ("MONDO:6", "MONDO:7"),
                         ("MONDO:8", "MONDO:9")}


# ------------------------------------------------- drug node assembly


def test_drug_node_assembly(spark):
    core = spark.createDataFrame(
        [
            Row(drugbank_id="DB1", name="L'aspirin", cas_number=None,
                general_references="ref1"),
            Row(drugbank_id="DB2", name="", cas_number="64-17-5",
                general_references=None),
        ]
    )
    external = spark.createDataFrame(
        [Row(drugbank_id="DB1", cas_number="50-78-2", kegg_drug="D00109")]
    )
    inchi = spark.createDataFrame(
        [Row(drugbank_id="DB1", InChI="InChI=1S/C9H8O4")]
    )
    wide = assemble_drug_nodes(core, [external, inchi])
    nodes = {
        r.id: r
        for r in to_node_rows(
            wide, ["name", "cas_number", "InChI", "kegg_drug"]
        ).collect()
    }
    assert set(nodes) == {"drugbank:DB1", "drugbank:DB2"}
    db1 = nodes["drugbank:DB1"]
    assert db1.label == "drug"
    # overlay value wins over NULL core; quote sanitized; key lower-cased
    assert db1.props == {
        "name": "L^aspirin",
        "cas_number": "50-78-2",
        "inchi": "InChI=1S/C9H8O4",
        "kegg_drug": "D00109",
    }
    db2 = nodes["drugbank:DB2"]
    # empty-string name dropped; no overlays
    assert db2.props == {"cas_number": "64-17-5"}


def test_dgi_label_fanout(spark, dgi_inputs):
    # schema-driven fan-out (schema_config.yaml:373-382): one association
    # table -> per-output-label gold tables, both labels represented
    from crossbar_data_process_spark.plans.dgi import get_dgi_edges_by_label

    ctd, cas_map = dgi_inputs
    outs = get_dgi_edges_by_label(ctd, cas_map)
    assert set(outs) == {"decreases_expression", "increases_expression"}
    inc = {r.dst: r for r in outs["increases_expression"].collect()}
    dec = {r.dst: r for r in outs["decreases_expression"].collect()}
    assert set(inc) == {"ncbigene:2"} and set(dec) == {"ncbigene:3"}
    assert inc["ncbigene:2"].src == "drugbank:DB1"
    assert inc["ncbigene:2"].source == ["CTD"]
    assert inc["ncbigene:2"].references == ["p1", "p2"]
    for df in outs.values():  # schema-validated output shape
        assert [f.name for f in df.schema.fields] == [
            "src", "dst", "source", "references",
        ]


def test_dgi_duplicated_same_action_skipped(spark):
    # ADVICE r02: a row listing the SAME expression action twice is a bad
    # entry (raw occurrence count 2), exactly like the reference's
    # drug.py:875-880 gate — array_intersect would have deduped it to 1
    from pyspark.sql import Row as R

    ctd = spark.createDataFrame(
        [
            R(entrez_id=1, cas_rn="C1",
              interaction_actions=["increases_expression",
                                   "increases_expression"],
              pubmed_ids=["p"]),
            R(entrez_id=2, cas_rn="C1",
              interaction_actions=["increases_expression"], pubmed_ids=[]),
        ]
    )
    cas_map = spark.createDataFrame([R(cas_rn="C1", drugbank_id="DB1")])
    out = process_ctd_dgi(ctd, cas_map)
    assert [r.entrez_id for r in out.collect()] == [2]
