"""Tests for the domain adapter and the DisGeNET typed-client surface."""

from __future__ import annotations

import json

from pyspark.sql import Row

from crossbar_data_process_spark.plans.domain import (
    domain_nodes,
    protein_domain_edges,
)
from crossbar_data_process_spark.sources.disgenet import (
    GDA_SCHEMA,
    parse_bronze_json,
    top_k_per_disease,
)


def test_domain_nodes(spark):
    entries = spark.createDataFrame(
        [Row(interpro_id="IPR000001", name="Kringle", type="Domain",
             protein_count="42"),
         Row(interpro_id="IPR000002", name="Cdc20", type="Family",
             protein_count="7")]
    )
    member = spark.createDataFrame(
        [Row(interpro_id="IPR000001", db="PFAM", ids=["PF00024"]),
         Row(interpro_id="IPR000001", db="PROSITE", ids=["PS50070"])]
    )
    external = spark.createDataFrame(
        [Row(interpro_id="IPR000002", db="EC", ids=["1.1.1.1", "1.1.1.2"])]
    )
    out = {r.id: r for r in domain_nodes(entries, member, external).collect()}
    assert out["interpro:IPR000001"].protein_count == 42
    assert out["interpro:IPR000001"].pfam == ["PF00024"]
    assert out["interpro:IPR000001"].ec is None
    assert out["interpro:IPR000002"].ec == ["1.1.1.1", "1.1.1.2"]
    assert all(r.label == "domain" for r in out.values())


def test_protein_domain_edges(spark):
    annots = spark.createDataFrame(
        [Row(uniprot="P1",
             annots=[Row(interpro_id="IPR000001", locations=["10-50"]),
                     Row(interpro_id="IPR000002", locations=["60-80", "90-120"])])]
    )
    edges = {(r.src, r.dst): r for r in protein_domain_edges(annots).collect()}
    assert set(edges) == {
        ("uniprot:P1", "interpro:IPR000001"),
        ("uniprot:P1", "interpro:IPR000002"),
    }
    assert edges[("uniprot:P1", "interpro:IPR000002")].locations == [
        "60-80", "90-120"
    ]
    assert all(r.label == "Has" for r in edges.values())


def test_disgenet_bronze_and_topk(spark, tmp_path):
    rows = [
        {"geneid": 1, "gene_symbol": "A", "diseaseid": "C001",
         "disease_name": "d", "score": 0.9, "source": "CURATED"},
        {"geneid": 2, "gene_symbol": "B", "diseaseid": "C001",
         "disease_name": "d", "score": 0.8, "source": "CURATED"},
        {"geneid": 3, "gene_symbol": "C", "diseaseid": "C001",
         "disease_name": "d", "score": 0.7, "source": "ALL"},
        {"geneid": 4, "gene_symbol": "D", "diseaseid": "C002",
         "disease_name": "e", "score": 0.5, "source": "ALL"},
    ]
    p = tmp_path / "gda.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = parse_bronze_json(spark, str(p), GDA_SCHEMA)
    assert df.schema["score"].dataType.typeName() == "double"
    top = top_k_per_disease(df, k=2)
    got = {(r.diseaseid, r.geneid) for r in top.collect()}
    assert got == {("C001", 1), ("C001", 2), ("C002", 4)}
