"""UniProt wide-node assembly tests (FIXTURES.md F10; reference
uniprot.py:37-167): attribute-table fold, xref decode, ENST→ENSG mapping
with version/alt-transcript stripping, typed casts."""

from __future__ import annotations

from pyspark.sql import Row

from crossbar_data_process_spark.plans.uniprot import (
    assemble_nodes,
    cast_typed_columns,
    process_ensembl,
    process_xrefs,
)


def test_assemble_and_cast(spark):
    attrs = {
        "length": spark.createDataFrame(
            [Row(accession="P1", length="321"), Row(accession="P2", length="99")]
        ),
        "mass": spark.createDataFrame(
            [Row(accession="P1", mass="12,345"), Row(accession="P2", mass="9,001")]
        ),
        "organism": spark.createDataFrame([Row(accession="P1", organism_id="9606")]),
    }
    wide = cast_typed_columns(assemble_nodes(attrs))
    rows = {r.accession: r for r in wide.collect()}
    assert rows["P1"].length == 321
    assert rows["P1"].mass == 12345
    assert rows["P1"].organism_id == 9606
    assert rows["P2"].organism_id is None  # left-join NULL fill


def test_process_xrefs_single_and_multi(spark):
    df = spark.createDataFrame(
        [
            Row(accession="P1", kegg="hsa:1017;"),        # single id, trailing ;
            Row(accession="P2", kegg="hsa:1;hsa:2;"),     # multi id
            Row(accession="P3", kegg=None),
        ]
    )
    out = {r.accession: r.kegg for r in process_xrefs(df, "kegg").collect()}
    assert out["P1"] == ["hsa:1017"]
    assert out["P2"] == ["hsa:1", "hsa:2"]
    assert out["P3"] is None


def test_process_ensembl(spark):
    df = spark.createDataFrame(
        [
            Row(accession="P1",
                ensembl_transcript="ENST001.5;ENST002 [P1-2];ENST404"),
            Row(accession="P2", ensembl_transcript=None),
        ]
    )
    enst_map = spark.createDataFrame(
        [
            Row(enst="ENST001", ensg="ENSG01"),
            Row(enst="ENST002", ensg="ENSG01"),  # two transcripts, one gene
        ]
    )
    out = {r.accession: r for r in process_ensembl(df, enst_map).collect()}
    assert out["P1"].ensembl_gene == ["ENSG01"]  # deduped; unmapped dropped
    assert out["P2"].ensembl_gene == []
