from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StringType

from crossbar_data_process_spark.schema import SchemaRegistry

YAML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "crossbar_data_process_spark",
    "schema",
    "example_schema.yaml",
)


def test_parse_types():
    reg = SchemaRegistry.from_yaml(YAML)
    prot = reg.decls["protein"]
    assert prot.kind == "node"
    assert prot.preferred_id == "uniprot"
    assert isinstance(prot.properties["length"], IntegerType)
    assert isinstance(prot.properties["secondary_ids"], ArrayType)
    assert isinstance(prot.properties["secondary_ids"].elementType, StringType)
    sm = reg.decls["small molecule"]
    assert sm.input_labels == ["drug", "compound"]
    assert isinstance(sm.properties["alogp"], DoubleType)
    ppi = reg.decls["protein protein interaction"]
    assert ppi.kind == "edge"
    assert ppi.source == "protein" and ppi.target == "protein"


def test_conform_casts_and_fills(spark):
    reg = SchemaRegistry.from_yaml(YAML)
    df = spark.createDataFrame(
        [Row(id="P1", length="321", extra="drop-me", mass=50000)]
    )
    out = reg.conform(df, "protein")
    assert [f.name for f in out.schema.fields] == [
        "id", "sequence", "length", "mass", "organism_id",
        "secondary_ids", "virus_hosts",
    ]
    row = out.collect()[0]
    assert row.length == 321          # cast str -> int
    assert row.sequence is None       # missing nullable filled
    assert "extra" not in out.columns # undeclared dropped


def test_label_map_positional_pairing():
    reg = SchemaRegistry.from_yaml(YAML)
    decl = reg.decls["small molecule to gene association"]
    assert decl.label_map() == {
        "drug_decreases_expression_gene": "decreases_expression",
        "drug_increases_expression_gene": "increases_expression",
    }
    # no label_as_edge -> input labels pass through
    assert reg.decls["protein"].label_map() == {"protein": "protein"}


def test_label_map_length_mismatch_raises():
    """A misdeclared schema (label_as_edge length ∉ {0, 1, len(input)})
    must fail loudly, not silently emit input-label-named tables
    (ADVICE r03)."""
    import pytest

    from crossbar_data_process_spark.schema.registry import EntityDecl

    decl = EntityDecl(
        name="bad",
        kind="edge",
        input_labels=["a", "b", "c"],
        labels_as_edge=["x", "y"],
    )
    with pytest.raises(ValueError, match="positionally"):
        decl.label_map()


def test_fanout_splits_one_table_into_per_label_outputs(spark):
    # input with BOTH labels lands in BOTH outputs, schema-validated;
    # undeclared labels are dropped
    reg = SchemaRegistry.from_yaml(YAML)
    df = spark.createDataFrame(
        [
            Row(src="drugbank:DB1", dst="ncbigene:2",
                label="drug_increases_expression_gene",
                source=["CTD"], references=["p1", "p2"]),
            Row(src="drugbank:DB2", dst="ncbigene:3",
                label="drug_decreases_expression_gene",
                source=["CTD"], references=[]),
            Row(src="drugbank:DB3", dst="ncbigene:4",
                label="not_a_declared_label",
                source=["CTD"], references=[]),
        ]
    )
    outs = reg.fanout(df, "small molecule to gene association")
    assert set(outs) == {"decreases_expression", "increases_expression"}
    inc = outs["increases_expression"].collect()
    dec = outs["decreases_expression"].collect()
    assert [r.src for r in inc] == ["drugbank:DB1"]
    assert [r.src for r in dec] == ["drugbank:DB2"]
    # conformed to the declared StructType: src/dst + typed props, no label
    expect = ["src", "dst", "source", "references"]
    assert [f.name for f in outs["increases_expression"].schema.fields] == expect
    assert inc[0].references == ["p1", "p2"]
