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
