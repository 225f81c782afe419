"""Schema registry: BioCypher-style schema YAML → Spark StructTypes
(SURVEY.md §1.3).

The reference declares its output contract in ``schema_config.yaml``
(node labels with ``preferred_id`` CURIE prefixes and typed ``properties``;
edge labels with ``source``/``target`` node types — e.g. schema_config.yaml
:8-17 gene, :18-31 protein, :199-214 post-translational interaction). That
file is the de-facto correctness oracle of the reference (SURVEY §5). The
engine treats the same YAML dialect as its catalog: every gold DataFrame is
validated/cast against the declared StructType before write.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCALARS: dict[str, DataType] = {
    "str": StringType(),
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": DoubleType(),
    "double": DoubleType(),
    "bool": BooleanType(),
    "boolean": BooleanType(),
}


def parse_type(decl: str) -> DataType:
    """``int[]`` / ``str[]`` list syntax per the reference's YAML dialect
    (schema_config.yaml:209 ``pubmed_id: int[]``)."""
    decl = decl.strip()
    if decl.endswith("[]"):
        return ArrayType(parse_type(decl[:-2]))
    return _SCALARS.get(decl, StringType())


@dataclass
class EntityDecl:
    name: str
    kind: str  # "node" | "edge"
    preferred_id: str | None = None
    source: str | None = None
    target: str | None = None
    input_labels: list[str] = field(default_factory=list)
    properties: dict[str, DataType] = field(default_factory=dict)

    def struct_type(self) -> StructType:
        base: list[StructField] = (
            [StructField("id", StringType(), False)]
            if self.kind == "node"
            else [
                StructField("src", StringType(), False),
                StructField("dst", StringType(), False),
            ]
        )
        props = [StructField(k, t, True) for k, t in self.properties.items()]
        return StructType(base + props)


class SchemaRegistry:
    """Parses the YAML dialect, exposes per-label StructTypes, and casts
    DataFrames into conformance (extra columns dropped, missing nullable
    columns added as NULL, types cast)."""

    def __init__(self, decls: dict[str, EntityDecl]):
        self.decls = decls

    @classmethod
    def from_yaml(cls, path: str) -> "SchemaRegistry":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)
        decls: dict[str, EntityDecl] = {}
        for name, spec in (raw or {}).items():
            if not isinstance(spec, dict) or "represented_as" not in spec:
                continue
            kind = "node" if spec["represented_as"] == "node" else "edge"
            labels = spec.get("label_in_input", [])
            if isinstance(labels, str):
                labels = [labels]
            props = {
                k: parse_type(str(v))
                for k, v in (spec.get("properties") or {}).items()
            }
            decls[name] = EntityDecl(
                name=name,
                kind=kind,
                preferred_id=spec.get("preferred_id"),
                source=spec.get("source"),
                target=spec.get("target"),
                input_labels=list(labels),
                properties=props,
            )
        return cls(decls)

    def struct_type(self, name: str) -> StructType:
        return self.decls[name].struct_type()

    def conform(self, df: DataFrame, name: str) -> DataFrame:
        """Cast ``df`` to the declared schema: project declared columns in
        order, add missing nullable ones as NULL, cast types explicitly
        (replaces the reference's manual dtype repair, ppi.py:460-476)."""
        st = self.struct_type(name)
        cols = []
        for fld in st.fields:
            if fld.name in df.columns:
                cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        return df.select(*cols)
