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
    labels_as_edge: list[str] = field(default_factory=list)
    properties: dict[str, DataType] = field(default_factory=dict)

    def label_map(self) -> dict[str, str]:
        """Input-label → output-edge-label pairing. The YAML contract pairs
        ``label_in_input`` with ``label_as_edge`` POSITIONALLY (reference
        schema_config.yaml:242-246 located_in/part_of/is_active_in ↔ the
        three protein_*_cellular_component input labels; :373-382
        decreases/increases_expression ↔ drug_*_expression_gene). A
        singleton ``label_as_edge`` applies to every input label; with
        neither declared the input label passes through unchanged."""
        if self.labels_as_edge and len(self.labels_as_edge) == len(
            self.input_labels
        ):
            return dict(zip(self.input_labels, self.labels_as_edge))
        if len(self.labels_as_edge) == 1:
            return {lbl: self.labels_as_edge[0] for lbl in self.input_labels}
        if self.labels_as_edge:
            # A misdeclared schema must fail loudly: silently degrading to
            # the identity mapping would emit gold tables under input-label
            # names with no error (ADVICE r03).
            raise ValueError(
                f"label_as_edge has {len(self.labels_as_edge)} entries but "
                f"label_in_input has {len(self.input_labels)}; they pair "
                "positionally — declare equal lengths or a single edge label"
            )
        return {lbl: lbl for lbl in self.input_labels}

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
            as_edge = spec.get("label_as_edge", [])
            if isinstance(as_edge, str):
                as_edge = [as_edge]
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
                labels_as_edge=list(as_edge),
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

    def fanout(
        self, df: DataFrame, name: str, label_col: str = "label"
    ) -> dict[str, DataFrame]:
        """Label fan-out: split ONE association table into per-output-label
        gold tables, as a list-valued ``label_in_input`` declares (one
        logical association, several output edge labels — reference
        schema_config.yaml:242-246, 263-269, 373-382).

        Rows whose ``label_col`` is an input label land in the output keyed
        by the paired ``label_as_edge`` name, conformed to the declared
        StructType; undeclared labels are dropped. Each output is a plain
        filter over the same plan — Catalyst pushes the label predicate to
        the scan, and a pipeline writing all outputs does it in one pass
        with ``.write.partitionBy(label_col)`` (the per-label frames here
        are the API surface; the physical split costs one scan either way).
        """
        decl = self.decls[name]
        return {
            out_label: self.conform(
                df.filter(F.col(label_col) == in_label), name
            )
            for in_label, out_label in decl.label_map().items()
        }
