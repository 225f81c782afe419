"""Composed KG gold build (scripts/kg_build.py — VERDICT r7 #2): all
plans/* adapters in ONE session over scaled deterministic synthetic
sources, schema-conformed. Per-adapter SEMANTICS are pinned by the
pipeline golden tests; this pins COMPOSITION — every gold table builds,
is non-empty, carries the declared schema, and the generators are
deterministic (same scale → same row counts)."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "kg_build",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "kg_build.py",
    ),
)
kg_build = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(kg_build)


def test_full_build_composes_and_conforms(spark):
    from crossbar_data_process_spark.schema.registry import SchemaRegistry

    src = kg_build.gen_sources(spark, 0.03)
    gold = kg_build.build_gold(spark, src)
    assert len(gold) == 23

    registry = SchemaRegistry.from_yaml(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "crossbar_data_process_spark",
            "schema",
            "kg_gold_schema.yaml",
        )
    )
    # every table except drug_nodes (map-typed props, documented) is declared
    assert set(gold) - set(registry.decls) == {"drug_nodes"}

    counts = {}
    for name, df in gold.items():
        shaped = kg_build.to_gold_shape(name, df)
        if name in registry.decls:
            shaped = registry.conform(shaped, name)
            want = registry.struct_type(name)
            assert [
                (f.name, f.dataType.simpleString()) for f in shaped.schema.fields
            ] == [(f.name, f.dataType.simpleString()) for f in want.fields], name
        counts[name] = shaped.count()
        assert counts[name] > 0, f"{name} is empty"

    # determinism: regenerating at the same scale reproduces row counts
    src2 = kg_build.gen_sources(spark, 0.03)
    gold2 = kg_build.build_gold(spark, src2)
    for name in ("ppi_edges", "dti_edges", "gda_edges", "tf_gene_edges"):
        assert kg_build.to_gold_shape(name, gold2[name]).count() == counts[name]


def test_edge_tables_expose_curie_src_dst(spark):
    src = kg_build.gen_sources(spark, 0.03)
    gold = kg_build.build_gold(spark, src)
    shaped = kg_build.to_gold_shape("ppi_edges", gold["ppi_edges"])
    row = shaped.limit(1).collect()[0]
    assert row.src.startswith("uniprot:") and row.dst.startswith("uniprot:")
    shaped = kg_build.to_gold_shape("gda_edges", gold["gda_edges"])
    row = shaped.limit(1).collect()[0]
    assert row.src.startswith("ncbigene:") and row.dst.startswith("MONDO:")
