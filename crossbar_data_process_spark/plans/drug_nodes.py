"""Drug node assembly — reference ``process_drugbank_node_data``
(node_data/drug.py:245-280) + ``get_drug_nodes`` (drug.py:1191-1220).

Reference semantics reproduced:
- the DrugBank core record is the anchor: every drug node exists iff it has
  a DrugBank entry (drug.py:256-266 iterates drugbank_drugs_detailed);
- external-database and UniChem mappings overlay the core dict
  (``drug._asdict() | mappings`` at drug.py:259-263) — fields present in a
  mapping override the core value, missing fields stay NULL;
- optional InChI/InChIKey properties attach from a separate table
  (drug.py:268-272);
- ``get_drug_nodes`` prop hygiene (drug.py:1203-1213): keep only
  ``node_fields``, normalize prop keys (spaces → ``_``, lower-case), strip
  ``'`` → ``^`` in string values (F4), drop empty values;
- node id = ``drugbank:<id>`` CURIE (drug.py:1199, F6).

Engine form: a wide-gather of per-attribute tables 1:1 left-joined on
drugbank_id (the proven uniprot.assemble_nodes shape — all joins share one
key, so consecutive sort-merge joins reuse a single exchange; bucketed
silver attribute tables make the gather shuffle-free at scale), then one
``to_node_rows`` projection that builds the (id, label, props map) sink
contract for the BioCypher tuple writer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.ids import add_curie_prefix


def assemble_drug_nodes(
    core: DataFrame,
    overlays: list[DataFrame],
    key: str = "drugbank_id",
) -> DataFrame:
    """Anchor on the DrugBank core table and left-join each overlay
    (external mappings, UniChem xrefs, InChI properties) 1:1 on
    ``drugbank_id``. Overlay columns that collide with core columns
    override where non-null (the reference's dict-union semantics,
    drug.py:259-263: the mapping value wins when present)."""

    def overlay_one(acc: DataFrame, nxt: DataFrame) -> DataFrame:
        shared = (set(acc.columns) & set(nxt.columns)) - {key}
        a, n = acc.alias("a"), nxt.alias("n")
        joined = a.join(n, on=key, how="left")
        cols = [F.col(key)]
        for c in acc.columns:
            if c == key:
                continue
            if c in shared:
                # dict-union: overlay wins when it has a value
                cols.append(
                    F.coalesce(F.col(f"n.{c}"), F.col(f"a.{c}")).alias(c)
                )
            else:
                cols.append(F.col(f"a.{c}").alias(c))
        for c in nxt.columns:
            if c != key and c not in shared:
                cols.append(F.col(f"n.{c}").alias(c))
        return joined.select(*cols)

    return reduce(overlay_one, overlays, core)


def to_node_rows(
    wide: DataFrame,
    node_fields: list[str],
    label: str = "drug",
    key: str = "drugbank_id",
) -> DataFrame:
    """The get_drug_nodes projection (drug.py:1199-1216): CURIE id, label,
    and a props map of the kept fields — keys space→underscore lower-cased,
    string values ``'``-sanitized, NULL/empty values dropped (the sink's
    contract also drops NULLs; doing it here keeps the map dense)."""
    kept = [c for c in node_fields if c in wide.columns]
    entries = []
    for c in kept:
        norm_key = c.replace(" ", "_").lower()
        v = F.col(c)
        if dict(wide.dtypes)[c] == "string":
            # the node writer only strips quotes (drug.py:1208) — narrower
            # than the F4 graph-char sanitizer used on edge props
            v = F.translate(v, "'", "^")
            keep = v.isNotNull() & (v != "")
        else:
            v = v.cast("string")
            keep = v.isNotNull()
        entries.append(
            F.when(keep, F.struct(F.lit(norm_key).alias("k"), v.alias("v")))
        )
    props = F.map_from_entries(
        F.filter(F.array(*entries), lambda e: e.isNotNull())
    )
    return wide.select(
        add_curie_prefix(key, "drugbank").alias("id"),
        F.lit(label).alias("label"),
        props.alias("props"),
    )
