"""ID-mapping joins (SURVEY.md §2.3, J4/J5).

The reference holds cross-reference dictionaries in driver RAM and applies
them row-by-row (ppi.py:209-226 gene-symbol→UniProt, disease.py:1631-1654
vocabulary fallback cascade). The engine keeps every mapping as a DataFrame
and lets the optimizer pick broadcast-hash vs shuffle join — mandatory at
100 TB, where "a dict on the driver" is not a thing.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _maybe_broadcast(df: DataFrame, broadcast: bool | Literal["auto"]) -> DataFrame:
    """Apply the broadcast hint only when forced. Under ``"auto"`` the hint
    is omitted so Catalyst/AQE pick the join strategy from statistics — a
    forced hint overrides the autoBroadcastJoinThreshold, and a mapping
    table that is small at test scale (gene-symbol xrefs) can be tens of GB
    at production scale (full UniProt secondary-accession maps), where a
    forced broadcast OOMs executors."""
    return F.broadcast(df) if broadcast is True else df


def broadcast_map(
    df: DataFrame,
    mapping: DataFrame,
    on: list[tuple[str, str]],
    value_col: str,
    out_col: str,
    how: str = "left",
    drop_ambiguous: bool = False,
    broadcast: bool | Literal["auto"] = "auto",
) -> DataFrame:
    """Attach ``mapping[value_col]`` as ``out_col`` by equi-join
    (reference J4: dict lookups, ppi.py:209-226).

    Multi-key ``on`` covers the BioGRID variant (symbol AND taxon equality,
    ppi.py:212). A multimap (one key → many values, ppi.py:204-207) fans rows
    out; ``drop_ambiguous=True`` reproduces the reference's policy of
    discarding ambiguous mappings (ppi.py:238 drops symbols that map to 2+
    UniProts) by pre-filtering the mapping to unique keys — done with a
    window on the *mapping* side (small), never on the fact table.

    ``broadcast``: ``"auto"`` (default) leaves strategy choice to
    Catalyst/AQE stats; ``True`` forces a broadcast hint (opt-in for
    mappings known small at every scale); ``False`` never hints.
    """
    keys = [m for _, m in on]
    if drop_ambiguous:
        w = Window.partitionBy(*keys)
        mapping = (
            mapping.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
    sel = mapping.select(*keys, F.col(value_col).alias(out_col))
    cond = None
    for left, right in on:
        c = df[left] == sel[right]
        cond = c if cond is None else (cond & c)
    out = df.join(_maybe_broadcast(sel, broadcast), cond, how)
    return out.drop(*[sel[m] for m in keys])


def fallback_map(
    df: DataFrame,
    mappings: list[tuple[DataFrame, str, str]],
    key_col: str,
    out_col: str,
    broadcast: bool | Literal["auto"] = "auto",
) -> DataFrame:
    """Chained fallback-priority lookup (reference J5): try vocabularies in
    order, keep the first hit (disease.py:1631-1654 UMLS→MONDO→DO→EFO→…;
    disease.py:640-674 MeSH→OMIM→ICD-10).

    ``mappings`` is ordered ``[(mapping_df, map_key_col, map_val_col), ...]``.
    Implemented as one left join per vocabulary + ``F.coalesce`` in priority
    order — N lookup joins, zero shuffles of the fact table under broadcast,
    instead of the reference's per-row dict-cascade. ``broadcast`` as in
    :func:`broadcast_map` — default ``"auto"`` lets AQE choose per
    vocabulary from stats.
    """
    out = df
    hit_cols: list[str] = []
    for i, (m, mk, mv) in enumerate(mappings):
        hc = f"__fb{i}"
        # dedupe mapping keys deterministically (min value) — the reference
        # silently picked an arbitrary element (compound.py:303, SURVEY §7.2c)
        m1 = m.groupBy(F.col(mk).alias(f"__k{i}")).agg(F.min(mv).alias(hc))
        out = out.join(
            _maybe_broadcast(m1, broadcast), out[key_col] == m1[f"__k{i}"], "left"
        ).drop(f"__k{i}")
        hit_cols.append(hc)
    out = out.withColumn(out_col, F.coalesce(*[F.col(h) for h in hit_cols]))
    return out.drop(*hit_cols)
