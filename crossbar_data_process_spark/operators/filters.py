"""Membership / predicate filters (SURVEY.md §2.2, P4–P9).

The reference filters row streams against driver-resident ID sets
(e.g. SwissProt whitelist, reference ppi.py:126,242; record-level ``in``
checks ppi.py:306-308, compound.py:152-153). At cluster scale those sets may
not fit on the driver, so the engine expresses them as *semi/anti joins*
against a keys DataFrame — Catalyst broadcasts the small side automatically
and AQE demotes to broadcast at runtime when post-filter stats are small.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def semi_filter(df: DataFrame, keys_df: DataFrame, on: list[tuple[str, str]]) -> DataFrame:
    """Keep rows of ``df`` whose key exists in ``keys_df`` (reference
    ppi.py:126 ``df[df.a.isin(swissprots)]``). ``on`` is a list of
    (df_col, keys_col) pairs; multi-pair = composite-key membership.

    LEFT SEMI join: no row duplication on multi-match, no columns added,
    and the build side stays distributed (unlike a collected ``isin`` set).
    """
    cond = _eq_cond(df, keys_df, on)
    return df.join(keys_df, cond, "left_semi")


def anti_filter(df: DataFrame, keys_df: DataFrame, on: list[tuple[str, str]]) -> DataFrame:
    """Drop rows of ``df`` whose key exists in ``keys_df`` (reference
    compound.py:179,391 — exclude ChEMBL compounds that map to DrugBank)."""
    cond = _eq_cond(df, keys_df, on)
    return df.join(keys_df, cond, "left_anti")


def membership_filter(df: DataFrame, col: str, values: Iterable[str], keep: bool = True) -> DataFrame:
    """Literal-set membership for genuinely tiny sets (enum whitelists like
    clinical-significance, reference disease.py:777). For anything that could
    grow with the data, use :func:`semi_filter` instead."""
    pred = F.col(col).isin(list(values))
    return df.filter(pred if keep else ~pred)


def blacklist_filter(df: DataFrame, col: str, blacklist: Iterable[str]) -> DataFrame:
    """Drop rows whose evidence code is blacklisted, keeping NULLs
    (reference go.py:435 ``remove_selected_annotations``, default ["IEA"])."""
    c = F.col(col)
    return df.filter(c.isNull() | ~c.isin(list(blacklist)))


def drop_self_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Remove self-edges a==b (reference disease.py:1145,1337)."""
    return df.filter(F.col(a) != F.col(b))


def _eq_cond(df: DataFrame, keys_df: DataFrame, on: list[tuple[str, str]]) -> Column:
    cond = None
    for left, right in on:
        c = df[left] == keys_df[right]
        cond = c if cond is None else (cond & c)
    assert cond is not None, "need at least one join pair"
    return cond
