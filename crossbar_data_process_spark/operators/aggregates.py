"""The reference's custom aggregate dialect X1–X6 (SURVEY.md §2.9) as pure
Column expressions — no UDAFs, no Python in the hot path; everything stays
inside whole-stage codegen and gets map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def agg_median(col: str | Column, scale: int = 3) -> Column:
    """X1 ``get_median``: median of non-null values rounded to 3 dp
    (reference compound.py:461-462, drug.py:1374-1375). Spark's ``median``
    is the exact continuous median (interpolated on even counts), matching
    pandas ``Series.median``."""
    return F.round(F.median(col), scale)


def agg_middle_row(value_col: str | Column, sort_col: str | Column | None = None) -> Column:
    """X2 ``get_middle_row``: the element at index ``len//2`` of the group's
    non-null values in sorted order (reference compound.py:464-474,
    drug.py:1377-1387: ``len//2`` for odd, ``round(len/2 + 1e-5)`` for even
    — both reduce to ``len//2`` 0-based, i.e. ``len//2 + 1`` 1-based).

    The reference relies on a prior global ``sort_values``; the engine makes
    the ordering explicit: collect, sort, index — one expression, no UDAF.
    ``sort_col`` defaults to the value itself (the reference sorts by the
    activity value then middle-picks aligned categorical columns; pass the
    struct form for that case).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    arr = F.sort_array(F.collect_list(v))
    return F.get(arr, F.floor(F.size(arr) / 2).cast("int"))  # 0-based len//2


def agg_middle_row_by(sort_col: str | Column, value_col: str | Column) -> Column:
    """X2 variant used by the compound/drug CTI group-bys
    (compound.py:199-210, drug.py:832-844): the group is pre-sorted by
    ``activity_value`` and ``get_middle_row`` picks the *aligned* value of a
    different column at index ``len//2`` of the non-null values.

    Engine form: collect (sort_key, value) structs for non-null values,
    sort, index — the value itself is the tiebreaker for determinism where
    the reference depended on input order."""
    s = F.col(sort_col) if isinstance(sort_col, str) else sort_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pairs = F.collect_list(F.when(v.isNotNull(), F.struct(s.alias("k"), v.alias("v"))))
    arr = F.sort_array(pairs)
    return F.get(arr, F.floor(F.size(arr) / 2).cast("int"))["v"]


def pipe_union_agg(col: str | Column, delim: str = "\\|") -> Column:
    """X3 ``aggregate_column_level``: union of delimiter-split tokens across
    the group, deduped, NULL if empty (reference compound.py:476-490,
    drug.py:1360-1372). Engine policy (SURVEY §7.0): arrays stay native;
    render the ``|``-string only at export via ``F.array_join``.

    Returns a sorted array for deterministic output — the reference used an
    unordered ``set`` so element order was unspecified; we pin sort order.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.flatten(F.collect_list(F.split(c, delim)))
    arr = F.array_sort(F.array_distinct(toks))
    return F.when(F.size(arr) > 0, arr)


def ordered_union(left: Column, right: Column) -> Column:
    """X4 ``merge_source_column``: order-preserving dedup union of two array
    columns (reference ppi.py:414-428 ``dict.fromkeys`` over x+y).
    ``array_distinct(concat(...))`` keeps first occurrence, matching
    ``dict.fromkeys`` exactly."""
    return F.when(left.isNull() & right.isNull(), F.lit(None)).otherwise(
        F.array_distinct(F.concat(F.coalesce(left, F.array()), F.coalesce(right, F.array())))
    )


def tf_effect_resolve(col: str | Column, unknown: str = "Unknown") -> Column:
    """X5 ``find_conflicting_tf_effects`` (reference tf_gen.py:381-395):
    over the group's distinct effects —
    >2 distinct → NULL; exactly 1 → it; {Unknown, X} → X;
    {Activation, Repression} → NULL.

    Implemented as array logic over ``collect_set`` with Unknown removed
    first: after ``array_except(set, [Unknown])`` — 0 left → Unknown was the
    only value (or empty → NULL); 1 left → that value; 2+ left → conflict
    NULL. Exactly the reference ladder.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.collect_set(c)
    rest = F.array_except(s, F.array(F.lit(unknown)))
    return (
        F.when(F.size(s) == 0, F.lit(None))
        .when(F.size(rest) == 0, F.lit(unknown))
        .when(F.size(rest) == 1, F.element_at(rest, 1))
        .otherwise(F.lit(None))
    )


def conflict_resolve(col: str | Column) -> Column:
    """X6 ``detect_conflicting_action_type`` (reference drug.py:902-907):
    more than one distinct non-null value in the group → NULL, else the
    single value."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.collect_set(c)
    return F.when(F.size(s) == 1, F.element_at(s, 1))
