"""Bucketed range join (engine extension; SURVEY §2.3 time-series family —
as-of joins are q48, this is the interval cousin).

Spark plans a plain ``point BETWEEN lo AND hi`` join as a
BroadcastNestedLoopJoin (small side) or a cartesian (neither side small) —
both scale-wrong: O(n·m) comparisons regardless of how selective the
ranges are. The standard fix is bucketing: quantize the value axis into
fixed-width buckets, replicate each interval into every bucket it
overlaps, give each point its single containing bucket, equi-join on the
bucket id, then verify the exact predicate. Comparisons drop from n·m to
sum over buckets of (points × intervals) — data-local, shuffle on an int
key, AQE-splittable.

Picking ``bucket_width``: ≈ the median interval length. Much wider →
many intervals per bucket (verify does more work); much narrower → each
interval replicates into many buckets (shuffle volume). Replication per
interval is ``len/width + 1`` exactly.

A (point, interval) match is emitted exactly once — the point lives in
ONE bucket and the interval has ONE copy in that bucket — so no distinct
pass is needed (dedup-free by construction, unlike band-LSH candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[lo_col, hi_col]`` (inclusive both ends) contains ``point_col``.

    ``how='inner'`` emits matches only; ``how='left'`` keeps unmatched
    points with NULL interval columns. Both forms are a SINGLE join with
    the containment predicate folded into the join condition — the equi
    part (bucket id) drives the shuffle, the range part rides along as
    the join's residual condition, so Spark still plans a
    SortMergeJoin/ShuffledHashJoin, never a nested loop. The left form
    therefore scans ``points`` exactly once and never compares data
    columns for equality (an earlier anti-join formulation mis-handled
    NULL-bearing point rows, because ``NULL = NULL`` is not true in join
    equality). Intervals with ``lo > hi`` or NULL bounds match nothing;
    NULL points match nothing (under ``how='left'`` they surface once,
    NULL-padded).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"bucketed_range_join: how={how!r} not supported")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share column names {sorted(overlap)}; "
            "rename one side first — the output carries both schemas"
        )
    iv_bucket = _BUCKET + "_iv"
    reserved = {_BUCKET, iv_bucket} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            f"input columns {sorted(reserved)} collide with the join's "
            "internal bucket columns; rename them first"
        )

    w = float(bucket_width)
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    iv = (
        intervals.filter(
            F.col(lo_col).isNotNull()
            & F.col(hi_col).isNotNull()
            & (F.col(lo_col) <= F.col(hi_col))
        )
        .withColumn(
            iv_bucket,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    # Equi key (bucket) + residual range predicate in ONE join condition:
    # Catalyst extracts the equality as the shuffle key and keeps the
    # BETWEEN as the join's residual filter, so 'left' needs no second
    # scan of `points` and no equality comparison on data columns.
    cond = (
        (F.col(_BUCKET) == F.col(iv_bucket))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    return p.join(iv, cond, how).drop(_BUCKET, iv_bucket)
