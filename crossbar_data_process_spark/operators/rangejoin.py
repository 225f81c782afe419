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
    points with NULL interval columns (implemented as inner + anti-join
    union so the bucket replication can never duplicate an unmatched
    point). Intervals with ``lo > hi`` or NULL bounds match nothing;
    NULL points match nothing.
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
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    matched = (
        p.join(iv, _BUCKET)
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    # left: unmatched points get NULLs for every interval column
    unmatched = points.join(
        matched.select(*points.columns), points.columns, "left_anti"
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)
