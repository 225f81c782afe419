"""Time-series joins (engine extension; SURVEY §2.3 family): the bucketed
point-in-interval range join, and the generalized backward as-of join
(:func:`asof_join` — q48 is its single-table oracled form).

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
from pyspark.sql import types as T
from pyspark.sql.window import Window

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact: bool = False,
) -> DataFrame:
    """Backward as-of join (time-series family, the generalized form of the
    oracled q48): for every ``left`` row, attach ``value_cols`` (and the
    match time, as ``matched_<right_ts>``) from the LATEST ``right`` row of
    the same ``by`` key with ``right_ts < left_ts`` (``<=`` when
    ``allow_exact``). Unmatched left rows keep NULLs — left rows are never
    dropped.

    Plan shape — the shuffle-once union+window pattern, not a join: both
    sides union into one frame, ONE shuffle on ``by`` sorts each key's
    timeline, and a last-non-null window propagates the most recent right
    values to each left row. A naive formulation (range join on
    ``right_ts < left_ts`` + keep-latest) is O(n·m) comparisons per key
    and a second aggregation; this is O((n+m) log(n+m)) per key and one
    exchange. All value columns + the match time travel in ONE struct, so
    they always come from the SAME right row. Equal-timestamp ties among
    MULTIPLE right rows are broken by the last in (ts, values) struct sort
    order; give ``right`` unique (by, right_ts) rows for fully defined
    semantics. Right rows with NULL ``right_ts`` are dropped (the as-of
    predicate is unknowable for them).
    """
    overlap = (set(left.columns) & set(right.columns)) - {by}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; rename "
            "one side first"
        )
    matched_ts = f"matched_{right_ts}"
    internal = {"__tie", "__ts", "__pack", "__last"}
    reserved = (set(left.columns) | set(right.columns)) & (
        internal | {matched_ts}
    )
    if reserved:
        raise ValueError(
            f"input columns {sorted(reserved)} collide with asof_join's "
            "internal/output names; rename them first"
        )
    if "__mts" in value_cols:
        raise ValueError("value column '__mts' collides with the internal "
                         "match-timestamp field; rename it first")
    # right rows sort BEFORE the left row at equal ts iff exact matches
    # count; the window ends at -1 (strictly preceding rows) either way
    right_tie = 0 if allow_exact else 2
    # ONE struct carries all value columns + the match timestamp, so a
    # single last(ignorenulls) picks ONE right row atomically — per-column
    # windows could mix values from different right rows whenever the
    # latest preceding row holds a NULL in some value column.
    pack_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
        + [T.StructField("__mts", right.schema[right_ts].dataType)]
    )
    l = left.select(
        "*",
        F.lit(1).alias("__tie"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(pack_type).alias("__pack"),
    )
    # NULL right_ts rows would sort NULLS FIRST (i.e. before every left
    # row) and propagate values despite the as-of predicate being
    # unknowable for them — drop them up front.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(by),
        F.lit(right_tie).alias("__tie"),
        F.col(right_ts).alias("__ts"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("__mts"),
        ).alias("__pack"),
    )
    combined = l.unionByName(r, allowMissingColumns=True)
    # struct ordering (field-by-field) deterministically breaks ties among
    # multiple right rows at the same ts; left rows' NULL packs are
    # skipped by ignorenulls so their relative order is irrelevant
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__tie", "__pack")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = combined.withColumn(
        "__last", F.last("__pack", ignorenulls=True).over(w)
    )
    return out.filter(F.col("__tie") == 1).select(
        *left.columns,
        *[F.col(f"__last.{c}").alias(c) for c in value_cols],
        F.col("__last.__mts").alias(matched_ts),
    )
