"""Manual key-salting for pathological skew (engine extension; charter:
"skewed keys → salting or AQE skew-join").

The engine's first line of defense is AQE (skew-join splitting and
partition coalescing are on in ``session.py``), which handles skewed
SORT-MERGE joins transparently. Salting is the explicit fallback for the
cases AQE cannot fix:

- a skewed SHUFFLE-HASH join (AQE skew splitting applies to sort-merge);
- aggregations whose per-group ACCUMULATOR is large (collect_set / exact
  distinct), where map-side partial aggregation doesn't shrink the hot
  key's state and one reducer ends up holding the whole hot group.

Both operators are deterministic: the salt is a value hash, not a random
draw, so replays and retries place rows identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt`` shuffle
    partitions: the big side gets a deterministic value-hash salt in
    [0, salt), the small side is replicated ``salt``× (explode over the
    salt range), and the join runs on ``on + [salt]``.

    Each big-side row carries exactly ONE salt value, so no duplicate
    matches are produced and any ``how`` that preserves the big side
    (inner/left/left_semi/left_anti) is semantics-identical to the
    unsalted join. Outer forms that preserve the SMALL side (right/full)
    would emit each unmatched small-side row ``salt`` times, so they are
    rejected. Cost: the small side shuffles ``salt``× its size — worth it
    exactly when one key's rows exceed an executor's share (the 100 TB
    hub-node case: promiscuous kinases in DTI, ultra-common shingles).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would replicate unmatched small-side "
            f"rows {salt}x; only big-side-preserving joins are valid: "
            "inner / left / left_semi / left_anti"
        )
    # The salt must vary WITHIN a hot key's rows, so it hashes row content,
    # not the join key. ``salt_cols`` limits the hash to a few
    # per-row-varying columns — on a wide fact table, hashing every column
    # (strings included) of every row is measurable CPU for no better
    # spread. pmod is already non-negative for negative inputs; wrapping
    # the hash in abs() would ANSI-overflow on Integer.MIN_VALUE
    # (p = 2^-32 per row).
    salt_col = F.pmod(
        F.hash(*[F.col(c) for c in (salt_cols or big.columns)]), F.lit(salt)
    ).cast("int")
    b = big.withColumn(_SALT, salt_col)
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return b.join(s, on + [_SALT], how).drop(_SALT)


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "values",
    salt: int = 8,
) -> DataFrame:
    """Two-stage salted ``collect_set``: stage 1 collects per (keys, salt)
    — the hot group's accumulator is split across ``salt`` reducers —
    stage 2 merges the partial sets per key with an array fold. The result
    is sorted (set semantics have no order; sorting makes it deterministic).

    This is the accumulator-heavy aggregation salting pattern; plain
    sums/counts never need it (map-side partials already shrink them).
    """
    partial = df.groupBy(
        *keys,
        F.pmod(F.hash(F.col(value_col)), F.lit(salt)).alias(_SALT),
    ).agg(F.collect_set(value_col).alias("__part"))
    return partial.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("__part")))
        ).alias(out_col)
    )
