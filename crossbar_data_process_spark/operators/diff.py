"""Snapshot diff — the change-data-capture primitive an incremental
warehouse needs: given two versions of a keyed table, classify every key
as added / removed / changed / unchanged and name the columns that
changed. Drives incremental downstream recompute (re-process only
changed keys), audit ("what did this refresh do"), and regression gates
("this source should never delete").

Scale shape: ONE full-outer join on the key (the minimum any diff pays —
both sides shuffle once on the same key, co-partitioned), column
comparison as scan-side expressions over the joined row. NULL-safe
equality (`eqNullSafe`) so NULL→value and value→NULL both count as
changes; a NULL key never silently matches.

Versus the reference: the reference re-downloads and overwrites
(drop_duplicates over fresh pulls); diffing versioned snapshots has no
counterpart — engine charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """(keys…, change, changed_cols) — ``change`` ∈ added | removed |
    changed | unchanged; ``changed_cols`` lists the differing columns
    (empty unless changed). ``compare`` defaults to every shared non-key
    column; columns existing on only one side are ignored (schema
    evolution is a separate concern from row-level drift).

    Filter to taste: ``.filter("change <> 'unchanged'")`` is the delta
    feed; aggregate ``change`` for the refresh audit report.
    """
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        e = F.col(f"__k_{k}") == F.col(f"__nk_{k}")
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full_outer")
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in compare
            ]
        ),
        lambda x: x.isNotNull(),
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__k_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
        F.when(change == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
