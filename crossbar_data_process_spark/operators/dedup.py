"""Deduplication operators (SURVEY.md §2.4 A2/A3/A4, plus LLM-pipeline
exact/near-dup over documents — see operators/textdedup.py for MinHash et al).

Scale notes: every dedup here is a single hash-shuffle on the dedup key
(window or groupBy); no global sort. The reference instead sorts the whole
table then drops duplicates (ppi.py:135-142) — a full sort that would not
survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_best(
    df: DataFrame,
    keys: list[str],
    order_by: list,
) -> DataFrame:
    """Keep the best row per key group — the reference's
    sort-then-drop_duplicates(keep="first") idiom (A2/W1: ppi.py:135-137,
    disease.py:631-633, orthology.py:204-206).

    ``order_by`` is a list of Column orderings (e.g. ``[F.desc("score")]``).
    Pass a total order (include tiebreaker columns) for deterministic output.
    Implemented as row_number over a window partitioned by ``keys`` — one
    shuffle on the group key, map-side-combinable, skew handled by AQE —
    instead of the reference's global sort.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Plain dedup, no ordering semantics (A3: tf_gen.py:181,
    side_effect.py:201, pathway.py:219...). dropDuplicates = hash-groupBy."""
    return df.dropDuplicates(subset)


def canonicalize_undirected(
    df: DataFrame, a: str, b: str, u: str = "u", v: str = "v"
) -> DataFrame:
    """Add canonical pair columns (u,v) = (least, greatest) of an undirected
    edge — the engine's reusable form of the reference's frozenset keys
    (ppi.py:142)."""
    return df.withColumn(u, F.least(F.col(a), F.col(b))).withColumn(
        v, F.greatest(F.col(a), F.col(b))
    )


def dedup_undirected(
    df: DataFrame,
    a: str,
    b: str,
    extra_keys: list[str] | None = None,
    order_by: list | None = None,
    keep_orientation: bool = True,
) -> DataFrame:
    """Symmetric-pair (undirected edge) dedup (A4): drop B→A when A→B is
    already present, keyed on the unordered pair plus optional extra columns
    (the reference keys frozensets on pair+interaction_type at ppi.py:142,
    pair+method at :254, pair+score at :370; orthology.py:206; drug.py:640).

    ``order_by`` selects which duplicate survives (the reference pre-sorts by
    score so the best-scored orientation wins, ppi.py:135+142 — SURVEY §4
    notes the kept row is the *full original row*, orientation included).
    With ``keep_orientation`` the surviving row keeps its original (a,b)
    direction; otherwise columns are rewritten to the canonical order.
    """
    extra_keys = extra_keys or []
    cdf = canonicalize_undirected(df, a, b, "__u", "__v")
    order = order_by or [F.col("__u")]
    out = keep_best(cdf, ["__u", "__v", *extra_keys], order)
    if keep_orientation:
        return out.drop("__u", "__v")
    return (
        out.withColumn(a, F.col("__u")).withColumn(b, F.col("__v")).drop("__u", "__v")
    )
