"""Top-k / ranking operators (SURVEY.md §2.6).

The reference's per-query top-k is the DisGeNET API ``limit`` param
(disgenet_local.py:117,163,1344, default 10); its keep-first-after-sort is
O1/W1. Engine form: rank window per group — one shuffle on the group key,
no global sort, skew split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    k: int,
    rank_col: str | None = "rnk",
) -> DataFrame:
    """Top-k rows per group. ``order_by`` should be a total order for
    deterministic results (include tiebreakers). ``rank_col=None`` drops the
    rank from the output."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("__rnk", F.row_number().over(w)).filter(F.col("__rnk") <= k)
    if rank_col:
        return out.withColumnRenamed("__rnk", rank_col)
    return out.drop("__rnk")


def global_top_k(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
    — per-partition heaps + driver merge, never a full sort. This is the
    scale-safe form of the reference's sort-then-head idiom."""
    return df.orderBy(*order_by).limit(k)
