"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark): the incremental-analytics layer a 100 TB warehouse needs for
"distinct users/documents/entities per X" questions.

The scale idea is the SILVER SKETCH TABLE: aggregate each fine-grained
cell (day × source × …) to a binary HLL sketch ONCE, persist it, and
answer every coarser rollup (month, global, any key subset) by merging
sketches — kilobytes per cell — instead of re-scanning and re-shuffling
the raw corpus per question. Merging is associative/commutative, so
late-arriving partitions just union in; exact distinct at that cadence
would hold per-cell distinct sets (unbounded state) or rescan.

No DuckDB oracle: sketch binaries are library-specific, so this family is
pytest-bounded against exact answers (the declared-query contract allows
rows-only/pytest surfaces for non-SQL-expressible ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch_table(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """The silver table: one row per key combination with a binary HLL
    sketch of the distinct ``value_col`` values — ONE shuffle on the keys,
    map-side partial sketching (sketches merge in the combiner, so hot
    keys cost bytes, not rows). ``lgk`` trades size for accuracy (2^lgk
    buckets; 12 ≈ 1.6% rsd in ~4 KB)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Answer a coarser grouping FROM the silver sketches: union the cell
    sketches per ``keys`` subset and estimate. Never touches the raw data;
    cost is proportional to the number of CELLS, not corpus rows. Pass
    ``keys=[]`` for the global distinct."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*agg)
    return sketches.agg(*agg)


def sketch_estimate(sketch: Column | str) -> Column:
    """Point estimate for a single stored sketch cell."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)
