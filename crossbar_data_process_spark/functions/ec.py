"""EC-number hierarchy derivation (reference ec.py:274-313): an EC code's
ancestors are derived from its dotted structure — "1.2.3.4" is under
"1.2.3.-" under "1.2.-.-" under "1.-.-.-". The reference builds a nested
driver dict; the engine derives parent columns with string expressions and
emits (child, parent, level) hierarchy edges — one narrow projection, no
driver state, trivially 100 TB-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ec_level(col: Column | str) -> Column:
    """1-4: how many components are concrete (non-'-')."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "\\.")
    return F.size(F.filter(parts, lambda x: x != "-"))


def ec_parent(col: Column | str) -> Column:
    """Parent EC code: blank out the last concrete component
    ("1.2.3.4" → "1.2.3.-", "1.2.-.-" → "1.-.-.-", "1.-.-.-" → NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "\\.")
    lvl = ec_level(c)
    keep = lvl - 1
    idx = F.sequence(F.lit(1), F.lit(4))
    parent_parts = F.transform(
        idx, lambda i: F.when(i <= keep, F.element_at(parts, i)).otherwise(F.lit("-"))
    )
    return F.when(lvl > 1, F.array_join(parent_parts, "."))


def ec_hierarchy_edges(
    df: DataFrame, code_col: str = "ec", name_col: str | None = "name"
) -> DataFrame:
    """(child, parent, level) edges for every non-root EC code, excluding
    'Transferred entry'/'Deleted' tombstones (reference ec.py:312)."""
    out = df
    if name_col and name_col in df.columns:
        out = out.filter(
            ~F.col(name_col).startswith("Transferred entry")
            & ~F.col(name_col).startswith("Deleted")
        )
    return (
        out.select(
            F.col(code_col).alias("child"),
            ec_parent(code_col).alias("parent"),
            ec_level(code_col).cast("int").alias("level"),
        )
        .filter(F.col("parent").isNotNull())
    )
