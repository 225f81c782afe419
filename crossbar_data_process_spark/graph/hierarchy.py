"""Ontology / hierarchy closure (SURVEY.md §1.1: MONDO/HPO/GO/EC DAGs —
disease.py:231-238, go.py:465-476, ec.py:274-313).

``transitive_closure`` computes ancestor→descendant reachability by iterated
join (doubling would halve iterations; linear join keeps per-step size
bounded for shallow ontologies, which is the real workload: GO/MONDO depth
≈ 15). Each iteration: newfrontier = frontier ⋈ edges, shuffle on the join
key only; results accumulate via distinct union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    parent_col: str = "parent",
    child_col: str = "child",
    max_iters: int = 20,
) -> DataFrame:
    """All (ancestor, descendant) pairs reachable via parent→child edges.

    Stops early when an iteration adds no new pairs. At cluster scale,
    checkpoint/persist every few iterations to cut lineage; here iterations
    are few (ontology depth), so persist-per-step suffices.
    """
    base = edges.select(
        F.col(parent_col).alias("ancestor"), F.col(child_col).alias("descendant")
    ).distinct()
    closure = base.persist()
    frontier = base
    for _ in range(max_iters):
        ext = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.descendant") == F.col("e.ancestor"))
            .select(
                F.col("f.ancestor").alias("ancestor"),
                F.col("e.descendant").alias("descendant"),
            )
            .distinct()
        )
        new = ext.join(closure, ["ancestor", "descendant"], "left_anti").persist()
        if new.isEmpty():
            break
        closure = closure.unionByName(new).persist()
        frontier = new
    return closure


def ancestors_of(closure: DataFrame, node: str) -> DataFrame:
    """All ancestors of one term (the reference's per-term ontology walks,
    e.g. GO ancestor queries go.py:465-476)."""
    return closure.filter(F.col("descendant") == node).select("ancestor")
