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
    checkpoint_every: int = 5,
) -> DataFrame:
    """All (ancestor, descendant) pairs reachable via parent→child edges.

    Stops early when an iteration adds no new pairs.

    Cache hygiene: each iteration fully materializes the new closure, then
    releases the superseded closure and frontier caches, so storage stays
    O(1) in depth; every ``checkpoint_every`` iterations BOTH the closure and
    the frontier lineages are truncated with ``localCheckpoint``. The
    frontier is the recursion carrier — its plan embeds the previous closure,
    which embeds all prior frontiers, so skipping it makes the logical plan
    (and driver-side analysis cost) grow exponentially with depth even
    though every step is cached.
    """
    base = edges.select(
        F.col(parent_col).alias("ancestor"), F.col(child_col).alias("descendant")
    ).distinct()
    base = base.persist()  # joined every iteration — cached for the whole loop
    closure = base
    frontier = base
    prev_frontier = None
    for i in range(max_iters):
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
        done = new.isEmpty()
        if prev_frontier is not None:
            prev_frontier.unpersist(blocking=False)
            prev_frontier = None
        if done:
            new.unpersist(blocking=False)
            break
        superseded = closure
        closure = closure.unionByName(new)
        if (i + 1) % checkpoint_every == 0:
            closure = closure.localCheckpoint(eager=True)
            truncated = new.localCheckpoint(eager=True)
            new.unpersist(blocking=False)
            new = truncated
        else:
            closure = closure.persist()
            closure.count()  # materialize before releasing the predecessor
        if superseded is not base:  # base stays cached for the loop's joins
            superseded.unpersist(blocking=False)
        frontier = new
        prev_frontier = new
    if closure is not base:
        base.unpersist(blocking=False)
    return closure


def ancestors_of(closure: DataFrame, node: str) -> DataFrame:
    """All ancestors of one term (the reference's per-term ontology walks,
    e.g. GO ancestor queries go.py:465-476)."""
    return closure.filter(F.col("descendant") == node).select("ancestor")
