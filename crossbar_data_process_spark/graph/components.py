"""Connected components via iterative min-label propagation (the GraphX/
Pregel algorithm expressed as DataFrame joins).

Each node starts labeled with its own id; every iteration each node adopts
the min label among itself and its neighbors; stop when no label changes.
Per iteration: one shuffle keyed on node id (groupBy min), one broadcast-or-
shuffle join labels⋈edges. Converges in O(diameter) iterations — large-
diameter graphs would want the alternating small-star/large-star algorithm;
biomedical KGs and similarity graphs are low-diameter, so plain propagation
is the right trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 30,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns (id, component) with component = min node id in the component.

    ``nodes``: one column ``id_col``; ``edges``: ``src_col``/``dst_col``
    (undirected semantics — both directions are propagated).

    Cache hygiene: the superseded iteration's labels are unpersisted only
    after the new iteration is FULLY materialized (``count()`` — an
    ``isEmpty`` probe alone computes partitions only up to the first hit),
    so storage is O(1) in iteration count with no recompute cascade; lineage
    is truncated with ``localCheckpoint`` every ``checkpoint_every``
    iterations so long propagation chains don't grow the plan unboundedly.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).persist()
    prev = labels
    for i in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["a"] == labels["id"])
            .groupBy(F.col("b").alias("id2"))
            .agg(F.min("component").alias("nbr_comp"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["id2"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_comp"), F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint(eager=True)
            changed = not updated.filter(F.col("__changed")).isEmpty()
            released, prev = prev, None
        else:
            updated = updated.persist()
            # ONE job doubling as materialization and convergence probe:
            # counting the changed rows scans EVERY partition of `updated`
            # into the cache (an isEmpty probe alone stops at the first hit,
            # leaving most partitions uncomputed — dropping the predecessor
            # then forces a recompute cascade through uncached lineage).
            changed = updated.filter(F.col("__changed")).count() > 0
            released, prev = prev, updated
        if released is not None:
            released.unpersist(blocking=False)
        labels = updated.drop("__changed")
        if not changed:
            break
    return labels
