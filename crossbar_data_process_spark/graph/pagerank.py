"""PageRank as an iterative DataFrame program (GraphX-equivalent).

Fixed iteration count for determinism (no float-tolerance convergence test —
results must be reproducible for the correctness harness). Contributions
aggregate with a groupBy on dst (one shuffle per iteration); dangling-node
mass is redistributed uniformly, matching the standard formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Returns (id, rank), sum of ranks = 1. Deterministic given fixed iters."""
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src_col).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = nodes.select(
        F.col(id_col).alias("id"), F.lit(1.0 / n_nodes).alias("rank")
    )
    e = edges.select(F.col(src_col).alias("esrc"), F.col(dst_col).alias("edst"))
    for _ in range(iters):
        with_deg = ranks.join(out_deg, "id", "left")
        contribs = (
            e.join(with_deg, e["esrc"] == with_deg["id"])
            .select("edst", (F.col("rank") / F.col("out_deg")).alias("contrib"))
            .groupBy(F.col("edst").alias("id"))
            .agg(F.sum("contrib").alias("recv"))
        )
        # dangling mass stays a 1-row DataFrame broadcast into the update —
        # no per-iteration driver collect (anti-pattern at scale; the whole
        # loop remains one lazy plan per iteration)
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        ranks = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("recv"), F.lit(0.0))
                        + F.col("__dangling") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        ).persist()
    return ranks
