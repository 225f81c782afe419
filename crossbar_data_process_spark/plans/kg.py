"""Multi-hop KG pattern queries (motifs) — the composition CROssBAR's KG
serves: the reference emits the constituent edge tables
(drug→target at node_data/drug.py:1222-1251, gene→disease at
node_data/disease.py:1423-1466) and leaves traversal to the graph DB; the
engine provides the 2-hop join as a named, scale-shaped operator so the
same question (which diseases does a drug reach through its targets?) runs
as one Catalyst plan over the gold edge tables.

Plan shape (designed, not incidental):
- hop join keyed on the INTERMEDIATE node (one shuffle per edge table —
  at scale these are the silver tables, bucketed on the hop key, making
  the join shuffle-free);
- then ONE repartition on the source key, reused by BOTH the per-(src,dst)
  path aggregation and the per-src top-k window: HashPartitioning(src)
  satisfies ClusteredDistribution(src, dst) (partitioning exprs ⊆ grouping
  keys) and the window's PARTITION BY src, so Catalyst inserts no further
  exchange — verified by tests/test_kg_motifs.py counting exchanges.
  Trade: partitioning by src alone is more skew-prone than (src, dst);
  hub sources (promiscuous drugs) are AQE-split, and the aggregation
  still map-side-combines before the exchange.
- no cartesian anywhere: both hops are equi-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def two_hop_paths(
    edges_ab: DataFrame,
    edges_bc: DataFrame,
    src: str = "src",
    mid: str = "mid",
    dst: str = "dst",
    score_ab: str | None = None,
    score_bc: str | None = None,
    k: int | None = None,
) -> DataFrame:
    """A→B→C path aggregation with optional per-source top-k.

    ``edges_ab``: (src, mid [, score_ab]); ``edges_bc``: (mid, dst
    [, score_bc]). Returns one row per (src, dst) pair with
    ``n_paths`` — the number of A→B→C paths counted WITH edge
    multiplicity: duplicate (src, mid) or (mid, dst) edge rows each
    contribute a path, so feed deduplicated edge tables (the gold tables
    are) if "distinct intermediate witnesses" is the intended reading —
    and, when both
    score columns are given, ``best_score`` = max over paths of
    score_ab·score_bc (max of per-path products — no float-sum
    order-dependence, so the result is bit-stable across engines). With
    ``k``, keeps the top-k destinations per source by (best_score desc,
    dst asc) as ``rnk``.
    """
    a = edges_ab.alias("ab")
    b = edges_bc.alias("bc")
    joined = a.join(b, F.col(f"ab.{mid}") == F.col(f"bc.{mid}"))

    path_score: Column | None = None
    if score_ab is not None and score_bc is not None:
        path_score = F.col(f"ab.{score_ab}") * F.col(f"bc.{score_bc}")

    aggs = [F.count(F.lit(1)).alias("n_paths")]
    if path_score is not None:
        joined = joined.withColumn("__ps", path_score)
        aggs.append(F.max("__ps").alias("best_score"))

    paths = (
        joined.select(
            F.col(f"ab.{src}").alias(src),
            F.col(f"bc.{dst}").alias(dst),
            *([F.col("__ps")] if path_score is not None else []),
        )
        # the ONE post-join exchange: reused by groupBy(src, dst) AND the
        # top-k window (see module docstring)
        .repartition(src)
        .groupBy(src, dst)
        .agg(*aggs)
    )
    if k is None:
        return paths
    order = (
        [F.desc("best_score"), F.asc(dst)]
        if path_score is not None
        else [F.desc("n_paths"), F.asc(dst)]
    )
    w = Window.partitionBy(src).orderBy(*order)
    return (
        paths.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def _fold_frontier(cur: DataFrame, score: str | None) -> DataFrame:
    """Collapse the running path frame to one row per (src, frontier-node):
    path counts sum, the running score product keeps its max. This is the
    dynamic-programming step that makes N-hop state O(reachable pairs)
    instead of O(paths)."""
    aggs = [F.sum("__n").cast("long").alias("__n")]
    if score:
        aggs.append(F.max("__p").alias("__p"))
    return cur.groupBy("__s", "__m").agg(*aggs)


def chain_frontier(
    edges: list[DataFrame],
    src: str = "src",
    dst: str = "dst",
    score: str | None = None,
    aggregate_hops: bool = False,
) -> DataFrame:
    """The running frame after folding all hops, BEFORE the final
    per-(src, dst) aggregation: columns (``src``, ``node``, ``n_paths``
    [, ``best_score``]). With ``aggregate_hops=False`` there is one row per
    surviving PATH (n_paths is 1 per row); with ``True`` one row per
    reachable (src, node) pair — the observable that
    ``tests/test_kg_motifs.py`` uses to prove the growth cap."""
    assert len(edges) >= 2
    cur = edges[0].select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__m"),
        F.lit(1).cast("long").alias("__n"),
        *([F.col(score).alias("__p")] if score else []),
    )
    if aggregate_hops:
        cur = _fold_frontier(cur, score)
    for hop in edges[1:]:
        nxt = hop.select(
            F.col(src).alias("__m2"),
            F.col(dst).alias("__d"),
            *([F.col(score).alias("__q")] if score else []),
        )
        cur = cur.join(nxt, F.col("__m") == F.col("__m2")).select(
            "__s",
            F.col("__d").alias("__m"),
            "__n",
            *(
                [(F.col("__p") * F.col("__q")).alias("__p")]
                if score
                else []
            ),
        )
        if aggregate_hops:
            cur = _fold_frontier(cur, score)
    return cur.select(
        F.col("__s").alias(src),
        F.col("__m").alias("node"),
        F.col("__n").alias("n_paths"),
        *([F.col("__p").alias("best_score")] if score else []),
    )


def chain_paths(
    edges: list[DataFrame],
    src: str = "src",
    dst: str = "dst",
    score: str | None = None,
    k: int | None = None,
    aggregate_hops: bool = False,
) -> DataFrame:
    """N-hop generalization of :func:`two_hop_paths`: fold of hop joins,
    each keyed on its intermediate node. Every frame in ``edges`` has
    (``src``, ``dst`` [, ``score``]); hop i's ``dst`` joins hop i+1's
    ``src``. Returns (src, dst, n_paths [, best_score]) per endpoint pair,
    where best_score = max over full paths of the product of hop scores
    (products only — no float-sum order dependence). With ``k``, top-k
    destinations per source.

    Scale: hop i's join shuffles on the hop-i intermediate key (bucketed
    silver edge tables make each shuffle-free). By default the running
    frame carries one row per PATH, which explodes on hub-heavy graphs
    (fan-out f over h hops ⇒ f^h rows). ``aggregate_hops=True`` bounds
    state to one row per reachable (src, frontier-node) pair by folding
    between hops — path counts SUM (exact: the matrix-power recurrence)
    and the running product keeps its MAX. The max-product fold is exact
    only for NON-NEGATIVE scores (a negative hop score could flip the
    order of a pruned prefix); affinities/associations are non-negative.
    One extra (src, node) shuffle per hop is the price of bounded state —
    at 100 TB on a hub-heavy KG that trade is mandatory, not optional.
    The 2-hop named form needs no cap.
    """
    cur = chain_frontier(
        edges, src=src, dst=dst, score=score, aggregate_hops=aggregate_hops
    ).select(
        F.col(src).alias("__s"),
        F.col("node").alias("__m"),
        F.col("n_paths").alias("__n"),
        *([F.col("best_score").alias("__p")] if score else []),
    )
    aggs = [F.sum("__n").cast("long").alias("n_paths")]
    if score:
        aggs.append(F.max("__p").alias("best_score"))
    paths = (
        cur.select(
            F.col("__s").alias(src),
            F.col("__m").alias(dst),
            "__n",
            *([F.col("__p")] if score else []),
        )
        .repartition(src)  # reused by the agg AND the top-k window
        .groupBy(src, dst)
        .agg(*aggs)
    )
    if k is None:
        return paths
    order = (
        [F.desc("best_score"), F.asc(dst)]
        if score
        else [F.desc("n_paths"), F.asc(dst)]
    )
    w = Window.partitionBy(src).orderBy(*order)
    return paths.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).filter(F.col("rnk") <= k)


def drug_target_disease_paths(
    dti_edges: DataFrame,
    gda_edges: DataFrame,
    k: int = 3,
) -> DataFrame:
    """The named CROssBAR composition: drug→target (DTI gold,
    plans/dti.py) ⋈ target→disease (gene–disease gold,
    plans/gene_disease.py), scored by affinity·association, top-``k``
    diseases per drug.

    ``dti_edges``: (drug, target, affinity); ``gda_edges``:
    (target, disease, assoc).
    """
    return two_hop_paths(
        dti_edges.select(
            F.col("drug").alias("src"),
            F.col("target").alias("mid"),
            F.col("affinity").alias("s1"),
        ),
        gda_edges.select(
            F.col("target").alias("mid"),
            F.col("disease").alias("dst"),
            F.col("assoc").alias("s2"),
        ),
        score_ab="s1",
        score_bc="s2",
        k=k,
    ).select(
        F.col("src").alias("drug"),
        F.col("dst").alias("disease"),
        "n_paths",
        "best_score",
        "rnk",
    )
