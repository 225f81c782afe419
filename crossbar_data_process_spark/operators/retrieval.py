"""BM25 full-text retrieval scoring — the ranking half of a RAG/search
corpus pipeline, as pure DataFrame aggregations: build the term
statistics (tf, df, doc length, corpus averages) in one pass over the
corpus, score any query set against them, return top-k per query.

Scale shape (100 TB):
- the inverted statistics are two groupBys over the (doc, term)
  occurrence table (term-frequency, then document-frequency over the tf
  table — which is already |distinct terms per doc| sized, far smaller
  than the token stream);
- corpus scalars (N, avgdl) ride a 1-row broadcast;
- scoring joins the QUERY term list (small side) against the tf table on
  the term — candidate rows are only (query term, matching doc) pairs,
  the classic inverted-index access path, never corpus × queries;
- per-term contributions round at 1e-6 and accumulate in DECIMAL (the
  engine determinism contract), so rankings are bit-stable across
  partitionings and engines and the whole pipeline has a DuckDB oracle.

Versus the reference: no counterpart (no retrieval anywhere) — engine
charter, SURVEY.md §7 "beyond the reference" track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.text import tokens
from crossbar_data_process_spark.operators.lm import _fround
from crossbar_data_process_spark.operators.materialize import materialize
from crossbar_data_process_spark.operators.textdedup import _spread
from crossbar_data_process_spark.operators.topk import top_k_per_group


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    scale: int = 6,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rnk) — the ``top_k`` best BM25 matches per
    query, ties broken by ascending doc id. Uses the standard
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive) and the
    Robertson tf saturation with length normalization
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Documents with zero tokens never match; query terms absent from the
    corpus contribute nothing (inner join on the term).

    Scale lever: candidate volume is Σ over query terms of df(term) — a
    query term near df = N touches the whole corpus for a near-zero idf
    contribution. ``max_df_ratio`` opts into the standard stop-term cut
    (the static half of what WAND-style engines do dynamically): terms
    with ``df > max_df_ratio·N`` are excluded from scoring entirely, so
    candidates are bounded by ``max_df_ratio·N`` per query term. Scores
    drop by at most the skipped terms' tiny idf contributions; documents
    matched ONLY through stop terms disappear. Default off (exact)."""
    dtok = (
        _spread(docs)
        .select(F.col(id_col).alias("doc"), F.lower(F.col(text_col)).alias("__lt"))
        .select("doc", F.explode(tokens("__lt")).alias("term"))
    )
    tf = materialize(
        dtok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc").agg(F.sum("tf").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(stats))
    if max_df_ratio is not None:
        idf = idf.filter(F.col("df") <= max_df_ratio * F.col("n_docs"))
    idf = idf.select(
        "term",
        _fround(
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            scale,
        ).alias("idf"),
        "avgdl",
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.lower(F.col(query_text_col)).alias("__qt"),
        )
        .select("qid", F.explode(F.array_distinct(tokens("__qt"))).alias("term"))
    )
    # join idf BEFORE tf: the (tiny) query-term × vocab join decides which
    # terms expand at all, so the stop-term cut bounds the tf fan-out —
    # filtering after the expansion would pay the candidate cost anyway
    contrib = (
        qterms.join(idf, "term")
        .join(tf, "term")
        .join(dl, "doc")
        .select(
            "qid",
            "doc",
            _fround(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                scale,
            ).alias("__c"),
        )
    )
    dec = f"decimal(28,{scale})"
    scored = contrib.groupBy("qid", "doc").agg(
        F.sum(F.col("__c").cast(dec)).cast("double").alias("score")
    )
    return top_k_per_group(
        scored.select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            "score",
        ),
        [query_id_col],
        [F.desc("score"), F.asc(id_col)],
        top_k,
        rank_col="rnk",
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    combine heterogeneous retrievers (BM25 lexical + dense cosine, or any
    mix) without score calibration: each system contributes
    1/(k + rank) per (query, doc), summed across systems; scores from
    different systems never meet, only RANKS do, so a system with wild
    score scales cannot dominate.

    Determinism contract: each contribution is materialized as integer
    MICROS (floor(1e6/(k+rank) + 0.5)) and summed as longs — the sum is
    exact and order/partitioning-independent (a double sum of reciprocals
    is not), then divided back down; ties break on the doc id. This keeps
    the operator oracle-able in any engine with 64-bit integers.

    Scale shape: input rankings are top-k-per-query tables — Q×k rows,
    MINUSCULE next to the corpora they were ranked from; the union +
    groupBy shuffles only these. The expensive work already happened
    inside the per-system retrievers (``bm25_topk``'s inverted-index path,
    ``ivf_topk_assigned``'s pruned probe); fusion adds one small shuffle.

    Returns (query_col, doc_col, rrf_score, n_systems, rnk) — top_k rows
    per query, rrf_score descending.

    PRECONDITION: each input ranking has at most one row per
    (query, doc) — the ``bm25_topk``/``ivf_topk_assigned`` contract. A
    system emitting duplicates would double-count its contribution
    (n_systems counts ROWS, so such inputs are visible in the output).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            (
                F.floor(
                    F.lit(1_000_000.0) / (F.lit(k) + F.col(rank_col))
                    + F.lit(0.5)
                )
            ).cast("long").alias("__micros"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(query_col, doc_col).agg(
        (F.sum("__micros") / F.lit(1_000_000.0)).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    return top_k_per_group(
        scored,
        [query_col],
        [F.desc("rrf_score"), F.asc(doc_col)],
        top_k,
        rank_col="rnk",
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    — the diversity stage after retrieval/fusion: greedily pick the
    candidate maximizing ``lam·relevance − (1−lam)·max_cosine_to_already_
    picked``, so near-duplicate hits don't crowd the context window.
    ``lam=1`` reduces to pure relevance order.

    Greedy selection is inherently sequential PER QUERY, so this is the
    sanctioned Arrow path (``applyInPandas`` — same contract as the BPE
    apply): one vectorized numpy kernel per query group. That is the
    RIGHT shape at scale because the input is a top-N candidate table
    from a retriever (N ≤ a few hundred), never a corpus: Q×N rows
    shuffle once on the query id and each group's O(k·N·d) greedy loop
    touches only its own candidates. Determinism: ties break on the doc
    id; scores are relevance-scaled cosines, reproducible bit-for-bit
    for a fixed candidate set (numpy double ops, no RNG).

    Returns (query_col, doc_col, mmr_score, rnk) with rnk 1..k in
    selection order.
    """
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    fields = {f.name: f.dataType.simpleString() for f in candidates.schema}
    out_schema = (
        f"{query_col} {fields[query_col]}, {doc_col} {fields[doc_col]}, "
        "mmr_score double, rnk long"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order regardless of arrival order
        pdf = pdf.sort_values(doc_col, kind="mergesort").reset_index(drop=True)
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: sim 0 to everything
        units = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = None  # undefined until something is picked: the first
        avail = np.ones(n, dtype=bool)  # pick is pure relevance, and a
        for _ in range(min(k, n)):  # NEGATIVE max-cosine genuinely boosts
            if max_sim is None:  # (anti-similar docs add diversity) —
                mmr = lam * rel  # never clamped at zero (r10 review)
            else:
                mmr = lam * rel - (1.0 - lam) * max_sim
            mmr[~avail] = -np.inf
            best = int(np.argmax(mmr))  # argmax takes the FIRST max:
            picked.append(best)  # ties -> lowest doc id (sorted order)
            scores.append(float(mmr[best]))
            avail[best] = False
            sims = units @ units[best]
            if max_sim is None:
                max_sim = sims.copy()
            else:
                np.maximum(max_sim, sims, out=max_sim)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                doc_col: pdf[doc_col].iloc[picked].to_numpy(),
                "mmr_score": scores,
                "rnk": np.arange(1, len(picked) + 1, dtype=np.int64),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_mmr, out_schema)
