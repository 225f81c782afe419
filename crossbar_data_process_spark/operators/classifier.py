"""Distributed multinomial naive-Bayes token classifier — the
"quality/domain classifier" stage of LLM training-data curation (the role
fastText linear classifiers play in CCNet/DataComp-style pipelines), built
entirely from DataFrame aggregations so training AND scoring are single
Spark jobs with no model server, no Python UDFs, and no driver-resident
state beyond two 1-row aggregates.

Train: per-token occurrence counts under a boolean label (e.g. "is
reference-quality text", "is English") → Laplace-smoothed log-odds weight
per token. Score: sum of token weights + class prior, thresholded at 0.

Scale shape (100 TB):
- training is ONE groupBy on the token string (partial aggregation makes
  hot stopwords cheap map-side); vocabulary tables are orders of magnitude
  smaller than the corpus;
- corpus totals (token mass per class, vocab size, doc counts per class)
  are two 1-row aggregates attached by broadcast — never data-sized
  driver state;
- scoring re-joins the token table with the weight table on the token
  (AQE picks broadcast when the vocab fits, shuffle equi-join otherwise)
  and reduces per doc — one shuffle on the doc id;
- weights are rounded to ``scale`` decimals and accumulated in DECIMAL so
  scores are bit-identical across partitionings and engines (the engine's
  _dsum convention; see plans/queries.py).

Versus the reference: no counterpart — the reference has no trained
component anywhere (pure rule pipelines); this is engine charter
(SURVEY.md §7 "beyond the reference" track).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crossbar_data_process_spark.functions.text import tokens
from crossbar_data_process_spark.operators.lm import _fround
from crossbar_data_process_spark.operators.materialize import materialize
from crossbar_data_process_spark.operators.textdedup import _spread


def nb_train_weights(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    scale: int = 6,
) -> DataFrame:
    """Fit the classifier: (token, w) where
    ``w = round(ln((c_pos+α)·(B+αV) / ((c_neg+α)·(G+αV))), scale)`` —
    the Laplace-smoothed multinomial log-likelihood ratio. ``G``/``B`` are
    the total token mass of the positive/negative class, ``V`` the vocab
    size; rounding makes the weight table an engine-portable artifact.

    The returned frame is small (one row per distinct token) — persist it
    as a silver table and reuse across corpora: scoring never retrains.
    """
    tok = _token_table(_spread(docs), label, text_col, id_col)
    return nb_train_weights_from_tokens(tok, alpha=alpha, scale=scale)


def nb_classify(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    scale: int = 6,
) -> DataFrame:
    """Train on ``label`` and score every document in one plan. Returns
    (id, n_scored_tokens, nb_score, nb_pred) — score is the posterior
    log-odds (token log-likelihood ratios + class prior); ``nb_pred`` is
    the MAP decision ``score > 0``. Documents with zero tokens are absent
    (nothing to score), matching the segment_dedup convention.

    Self-supervised use: pass a heuristic label (a quality_score threshold,
    a language flag, a trusted-source marker) and the classifier distills
    it into token weights that generalize beyond the heuristic's reach —
    exactly the fastText-pipeline pattern, minus the external trainer.
    """
    # regexp-heavy labels over a few-file scan serialize onto one core
    # without the under-partitioning guard (see textdedup._spread).
    # The (id, y, lowered-text) projection is checkpointed so the corpus is
    # READ AND LABELED ONCE: the token stream, the class prior, and (via
    # the token stream) the weight fit all consume the same materialized
    # pass — at 100 TB that's one corpus scan, not two.
    pre = materialize(
        _spread(docs).select(
            id_col, label.alias("y"), F.lower(F.col(text_col)).alias("__lt")
        )
    )
    tok = materialize(
        pre.select(id_col, "y", F.explode(tokens("__lt")).alias("token"))
    )
    weights = nb_train_weights_from_tokens(tok, alpha=alpha, scale=scale)
    prior = pre.select("y").agg(
        _fround(
            F.log(
                (F.sum(F.col("y").cast("long")) + F.lit(alpha))
                / (F.sum((~F.col("y")).cast("long")) + F.lit(alpha))
            ),
            scale,
        ).alias("prior")
    )
    dec = f"decimal(28,{scale})"
    return (
        tok.join(weights, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_tokens"),
            F.sum(F.col("w").cast(dec)).alias("__wsum"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_scored_tokens",
            (F.col("__wsum").cast("double") + F.col("prior")).alias("nb_score"),
            (F.col("__wsum").cast("double") + F.col("prior") > 0).alias("nb_pred"),
        )
    )


def nb_train_weights_from_tokens(
    tok: DataFrame, alpha: float = 1.0, scale: int = 6
) -> DataFrame:
    """Weight table from an existing (id, y, token) table — the shared
    inner step of nb_train_weights/nb_classify so the exploded token frame
    is built (and shuffled) once per plan."""
    stats = tok.groupBy("token").agg(
        F.sum(F.col("y").cast("long")).alias("c_pos"),
        F.sum((~F.col("y")).cast("long")).alias("c_neg"),
    )
    totals = stats.agg(
        F.sum("c_pos").cast("double").alias("g_mass"),
        F.sum("c_neg").cast("double").alias("b_mass"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    return stats.crossJoin(F.broadcast(totals)).select(
        "token",
        _fround(
            F.log(
                ((F.col("c_pos") + F.lit(alpha)) * (F.col("b_mass") + alpha * F.col("vocab")))
                / ((F.col("c_neg") + F.lit(alpha)) * (F.col("g_mass") + alpha * F.col("vocab")))
            ),
            scale,
        ).alias("w"),
    )


def _token_table(
    docs: DataFrame, label: Column, text_col: str, id_col: str
) -> DataFrame:
    """(id, y, token) — lowercased whitespace tokens, one row per token
    OCCURRENCE (multinomial counts, not presence).

    The label is bound in its OWN projection below the explode. Putting it
    in the same select as the generator is a 10-50x trap: Spark splits that
    into Generate + a Project ABOVE it carrying every non-generator
    expression, so a regexp-heavy label (quality_score runs ~7 regexps over
    the full text) re-evaluates once per TOKEN instead of once per
    document. CollapseProject never merges across Generate, so the two-step
    shape pins the label (and the lowercasing) to the per-document side —
    measured 17x on the sf0.1 corpus."""
    pre = docs.select(
        id_col,
        label.alias("y"),
        F.lower(F.col(text_col)).alias("__lt"),
    )
    return pre.select(id_col, "y", F.explode(tokens("__lt")).alias("token"))


def nb_export_model(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    scale: int = 6,
) -> tuple[dict[str, float], float]:
    """Train and EXPORT the classifier as a plain (weights, prior) artifact
    — the deployment form. A trained token model is bounded by its
    vocabulary (fastText ships whole models in megabytes), so collecting it
    is a model-artifact collect, not data-sized driver state; pair with
    ``nb_score_expr`` to score new corpora or streams without retraining.
    """
    w = {r["token"]: float(r["w"]) for r in nb_train_weights(
        docs, label, text_col=text_col, id_col=id_col, alpha=alpha, scale=scale
    ).collect()}
    [p] = docs.select(label.alias("y")).agg(
        _fround(
            F.log(
                (F.sum(F.col("y").cast("long")) + F.lit(alpha))
                / (F.sum((~F.col("y")).cast("long")) + F.lit(alpha))
            ),
            scale,
        ).alias("prior")
    ).collect()
    return w, float(p["prior"])


def nb_score_expr(
    weights: dict[str, float], prior: float, text_col: str | Column = "text"
) -> Column:
    """Scan-side scoring expression for an exported model: posterior
    log-odds of a document under (weights, prior), as ONE Column — no
    explode, no join, no shuffle, and therefore directly usable in a
    streaming `select` (stateless: stream rows score as they arrive).
    Tokens outside the trained vocabulary contribute 0, matching
    ``nb_classify``'s inner-join semantics. The fold accumulates the
    1e-6-rounded weights in order-independent integer micros, so batch and
    streaming scores are bit-identical to the join-based plan.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lookup = F.map_from_arrays(
        F.array(*[F.lit(t) for t in sorted(weights)]),
        # weights are multiples of 1e-6 by the training contract; integer
        # micros make the fold exact regardless of summation order
        F.array(*[F.lit(int(round(weights[t] * 1_000_000))) for t in sorted(weights)]),
    )
    micros = F.aggregate(
        tokens(F.lower(c)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(lookup[t], F.lit(0).cast("long")),
    )
    return (micros.cast("double") / 1_000_000.0 + F.lit(prior)).alias("nb_score")
