"""Naive-Bayes token classifier (operators/classifier.py): weight-sign
semantics, separability, determinism under repartitioning, and
generalization of a self-supervised label on the real corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crossbar_data_process_spark.operators.classifier import (
    nb_classify,
    nb_train_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_weight_signs_follow_class_evidence(spark):
    """A token seen only in positive docs gets w > 0; only in negative docs
    w < 0; evenly split tokens sit near 0 (|w| < one-sided weights)."""
    d = _docs(
        spark,
        [
            (1, "good good shared", True),
            (2, "good shared", True),
            (3, "bad shared", False),
            (4, "bad bad shared", False),
        ],
    )
    w = {r.token: r.w for r in nb_train_weights(d, F.col("y")).collect()}
    assert w["good"] > 0 and w["bad"] < 0
    assert abs(w["shared"]) < min(w["good"], -w["bad"])
    # symmetric corpus -> antisymmetric weights
    assert math.isclose(w["good"], -w["bad"], abs_tol=1e-6)


def test_classify_separable_corpus_perfectly(spark):
    d = _docs(
        spark,
        [
            (1, "alpha beta gamma", True),
            (2, "alpha alpha beta", True),
            (3, "delta epsilon zeta", False),
            (4, "epsilon zeta zeta", False),
            (5, "beta gamma alpha", True),
        ],
    )
    got = {r.doc_id: r.nb_pred for r in nb_classify(d, F.col("y")).collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}


def test_scores_partition_invariant(spark):
    rows = [
        (i, f"tok{i % 7} tok{i % 3} tok{i % 5} common", i % 2 == 0)
        for i in range(40)
    ]
    d1 = _docs(spark, rows).repartition(1)
    d2 = _docs(spark, rows).repartition(13)
    s1 = sorted((r.doc_id, r.nb_score) for r in nb_classify(d1, F.col("y")).collect())
    s2 = sorted((r.doc_id, r.nb_score) for r in nb_classify(d2, F.col("y")).collect())
    assert s1 == s2  # DECIMAL accumulation: bit-identical, no tolerance


def test_self_supervised_quality_label_learned(spark):
    """Trained against the heuristic quality gate (quality_score >= 0.82, a
    balanced ~52/48 split on this corpus — the declared q60 surface), the
    classifier must recover the label far above the majority baseline on its
    training docs. (The labeled `lang` column is NOT learnable here: the
    synthetic corpus draws all docs from one shared 31-token vocabulary, so
    lang is independent of text — quality, being text-derived, is.)"""
    from crossbar_data_process_spark.functions.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lab = quality_score("text") >= 0.82
    scored = nb_classify(docs, label=lab)
    joined = scored.join(docs.select("doc_id", lab.alias("y")), "doc_id")
    acc = joined.select(
        F.avg((F.col("nb_pred") == F.col("y")).cast("double")).alias("acc")
    ).collect()[0].acc
    base = docs.select(F.avg(lab.cast("double"))).collect()[0][0]
    assert max(base, 1 - base) < 0.6  # the label is balanced, not majority-trivial
    assert acc >= 0.8, (acc, base)
