"""Model-based quality gate: holdout accuracy, teacher distillation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mitoscape_spark.pipeline.quality_model import (
    bootstrap_labels,
    score_quality,
    train_quality_model,
)


def _synthetic_corpus(spark, n=200):
    """Deterministic good (varied English-ish) vs bad (degenerate
    repetition) documents — linearly separable by token features."""
    good_words = (
        "the quick brown fox jumps over a lazy dog while many other "
        "animals watch from the quiet forest and rivers flow past"
    ).split()
    rows = []
    for i in range(n):
        if i % 2 == 0:
            toks = [good_words[(i * 7 + j) % len(good_words)] for j in range(30)]
            rows.append((i, " ".join(toks), 1.0))
        else:
            # junk vocabulary cycles WITHIN each doc so every junk
            # token is seen in any train/holdout split
            toks = [f"zz{(i + j) % 5}" for j in range(30)]
            rows.append((i, " ".join(toks), 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_quality_model_holdout_accuracy(spark):
    corpus = _synthetic_corpus(spark)
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    model = train_quality_model(train, seed=7)
    scored = score_quality(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    acc = scored.select(
        F.avg(
            ((F.col("prob_good") > 0.5).cast("double") == F.col("label"))
            .cast("double")
        )
    ).head()[0]
    assert acc >= 0.95


def test_quality_model_scores_are_probabilities(spark):
    corpus = _synthetic_corpus(spark, n=60)
    model = train_quality_model(corpus, seed=7)
    rows = score_quality(model, corpus).collect()
    assert len(rows) == 60
    assert all(0.0 <= r.prob_good <= 1.0 for r in rows)


def test_distillation_separates_teacher_classes(spark, sf_smoke):
    # student trained on Gopher-rule teacher labels must rank passing
    # docs above failing ones on average (it sees only token features)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    labeled = bootstrap_labels(docs)
    model = train_quality_model(labeled, seed=7)
    scored = score_quality(model, docs).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    means = {
        r.label: r.m
        for r in scored.groupBy("label")
        .agg(F.avg("prob_good").alias("m"))
        .collect()
    }
    assert means[1.0] > means[0.0] + 0.2


def test_quality_model_query_shape(spark, sf_smoke):
    from mitoscape_spark.queries.extensions import ext_quality_model

    out = ext_quality_model(spark, sf_smoke)
    rows = out.collect()
    assert list(out.columns) == ["decile", "n_docs"]
    assert sum(r.n_docs for r in rows) == 500
    assert all(0 <= r.decile <= 9 for r in rows)
