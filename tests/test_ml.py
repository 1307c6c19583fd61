"""ML layer: threshold-style tests (never exact-match; SURVEY.md §5.2).

Seeded separable fixture → RF must clear an accuracy bound; model
persistence roundtrips through Spark's native format; max_probability
produces (Read, MaxProb, Prediction) with MaxProb in [0.5, 1].
"""

from __future__ import annotations

import tempfile

import pytest

from mitoscape_spark.pipeline import fixtures
from mitoscape_spark.pipeline.ml import (
    evaluate_accuracy,
    load_pipeline_model,
    max_probability,
    train_rf,
)


@pytest.fixture(scope="module")
def labeled(spark):
    return fixtures.to_spark(spark, fixtures.labeled_features_pdf(1200)).cache()


@pytest.fixture(scope="module")
def model(labeled):
    train, _ = labeled.randomSplit([0.8, 0.2], seed=7)
    return train_rf(train)


def test_rf_accuracy_threshold(labeled, model):
    _, test = labeled.randomSplit([0.8, 0.2], seed=7)
    acc = evaluate_accuracy(model, test)
    assert acc >= 0.9, f"accuracy {acc} below bound on separable fixture"


def test_max_probability_shape(labeled, model):
    preds = model.transform(labeled.limit(50))
    rows = max_probability(preds).collect()
    assert {r.Prediction for r in rows} <= {0.0, 1.0}
    assert all(0.5 <= r.MaxProb <= 1.0 for r in rows)


def test_model_persistence_roundtrip(labeled, model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model") / "rf")
    model.write().overwrite().save(path)
    reloaded = load_pipeline_model(path)
    a = model.transform(labeled.limit(20)).select("Read", "prediction").collect()
    b = reloaded.transform(labeled.limit(20)).select("Read", "prediction").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
