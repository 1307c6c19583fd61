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


def test_reference_model_artifact_loads_and_scores(spark, tmp_path):
    """API-parity proof: the reference's persisted Spark 3.0.0 RF
    artifact (src/universal/MTClassifierModel.RF.tar — SURVEY.md §1.1
    item 4) loads unchanged through pyspark.ml and scores with the
    documented shape (128 trees, 6 features, 2 classes)."""
    import os
    import tarfile

    tar_path = "/root/reference/src/universal/MTClassifierModel.RF.tar"
    if not os.path.exists(tar_path):
        import pytest

        pytest.skip("reference artifact not present")
    with tarfile.open(tar_path) as tf:
        tf.extractall(tmp_path)
    from pyspark.ml.classification import RandomForestClassificationModel
    from pyspark.ml.linalg import Vectors

    m = RandomForestClassificationModel.load(
        str(tmp_path / "MTClassifierModel.RF")
    )
    assert m.getNumTrees == 128
    assert m.numFeatures == 6
    assert m.numClasses == 2
    df = spark.createDataFrame(
        [(Vectors.dense([1.0, 40000.0, 3.0, 30.0, 2.0, 3.0]),)],
        ["features"],
    )
    out = m.transform(df).select("prediction", "probability").head()
    assert out.prediction in (0.0, 1.0)
    assert abs(sum(out.probability) - 1.0) < 1e-9


def test_gbt_accuracy_threshold(spark):
    """GBT twin (reference testGBModel, MTClassifierModel.scala:225-257
    — whose 'precision' metric name would throw; we evaluate accuracy,
    SURVEY.md §8 Q7) clears the same separability bound as the RF."""
    from mitoscape_spark.pipeline import fixtures
    from mitoscape_spark.pipeline.ml import evaluate_accuracy, train_gbt

    labeled = fixtures.to_spark_canonical(
        spark, fixtures.labeled_features_pdf(800), "Read"
    )
    train, test = labeled.randomSplit([0.7, 0.3], seed=42)
    model = train_gbt(train, seed=42)
    assert evaluate_accuracy(model, test) >= 0.85


def test_tune_rf_cross_validation(labeled):
    """CV over a small grid: best model must clear the same accuracy
    bound, and every grid point must report a finite fold-averaged
    score."""
    from mitoscape_spark.pipeline.ml import evaluate_accuracy, tune_rf

    best, scores = tune_rf(
        labeled,
        num_trees_grid=[8, 16],
        max_depth_grid=[3, 5],
        n_folds=2,
        parallelism=2,
    )
    assert len(scores) == 4
    assert all(0.0 <= s <= 1.0 for _, s in scores)
    acc = evaluate_accuracy(best, labeled)
    assert acc >= 0.9
