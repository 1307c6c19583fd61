"""Feature-prep operators: imputation, LOO target encoding, binning."""

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.features import (
    discretize_equal_frequency,
    impute_numeric,
    target_encode_loo,
)


def test_impute_mean_and_flags(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0)], "id long, x double"
    )
    out = {r["id"]: (r["x"], r["x__was_null"])
           for r in impute_numeric(df, ["x"], "mean").collect()}
    assert out[2] == (15.0, 1)
    assert out[1] == (10.0, 0) and out[3] == (20.0, 0)


def test_impute_median_robust_to_outlier(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 1000])]
        + [(9, None)],
        "id long, x double",
    )
    out = {r["id"]: r["x"]
           for r in impute_numeric(df, ["x"], "median").collect()}
    assert out[9] == 2.5  # median, not the outlier-dragged mean


def test_impute_rejects_bad_strategy(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        impute_numeric(df, ["x"], "mode")


def test_target_encode_loo_excludes_own_label(spark):
    # category 'a': targets 0 and 1. With m=0 the LOO encode of each
    # row is exactly the OTHER row's target.
    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 1.0)], "id long, c string, y double"
    )
    out = {r["id"]: r["c__te"]
           for r in target_encode_loo(df, "c", "y", smoothing=0.0).collect()}
    assert out[1] == 1.0 and out[2] == 0.0


def test_target_encode_singleton_gets_prior(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 1.0), (3, "b", 100.0)],
        "id long, c string, y double",
    )
    out = {r["id"]: r["c__te"]
           for r in target_encode_loo(df, "c", "y", smoothing=5.0).collect()}
    gm = (0.0 + 1.0 + 100.0) / 3
    # singleton 'b': (100-100+5*gm)/(1-1+5) == gm exactly
    assert out[3] == pytest.approx(gm, abs=1e-6)


def test_discretize_equal_occupancy(spark):
    df = spark.createDataFrame(
        [(i, float(i * i)) for i in range(100)], "id long, v double"
    )
    out = discretize_equal_frequency(df, "v", "id", n_bins=5)
    sizes = {r["bin"]: r["n"] for r in
             out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {b: 20 for b in range(1, 6)}
