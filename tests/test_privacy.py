"""dp_sum: contribution bounding, determinism, noise-scale sanity."""

import math
import statistics

import pytest

from mitoscape_spark.operators.privacy import dp_sum


def _release(spark, rows, clamp=10.0, eps=1.0):
    df = spark.createDataFrame(rows, "g string, who long, v double")
    return {
        r["g"]: (r["n_contributors"], r["noisy_sum"])
        for r in dp_sum(df, "g", "v", "who", clamp, eps).collect()
    }


def test_contribution_is_bounded(spark):
    # contributor 1 owns 1000 rows of value 10 in group a; the clamp
    # keeps their influence at 10, so a's release sits near b's
    rows = [("a", 1, 10.0)] * 1000 + [("b", 2, 10.0)]
    got = _release(spark, rows)
    assert got["a"][0] == 1 and got["b"][0] == 1
    # both true totals are exactly clamp=10; noise scale b=10
    assert abs(got["a"][1] - 10.0) < 200.0
    assert abs(got["b"][1] - 10.0) < 200.0


def test_values_clamped_and_negatives_zeroed(spark):
    rows = [("a", 1, 1e9), ("a", 2, -50.0)]
    got = _release(spark, rows, clamp=10.0, eps=1e9)  # ~zero noise
    # contributor 1 clamps to 10, contributor 2's negative clamps to 0
    assert got["a"][0] == 2
    assert got["a"][1] == pytest.approx(10.0, abs=0.01)


def test_deterministic_across_runs(spark):
    rows = [(f"g{i}", j, float(i + j)) for i in range(10) for j in range(5)]
    a = _release(spark, rows)
    b = _release(spark, rows)
    assert a == b


def test_noise_scale_matches_laplace(spark):
    # 400 groups with true total 0 (single zero-value contributor):
    # released values ARE the Laplace draws; median |x| = b ln 2
    rows = [(f"g{i:04d}", i, 0.0) for i in range(400)]
    got = _release(spark, rows, clamp=10.0, eps=1.0)  # b = 10
    draws = [abs(v) for _, v in got.values()]
    med = statistics.median(draws)
    assert med == pytest.approx(10.0 * math.log(2), rel=0.35)
    signs = sum(1 for _, v in got.values() if v > 0)
    assert 120 < signs < 280  # roughly symmetric


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "g string, who long, v double")
    with pytest.raises(ValueError):
        dp_sum(df, "g", "v", "who", clamp=0.0, epsilon=1.0)
    with pytest.raises(ValueError):
        dp_sum(df, "g", "v", "who", clamp=1.0, epsilon=-1.0)
