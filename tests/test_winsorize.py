"""winsorized_stats vs numpy on known data."""

import numpy as np
import pytest

from mitoscape_spark.operators.profile import winsorized_stats


def test_winsorized_matches_numpy(spark):
    vals = list(range(1, 101)) + [10_000]  # one huge outlier
    rows = [("a", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    r = winsorized_stats(df, "g", "v", 0.05, 0.95).collect()[0]
    arr = np.array(vals, dtype=float)
    lo = round(float(np.percentile(arr, 5)), 4)
    hi = round(float(np.percentile(arr, 95)), 4)
    w = np.clip(arr, lo, hi)
    assert r["n"] == 101
    assert r["p_lo"] == pytest.approx(lo, abs=1e-9)
    assert r["p_hi"] == pytest.approx(hi, abs=1e-9)
    assert r["mean_raw"] == pytest.approx(round(arr.mean(), 4), abs=1e-6)
    assert r["mean_winsorized"] == pytest.approx(
        round(w.mean(), 4), abs=1e-6
    )
    # the outlier no longer dominates
    assert r["mean_winsorized"] < r["mean_raw"] / 1.5


def test_groups_independent(spark):
    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(i * 1000)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["p_hi"]
        for r in winsorized_stats(df, "g", "v").collect()
    }
    assert got["b"] == pytest.approx(got["a"] * 1000, rel=1e-9)


def test_rejects_bad_band(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorized_stats(df, "g", "v", 0.9, 0.1)
