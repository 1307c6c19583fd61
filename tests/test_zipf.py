"""zipf_fit vs a local numpy least-squares on known frequencies."""

import math

import numpy as np
import pytest

from mitoscape_spark.operators.textstats import zipf_fit


def test_zipf_fit_matches_numpy(spark):
    # freq(tok_i) = i occurrences: tok1 x1, tok2 x2, ... tok12 x12
    words = []
    for i in range(1, 13):
        words += [f"tok{i:02d}"] * i
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_fit(df).collect()[0]
    freqs = sorted(range(1, 13), reverse=True)
    x = np.log(np.arange(1, 13, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_tokens"] == 12
    assert row["slope"] == pytest.approx(slope, abs=1e-3)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-3)


def test_zipf_exact_power_law_recovers_exponent(spark):
    # freq(rank r) = round(1000 * r^-1) -> slope ~ -1
    words = []
    for r in range(1, 30):
        words += [f"w{r:03d}"] * max(1, round(1000 / r))
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_fit(df).collect()[0]
    assert row["slope"] == pytest.approx(-1.0, abs=0.05)
