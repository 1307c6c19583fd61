"""Bloom runtime filter: no false negatives, sane FP rate, stats row."""

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_join_stats,
    bloom_might_contain,
    build_bloom,
)


def test_no_false_negatives(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)], "k long"
    )
    words = build_bloom(build, "k")
    got = (
        build.withColumn("p", bloom_might_contain("k", words))
        .where(~F.col("p"))
        .count()
    )
    assert got == 0  # every inserted key must pass


def test_fp_rate_within_theory(spark):
    build = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probe = spark.createDataFrame(
        [(i,) for i in range(10_000, 20_000)], "k long"
    )
    words = build_bloom(build, "k")
    fps = (
        probe.withColumn("p", bloom_might_contain("k", words))
        .where(F.col("p"))
        .count()
    )
    # n=100, k=3, m=4032 -> FP ~ (1-e^-0.0744)^3 ~ 3.7e-4; allow 10x
    assert fps <= 40


def test_stats_row_consistency(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame(
        [(i % 200,) for i in range(1000)], "k long"
    )
    r = bloom_join_stats(build, "k", probe, "k").collect()[0]
    assert r["n_probe"] == 1000
    assert r["n_true"] == 250  # keys 0..49, each 5 times
    assert r["n_pass"] == r["n_true"] + r["n_false_pos"]
    assert r["n_pass"] >= r["n_true"]  # no false negatives


def test_words_stay_positive(spark):
    # bit 63 never set -> every word non-negative in both engines
    build = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    words = build_bloom(build, "k")
    assert len(words) == 4032 // BITS_PER_WORD
    assert all(w >= 0 for w in words)


def test_rejects_bad_m_bits(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=4096)
