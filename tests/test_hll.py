"""Portable HLL: accuracy within theory, merge, rank edge cases."""

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _est(spark, keys, p=8):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    return hll_estimate(hll_registers(df, "k", p=p), p=p).collect()[0][
        "hll_est"
    ]


def test_accuracy_within_theory(spark):
    # p=8 -> sigma ~ 6.5%; allow 3.5 sigma
    n = 20_000
    est = _est(spark, range(n))
    assert abs(est - n) / n < 0.23


def test_duplicates_do_not_inflate(spark):
    once = _est(spark, range(2000))
    tripled = _est(spark, list(range(2000)) * 3)
    assert once == tripled  # registers are max — idempotent


def test_small_range_linear_counting(spark):
    # 30 distinct << 2.5m: the linear-counting branch is near-exact
    est = _est(spark, range(30))
    assert abs(est - 30) <= 3


def test_merge_equals_build_on_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 5000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(3000, 9000)], "k long")
    merged = hll_merge(
        hll_registers(a, "k"), hll_registers(b, "k")
    )
    direct = hll_registers(a.unionByName(b), "k")
    m = {(r["register"], r["max_rank"]) for r in merged.collect()}
    d = {(r["register"], r["max_rank"]) for r in direct.collect()}
    assert m == d


def test_rank_edge_all_zero_suffix(spark):
    # the rank CASE: stripped=='' path must yield 53, not NULL/0;
    # exercised indirectly — registers are always in [1, 53]
    df = spark.createDataFrame([(i,) for i in range(50_000)], "k long")
    regs = hll_registers(df, "k").collect()
    assert all(1 <= r["max_rank"] <= 53 for r in regs)
    assert all(0 <= r["register"] <= 255 for r in regs)


def test_rejects_bad_p(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=7)


def test_grouped_accuracy_within_theory(spark):
    from mitoscape_spark.operators.hll import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    rows = [("a", i) for i in range(5000)] + [
        ("b", i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    est = {
        r["grp"]: r["hll_est"]
        for r in hll_estimate_grouped(
            hll_registers_grouped(df, "g", "k")
        ).collect()
    }
    assert abs(est["a"] - 5000) / 5000 < 0.23
    assert abs(est["b"] - 200) / 200 < 0.25  # linear-counting regime
