"""Count-Min: never under-counts, merge = build-on-union, error bound."""

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.countmin import (
    countmin_build,
    countmin_estimate,
    countmin_merge,
)


def _freqs(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "k long")


def test_never_undercounts_and_bounded_overcount(spark):
    rows = [i % 50 for i in range(5000)]  # each key 100x, N=5000
    df = _freqs(spark, rows)
    sk = countmin_build(df, "k", width=256, depth=4)
    probes = _freqs(spark, list(range(50)))
    est = {
        r["k"]: r["cms_est"]
        for r in countmin_estimate(sk, probes, "k", 256, 4).collect()
    }
    for k in range(50):
        assert est[k] >= 100  # CMS never under-counts
        # e*N/width = 2.718*5000/256 ~ 53; generous factor-2 headroom
        assert est[k] <= 100 + 110


def test_absent_key_estimates_small(spark):
    df = _freqs(spark, list(range(100)))
    sk = countmin_build(df, "k", width=1024, depth=4)
    probes = _freqs(spark, [10_000, 20_000])
    est = countmin_estimate(sk, probes, "k", 1024, 4).collect()
    for r in est:
        assert 0 <= r["cms_est"] <= 3  # collisions only


def test_merge_equals_build_on_union(spark):
    a = _freqs(spark, [i % 10 for i in range(500)])
    b = _freqs(spark, [i % 7 for i in range(300)])
    merged = countmin_merge(
        countmin_build(a, "k", 128, 3), countmin_build(b, "k", 128, 3)
    )
    direct = countmin_build(a.unionByName(b), "k", 128, 3)
    m = {(r["d"], r["pos"]): r["c"] for r in merged.collect()}
    d = {(r["d"], r["pos"]): r["c"] for r in direct.collect()}
    assert m == d


def test_rejects_bad_shape(spark):
    df = _freqs(spark, [1])
    with pytest.raises(ValueError):
        countmin_build(df, "k", width=1, depth=4)
    with pytest.raises(ValueError):
        countmin_build(df, "k", width=16, depth=0)


def test_inner_product_upper_bounds_true_join_size(spark):
    from mitoscape_spark.operators.countmin import countmin_inner_product

    # f(v) = 10 for 50 keys: true self-join size = 50 * 100 = 5000
    df = _freqs(spark, [i % 50 for i in range(500)])
    sk = countmin_build(df, "k", width=512, depth=4)
    sk = sk.localCheckpoint(eager=False)
    est = countmin_inner_product(sk, sk).collect()[0]["cms_join_size"]
    assert est >= 5000  # never under-estimates
    assert est <= 5000 * 2  # collisions bounded at this width


def test_inner_product_disjoint_keys_is_small(spark):
    from mitoscape_spark.operators.countmin import countmin_inner_product

    a = countmin_build(_freqs(spark, range(100)), "k", 1024, 4)
    b = countmin_build(
        _freqs(spark, range(10_000, 10_100)), "k", 1024, 4
    )
    est = countmin_inner_product(a, b).collect()[0]["cms_join_size"]
    assert est <= 30  # only hash collisions contribute
