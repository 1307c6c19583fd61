"""running_prefix / skyline_2d / ks_statistic vs brute-force locals."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.drift import ks_statistic
from mitoscape_spark.operators.orderstats import running_prefix
from mitoscape_spark.operators.skyline import skyline_2d


def _prefix_local(rows, strict, kind):
    # rows: sorted [(k, v)]; returns {k: prefix}
    out, acc = {}, []
    for k, v in rows:
        vals = acc if strict else acc + [v]
        vals = [x for x in vals if x is not None]
        if not vals:
            out[k] = None
        elif kind == "sum":
            out[k] = sum(vals)
        else:
            out[k] = min(vals)
        acc.append(v)
    return out


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("kind", ["sum", "min"])
@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_running_prefix_matches_local(spark, strict, kind, n_buckets):
    rng = random.Random(7)
    rows = [(float(k), float(rng.randint(-50, 50))) for k in range(200)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k double, v double").repartition(8)
    got = {
        r["k"]: r["p"]
        for r in running_prefix(
            df, "k", {"p": ("v", kind)}, n_buckets=n_buckets,
            strict=strict,
        ).collect()
    }
    want = _prefix_local(sorted(rows), strict, kind)
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_running_prefix_two_columns_at_once(spark):
    rows = [(1.0, 5.0, 2.0), (2.0, 1.0, 9.0), (3.0, 4.0, 1.0)]
    df = spark.createDataFrame(rows, "k double, a double, b double")
    got = {
        r["k"]: (r["sa"], r["mb"])
        for r in running_prefix(
            df, "k", {"sa": ("a", "sum"), "mb": ("b", "min")}
        ).collect()
    }
    assert got == {1.0: (5.0, 2.0), 2.0: (6.0, 2.0), 3.0: (10.0, 1.0)}


def test_running_prefix_rejects_bad_kind(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "k double, v double")
    with pytest.raises(ValueError):
        running_prefix(df, "k", {"p": ("v", "avg")})


def _skyline_local(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_skyline_2d_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    pts = [
        (rng.randint(0, 30) * 1.0, rng.randint(0, 30)) for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "x double, y int").repartition(8)
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _skyline_local(pts)


def test_skyline_keeps_duplicate_frontier_points(spark):
    pts = [(1.0, 5), (1.0, 5), (2.0, 3), (3.0, 3), (0.5, 9)]
    df = spark.createDataFrame(pts, "x double, y int")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    # (3.0, 3) is dominated by (2.0, 3); both (1.0, 5) copies survive
    assert got == [(0.5, 9), (1.0, 5), (1.0, 5), (2.0, 3)]


def test_skyline_ignores_null_coordinates(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (None, 0), (0.5, None)], "x double, y int"
    )
    got = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()]
    assert got == [(1.0, 1)]


def _ks_local(a, b):
    values = sorted(set(a) | set(b))
    best = 0.0
    for v in values:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


@pytest.mark.parametrize("shift", [0.0, 2.5])
def test_ks_statistic_matches_bruteforce(spark, shift):
    rng = random.Random(11)
    a = [round(rng.gauss(0, 1), 2) for _ in range(400)]
    b = [round(rng.gauss(shift, 1), 2) for _ in range(300)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "side string, v double").repartition(8)
    row = ks_statistic(df, "v", "side", "a", "b").collect()[0]
    assert row["n_a"] == 400 and row["n_b"] == 300
    assert row["ks_d"] == pytest.approx(_ks_local(a, b), abs=1e-6)
    if shift:
        assert row["ks_d"] > 0.5  # a 2.5σ shift is unmistakable


def test_ks_identical_samples_is_zero(spark):
    rows = [("a", float(i % 10)) for i in range(100)] + [
        ("b", float(i % 10)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "side string, v double")
    assert ks_statistic(df, "v", "side", "a", "b").collect()[0][
        "ks_d"
    ] == pytest.approx(0.0, abs=1e-12)


def _w1_local(a, b):
    values = sorted(set(a) | set(b))
    total = 0.0
    for v, nv in zip(values, values[1:]):
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        total += abs(fa - fb) * (nv - v)
    return total


def test_wasserstein_matches_bruteforce(spark):
    from mitoscape_spark.operators.drift import wasserstein_distance

    rng = random.Random(23)
    a = [round(rng.uniform(0, 10), 2) for _ in range(300)]
    b = [round(rng.uniform(2, 12), 2) for _ in range(200)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "side string, v double").repartition(8)
    got = wasserstein_distance(df, "v", "side", "a", "b").collect()[0]["w1"]
    assert got == pytest.approx(_w1_local(a, b), abs=1e-6)
    # uniform(0,10) vs uniform(2,12): W1 converges to the 2.0 shift
    assert 1.5 < got < 2.5


def test_wasserstein_identical_is_zero(spark):
    from mitoscape_spark.operators.drift import wasserstein_distance

    rows = [("a", float(i)) for i in range(50)] + [
        ("b", float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "side string, v double")
    got = wasserstein_distance(df, "v", "side", "a", "b").collect()[0]["w1"]
    assert got == pytest.approx(0.0, abs=1e-12)


def test_wasserstein_pure_shift_equals_shift(spark):
    from mitoscape_spark.operators.drift import wasserstein_distance

    a = [float(i) for i in range(100)]
    rows = [("a", v) for v in a] + [("b", v + 5.0) for v in a]
    df = spark.createDataFrame(rows, "side string, v double")
    got = wasserstein_distance(df, "v", "side", "a", "b").collect()[0]["w1"]
    assert got == pytest.approx(5.0, abs=1e-9)


def test_coverage_depth_matches_bruteforce(spark):
    from mitoscape_spark.operators.intervals import coverage_depth

    rng = random.Random(31)
    ivs = []
    for _ in range(200):
        s = rng.randint(0, 100)
        ivs.append((s, s + rng.randint(0, 20)))
    df = spark.createDataFrame(ivs, "s long, e long").repartition(8)
    got = {
        r["pos"]: r["depth"]
        for r in coverage_depth(df, "s", "e").collect()
    }
    # brute force: depth at every breakpoint position
    breaks = sorted({s for s, _ in ivs} | {e + 1 for _, e in ivs})
    for pos in breaks:
        want = sum(1 for s, e in ivs if s <= pos <= e)
        assert got[pos] == want
    # beyond the last end, depth returns to zero
    assert got[max(breaks)] == 0


def test_coverage_depth_skips_invalid_intervals(spark):
    from mitoscape_spark.operators.intervals import coverage_depth

    df = spark.createDataFrame(
        [(0, 5), (10, 2), (None, 3), (4, None)], "s long, e long"
    )
    rows = {r["pos"]: r["depth"] for r in coverage_depth(df, "s", "e").collect()}
    assert rows == {0: 1, 6: 0}  # only the valid [0,5] contributes


def test_mann_whitney_matches_scipy_free_reference(spark):
    # hand-computed: a = [1,2,3], b = [4,5,6] -> U1 = 0, all b above a
    from mitoscape_spark.queries.extensions import ext_mann_whitney  # noqa: F401 (query form tested via verify)
    from mitoscape_spark.operators.orderstats import running_prefix
    # direct check of the midrank construction on ties:
    # values [1,1,2]: midranks 1.5, 1.5, 3
    df = spark.createDataFrame(
        [(1.0, 2, 0), (2.0, 1, 0)], "v double, t long, c long"
    )
    got = {
        r["v"]: r["m"]
        for r in running_prefix(df, "v", {"_s": ("t", "sum")}, strict=True)
        .selectExpr("v", "coalesce(_s, 0.0) + (t + 1) / 2.0 AS m")
        .collect()
    }
    assert got == {1.0: 1.5, 2.0: 3.0}


def test_running_prefix_rejects_null_order_key(spark):
    """NULL order keys must fail loudly: bucket_expr would map NULL to
    bucket 0 and silently order it first (round-6 advice item 3)."""
    df = spark.createDataFrame(
        [(1.0, 1.0), (None, 2.0), (3.0, 3.0)], "k double, v double"
    )
    with pytest.raises(ValueError, match="NULL value"):
        running_prefix(df, "k", {"s": ("v", "sum")}).collect()
