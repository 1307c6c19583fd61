"""global_ntile vs the stated floor((rank-1)k/n)+1 contract."""

import random

import pytest

from mitoscape_spark.operators.ranking import global_ntile


@pytest.mark.parametrize("n,k", [(100, 5), (103, 5), (7, 3), (5, 8)])
def test_global_ntile_matches_contract(spark, n, k):
    rng = random.Random(n * k)
    rows = [(i, rng.uniform(0, 1)) for i in range(n)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, s double").repartition(4)
    got = {
        r["id"]: r["bucket"]
        for r in global_ntile(df, "s", "id", k).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    for rank, (i, _) in enumerate(order, start=1):
        assert got[i] == (rank - 1) * k // n + 1
    # buckets are contiguous 1..min(k, n) and sizes differ by <= 1
    sizes = [list(got.values()).count(b) for b in range(1, k + 1)]
    used = [s for s in sizes if s]
    assert max(used) - min(used) <= 1


def test_global_ntile_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    with pytest.raises(ValueError):
        global_ntile(df, "s", "id", 0)
