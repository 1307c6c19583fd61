"""Distributed exact ranking + quantile normalization
(operators/ranking.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mitoscape_spark.operators.ranking import global_rank, quantile_normalize


def test_global_rank_equals_naive_window_with_ties(spark):
    """Bucketed two-phase ranking must equal the single-partition
    row_number under (score, id) — including heavy score ties that
    straddle bucket boundaries."""
    rows = [(i, float(i % 7)) for i in range(200)]  # 7 values, 200 rows
    df = spark.createDataFrame(rows, "id long, score double")
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, "score", "id", n_buckets=5).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("score", "id"))
        ).collect()
    }
    assert got == want


def test_quantile_normalize_maps_groups_onto_pooled(spark):
    """Two sources with shifted distributions: after normalization the
    same within-group rank receives the same pooled value — and the
    min/max of each group map to pooled order statistics, not the
    group's own extremes."""
    rows = [("a", i, float(i)) for i in range(5)] + [
        ("b", 10 + i, float(100 + i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, s double")
    out = {
        r["doc_id"]: r["norm_score"]
        for r in quantile_normalize(df, "s", "source", "doc_id").collect()
    }
    # pooled sorted values: 0..4, 100..104 (N=10). pr in each group:
    # 0, .25, .5, .75, 1 -> k = floor(pr*9)+1 = 1,3,5,7,10
    pooled = [0.0, 1.0, 2.0, 3.0, 4.0, 100.0, 101.0, 102.0, 103.0, 104.0]
    expect = [pooled[k - 1] for k in (1, 3, 5, 7, 10)]
    assert [out[i] for i in range(5)] == expect  # group a
    assert [out[10 + i] for i in range(5)] == expect  # group b: SAME map


def test_global_rank_rejects_null_score(spark):
    """NULL scores must fail loudly instead of silently ranking first
    via bucket 0 (round-6 advice item 3)."""
    import pytest

    df = spark.createDataFrame(
        [(1, 0.5), (2, None), (3, 0.9)], "id long, score double"
    )
    with pytest.raises(ValueError, match="NULL value"):
        global_rank(df, "score", "id").collect()
