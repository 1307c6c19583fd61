"""Incremental aggregate maintenance (operators/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.incremental import maintain_sum_count


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _agg(df):
    return df.groupBy("k").agg(
        F.sum("v").alias("sum_value"), F.count(F.lit(1)).alias("n")
    )


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, op string")


def test_maintained_equals_recomputed(spark):
    base = _facts(spark, [("a", 10), ("a", 20), ("b", 5)])
    delta = _delta(
        spark,
        [
            ("a", 7, "insert"),
            ("a", 10, "delete"),  # removes one of a's rows
            ("c", 3, "insert"),  # brand-new group
        ],
    )
    out = {
        r["k"]: (r["sum_value"], r["n"])
        for r in maintain_sum_count(_agg(base), delta, ["k"], "v").collect()
    }
    # recompute from scratch: a = {20, 7}, b = {5}, c = {3}
    assert out == {"a": (27, 2), "b": (5, 1), "c": (3, 1)}


def test_group_vanishes_at_zero_count(spark):
    base = _facts(spark, [("a", 10), ("b", 5)])
    delta = _delta(spark, [("b", 5, "delete")])
    out = maintain_sum_count(_agg(base), delta, ["k"], "v").collect()
    assert {r["k"] for r in out} == {"a"}


def test_update_as_delete_plus_insert(spark):
    base = _facts(spark, [("a", 10)])
    delta = _delta(spark, [("a", 10, "delete"), ("a", 99, "insert")])
    (row,) = maintain_sum_count(_agg(base), delta, ["k"], "v").collect()
    assert (row["sum_value"], row["n"]) == (99, 1)


def test_unknown_op_raises(spark):
    base = _facts(spark, [("a", 10)])
    delta = _delta(spark, [("a", 1, "upsert")])
    with pytest.raises(Exception, match="unknown CDC op"):
        maintain_sum_count(_agg(base), delta, ["k"], "v").collect()


def test_empty_delta_is_identity(spark):
    base = _facts(spark, [("a", 10), ("b", 5)])
    delta = _delta(spark, [])
    out = {
        r["k"]: (r["sum_value"], r["n"])
        for r in maintain_sum_count(_agg(base), delta, ["k"], "v").collect()
    }
    assert out == {"a": (10, 1), "b": (5, 1)}


def test_materialized_view_refresh_lifecycle(spark, tmp_path):
    """Snapshot-backed materialized aggregate: O(|delta|) refreshes,
    each state == from-scratch aggregation, history time-travelable."""
    from mitoscape_spark.operators.incremental import (
        refresh_snapshot_aggregate,
    )
    from mitoscape_spark.sources import snapshots as snap

    t = str(tmp_path / "mv")
    d1 = _delta(
        spark, [("a", 10, "insert"), ("a", 20, "insert"), ("b", 5, "insert")]
    )
    assert refresh_snapshot_aggregate(spark, t, d1, ["k"], "v") == 1
    s1 = {
        r["k"]: (r["sum_value"], r["n"])
        for r in snap.read(spark, t).collect()
    }
    assert s1 == {"a": (30, 2), "b": (5, 1)}

    d2 = _delta(
        spark, [("a", 10, "delete"), ("b", 5, "delete"), ("c", 1, "insert")]
    )
    assert refresh_snapshot_aggregate(spark, t, d2, ["k"], "v") == 2
    s2 = {
        r["k"]: (r["sum_value"], r["n"])
        for r in snap.read(spark, t).collect()
    }
    assert s2 == {"a": (20, 1), "c": (1, 1)}  # b vanished at count 0

    # yesterday's dashboard: version 1 still reads exactly as committed
    old = {
        r["k"]: (r["sum_value"], r["n"])
        for r in snap.read(spark, t, version=1).collect()
    }
    assert old == s1
