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


def test_distinct_sketch_incremental_equals_oneshot(spark):
    """Union of per-delta sketches must estimate the same as one
    sketch over all rows (HLL is exact at these cardinalities)."""
    from mitoscape_spark.operators.incremental import (
        estimate_distinct,
        maintain_distinct_sketch,
    )

    all_rows = [("a", i % 50) for i in range(500)] + [
        ("b", i % 7) for i in range(100)
    ]
    df = spark.createDataFrame(all_rows, "k string, v long")
    d1 = df.where("v % 2 = 0")
    d2 = df.where("v % 2 = 1")

    s = maintain_distinct_sketch(None, d1, ["k"], "v")
    s = maintain_distinct_sketch(s, d2, ["k"], "v")
    got = {
        r["k"]: r["n_distinct"]
        for r in estimate_distinct(s, ["k"]).collect()
    }
    assert got == {"a": 50, "b": 7}


def test_distinct_sketch_new_key_birth(spark):
    from mitoscape_spark.operators.incremental import (
        estimate_distinct,
        maintain_distinct_sketch,
    )

    base = maintain_distinct_sketch(
        None,
        spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long"),
        ["k"],
        "v",
    )
    s = maintain_distinct_sketch(
        base,
        spark.createDataFrame([("z", 9)], "k string, v long"),
        ["k"],
        "v",
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in estimate_distinct(s, ["k"]).collect()
    }
    assert got == {"a": 2, "z": 1}


def test_snapshot_backed_distinct_view(spark, tmp_path):
    """Sketch state survives the parquet round-trip and keeps merging
    across refreshes; old view states remain time-travelable."""
    from mitoscape_spark.operators.incremental import (
        estimate_distinct,
        refresh_snapshot_distinct,
    )
    from mitoscape_spark.sources import snapshots as snap

    t = str(tmp_path / "ndview")
    d1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "k string, v long"
    )
    assert refresh_snapshot_distinct(spark, t, d1, ["k"], "v") == 1
    d2 = spark.createDataFrame(
        [("a", 2), ("a", 3)], "k string, v long"  # one dup, one new
    )
    assert refresh_snapshot_distinct(spark, t, d2, ["k"], "v") == 2
    got = {
        r["k"]: r["n_distinct"]
        for r in estimate_distinct(
            snap.read(spark, t), ["k"]
        ).collect()
    }
    assert got == {"a": 3, "b": 1}
    old = {
        r["k"]: r["n_distinct"]
        for r in estimate_distinct(
            snap.read(spark, t, version=1), ["k"]
        ).collect()
    }
    assert old == {"a": 2, "b": 1}


def test_min_max_insert_only_matches_scratch(spark):
    from mitoscape_spark.operators.incremental import (
        maintain_min_max_insert_only,
    )

    base_rows = [("a", 5.0), ("a", 9.0), ("b", 3.0)]
    delta_rows = [("a", 1.0, "insert"), ("c", 7.0, "insert")]
    base = (
        spark.createDataFrame(base_rows, "k string, v double")
        .groupBy("k")
        .agg(F.min("v").alias("min_value"), F.max("v").alias("max_value"))
    )
    delta = spark.createDataFrame(delta_rows, "k string, v double, op string")
    got = {
        r.k: (r.min_value, r.max_value)
        for r in maintain_min_max_insert_only(
            base, delta, ["k"], "v"
        ).collect()
    }
    scratch = (
        spark.createDataFrame(
            base_rows + [(k, v) for k, v, _ in delta_rows],
            "k string, v double",
        )
        .groupBy("k")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    want = {r.k: (r.mn, r.mx) for r in scratch.collect()}
    assert got == want  # incl. key birth ('c') and untouched key ('b')


def test_min_max_insert_only_rejects_deletes(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.incremental import (
        maintain_min_max_insert_only,
    )

    base = spark.createDataFrame(
        [("a", 1.0, 2.0)], "k string, min_value double, max_value double"
    )
    delta = spark.createDataFrame(
        [("a", 1.0, "delete")], "k string, v double, op string"
    )
    with _pytest.raises(ValueError, match="not delta-maintainable"):
        maintain_min_max_insert_only(base, delta, ["k"], "v")


def test_maintain_sum_count_merges_null_group_keys(spark):
    from mitoscape_spark.operators.incremental import maintain_sum_count

    base = spark.createDataFrame(
        [(None, 10.0, 2), ("a", 1.0, 1)],
        "k string, sum_value double, n long",
    )
    delta = spark.createDataFrame(
        [(None, 5.0, "insert"), ("a", 2.0, "insert")],
        "k string, v double, op string",
    )
    got = {
        r.k: (r.sum_value, r.n)
        for r in maintain_sum_count(base, delta, ["k"], "v").collect()
    }
    # NULL is ONE group (groupBy semantics), not two split rows
    assert got == {None: (15.0, 3), "a": (3.0, 2)}


def test_min_max_insert_only_null_op_rejected(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.incremental import (
        maintain_min_max_insert_only,
    )

    base = spark.createDataFrame(
        [("a", 1.0, 2.0)], "k string, min_value double, max_value double"
    )
    delta = spark.createDataFrame(
        [("a", -999.0, None)], "k string, v double, op string"
    )
    with _pytest.raises(ValueError, match="non-insert"):
        maintain_min_max_insert_only(base, delta, ["k"], "v")
