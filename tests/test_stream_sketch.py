"""Streaming sketch maintenance: exactly-once, merge == one-shot."""

import pytest

from mitoscape_spark.operators.countmin import countmin_build
from mitoscape_spark.operators.hll import hll_registers
from mitoscape_spark.sources import snapshots as snap
from mitoscape_spark.streaming.sinks import sketch_maintenance_committer
from mitoscape_spark.operators.countmin import countmin_merge


def _cells(df):
    return {(r["d"], r["pos"]): r["c"] for r in df.collect()}


def test_committer_accumulates_and_replay_is_noop(spark, tmp_path):
    state_dir = str(tmp_path / "cms")
    commit = sketch_maintenance_committer(
        state_dir,
        lambda b: countmin_build(b, "k", width=128, depth=3),
        countmin_merge,
    )
    b0 = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    b1 = spark.createDataFrame([(i % 7,) for i in range(70)], "k long")
    commit(b0, 0)
    commit(b1, 1)
    want = _cells(
        countmin_build(b0.unionByName(b1), "k", width=128, depth=3)
    )
    got = _cells(snap.read(spark, state_dir))
    assert got == want
    # replayed batch: ledgered no-op — a sum-merge would double-count
    commit(b1, 1)
    assert _cells(snap.read(spark, state_dir)) == want


def test_committer_history_is_time_travelable(spark, tmp_path):
    state_dir = str(tmp_path / "cms2")
    commit = sketch_maintenance_committer(
        state_dir,
        lambda b: countmin_build(b, "k", width=128, depth=3),
        countmin_merge,
    )
    b0 = spark.createDataFrame([(1,)] * 10, "k long")
    b1 = spark.createDataFrame([(1,)] * 5, "k long")
    commit(b0, 0)
    commit(b1, 1)
    v0 = _cells(snap.read(spark, state_dir, version=1))
    v1 = _cells(snap.read(spark, state_dir))
    assert all(v1[c] == v0[c] + 5 for c in v0)  # key 1's 3 cells


def test_hll_service_matches_direct_build(spark, tmp_path):
    from mitoscape_spark.operators.hll import hll_merge

    state_dir = str(tmp_path / "hll")
    commit = sketch_maintenance_committer(
        state_dir,
        lambda b: hll_registers(b, "k", p=8),
        hll_merge,
    )
    b0 = spark.createDataFrame([(i,) for i in range(500)], "k long")
    b1 = spark.createDataFrame([(i,) for i in range(300, 900)], "k long")
    commit(b0, 0)
    commit(b1, 1)
    want = {
        (r["register"], r["max_rank"])
        for r in hll_registers(
            b0.unionByName(b1), "k", p=8
        ).collect()
    }
    got = {
        (r["register"], r["max_rank"])
        for r in snap.read(spark, state_dir).collect()
    }
    assert got == want


def test_bottomk_sample_service_matches_oneshot(spark, tmp_path):
    import hashlib

    from mitoscape_spark.streaming.sinks import stream_bottomk_sample  # noqa: F401 (service under test via committer)
    from mitoscape_spark.streaming import sinks as S
    from pyspark.sql import functions as F

    state_dir = str(tmp_path / "bk")
    k, salt = 10, "t"

    def build(batch):
        keyed = batch.withColumn(
            "_hk",
            F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))),
        )
        return keyed.orderBy("_hk", "id").limit(k)

    def merge(prev, delta):
        return (
            prev.unionByName(delta)
            .dropDuplicates(["id"])
            .orderBy("_hk", "id")
            .limit(k)
        )

    commit = S.sketch_maintenance_committer(state_dir, build, merge)
    b0 = spark.createDataFrame([(i,) for i in range(0, 400)], "id long")
    b1 = spark.createDataFrame([(i,) for i in range(400, 900)], "id long")
    commit(b0, 0)
    commit(b1, 1)
    got = sorted(
        r["id"] for r in snap.read(spark, state_dir).collect()
    )
    want = sorted(
        sorted(
            range(900),
            key=lambda i: hashlib.md5(f"{salt}{i}".encode()).hexdigest(),
        )[:k]
    )
    assert got == want
