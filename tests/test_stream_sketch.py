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
