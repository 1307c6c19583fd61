"""Snapshot tables (sources/snapshots.py): atomic commits, time
travel, optimistic concurrency, vacuum."""

from __future__ import annotations

import os

import pytest

from mitoscape_spark.sources import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_append_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert snap.commit(_df(spark, 0, 100), t) == 1
    assert snap.commit(_df(spark, 100, 200), t) == 2
    assert snap.read(spark, t, version=1).count() == 100
    assert snap.read(spark, t, version=2).count() == 200
    assert snap.read(spark, t).count() == 200  # latest


def test_overwrite_replaces_snapshot_but_keeps_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 100), t)
    snap.commit(_df(spark, 500, 510), t, mode="overwrite")
    assert snap.read(spark, t).count() == 10
    assert snap.read(spark, t, version=1).count() == 100  # still readable
    hist = snap.history(t)
    assert [m["mode"] for m in hist] == ["append", "overwrite"]


def test_read_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="no commits"):
        snap.read(spark, t)
    snap.commit(_df(spark, 0, 10), t)
    with pytest.raises(ValueError, match="version 7 not found"):
        snap.read(spark, t, version=7)


def test_concurrent_commit_race_retries_to_next_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)
    # simulate a racing writer that publishes v2 first
    os.makedirs(os.path.dirname(snap._manifest_path(t, 2)), exist_ok=True)
    import json

    with open(snap._manifest_path(t, 2), "w") as fh:
        json.dump(
            {"version": 2, "parent": 1, "mode": "append",
             "dirs": snap._load_manifest(t, 1)["dirs"]},
            fh,
        )
    v = snap.commit(_df(spark, 10, 20), t)
    assert v == 3  # lost the race at 2, landed at 3
    # the append chained off v2's dir list (the racing winner), not v1
    assert snap.read(spark, t, version=3).count() == 20


def test_crash_orphan_is_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)
    # simulate a crashed writer: data dir written, no manifest
    _df(spark, 0, 5).write.parquet(os.path.join(t, "data", "orphan"))
    assert snap.read(spark, t).count() == 10  # reader never sees it
    removed = snap.vacuum(t)
    assert removed == [os.path.join("data", "orphan")]
    assert snap.read(spark, t).count() == 10


def test_vacuum_keep_versions_reclaims_overwritten_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)
    snap.commit(_df(spark, 10, 20), t, mode="overwrite")
    removed = snap.vacuum(t, keep_versions=1)
    assert len(removed) == 1  # v1's now-unreferenced directory
    assert snap.read(spark, t).count() == 10
    with pytest.raises(ValueError, match="not found"):
        snap.read(spark, t, version=1)


def test_commit_mode_validated(spark, tmp_path):
    with pytest.raises(ValueError, match="append|overwrite"):
        snap.commit(_df(spark, 0, 1), str(tmp_path / "t"), mode="merge")
