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
    # fresh orphan: the in-flight guard would skip it; tests opt out
    assert snap.vacuum(t) == []  # age-gated by default
    removed = snap.vacuum(t, min_age_seconds=0)
    assert removed == [os.path.join("data", "orphan")]
    assert snap.read(spark, t).count() == 10


def test_vacuum_keep_versions_reclaims_overwritten_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)
    snap.commit(_df(spark, 10, 20), t, mode="overwrite")
    removed = snap.vacuum(t, keep_versions=1, min_age_seconds=0)
    assert len(removed) == 1  # v1's now-unreferenced directory
    assert snap.read(spark, t).count() == 10
    with pytest.raises(ValueError, match="not found"):
        snap.read(spark, t, version=1)


def test_commit_mode_validated(spark, tmp_path):
    with pytest.raises(ValueError, match="append|overwrite"):
        snap.commit(_df(spark, 0, 1), str(tmp_path / "t"), mode="merge")


def test_stream_append_exactly_once_with_replayed_batch(spark, tmp_path):
    """foreachBatch re-delivery of a committed batch_id must be a
    no-op: the manifest chain is the idempotence ledger."""
    import os

    from mitoscape_spark.streaming.sinks import append_stream_to_snapshot

    src = str(tmp_path / "land")
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    base = _df(spark, 0, 50)
    base.coalesce(1).write.parquet(os.path.join(src, "b0"))
    stream = (
        spark.readStream.schema(base.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = append_stream_to_snapshot(stream, t, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert snap.read(spark, t).count() == 50
    committed_versions = len(snap.history(t))

    # at-least-once re-delivery: invoke the sink's actual batch
    # function again with an already-committed batch_id — must no-op
    from mitoscape_spark.streaming.sinks import snapshot_batch_committer

    replay_id = snap.history(t)[-1]["meta"]["batch_id"]
    snapshot_batch_committer(t)(base, replay_id)
    assert len(snap.history(t)) == committed_versions
    assert snap.read(spark, t).count() == 50

    # a genuinely new batch lands as the next version
    _df(spark, 50, 60).coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream2 = (
        spark.readStream.schema(base.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q2 = append_stream_to_snapshot(stream2, t, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert snap.read(spark, t).count() == 60
    assert snap.read(spark, t, version=committed_versions).count() == 50


def test_compact_merges_dirs_preserves_rows_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 50, 10):
        snap.commit(_df(spark, lo, lo + 10), t)
    assert len(snap._load_manifest(t, 5)["dirs"]) == 5
    v = snap.compact(spark, t, target_partitions=1)
    m = snap._load_manifest(t, v)
    assert len(m["dirs"]) == 1 and m["meta"] == {"compaction": True}
    assert snap.read(spark, t).count() == 50
    assert sorted(
        r["k"] for r in snap.read(spark, t).collect()
    ) == list(range(50))
    # pre-compaction versions still time-travel until vacuumed
    assert snap.read(spark, t, version=3).count() == 30
    removed = snap.vacuum(t, keep_versions=1, min_age_seconds=0)
    assert len(removed) == 5  # the five tiny pre-compaction dirs


def test_delete_where_copy_on_write(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 100), t)
    version, n_deleted = snap.delete_where(spark, t, "k % 2 = 0")
    assert (version, n_deleted) == (2, 50)
    remaining = snap.read(spark, t)
    assert remaining.count() == 50
    assert remaining.where("k % 2 = 0").count() == 0
    # audit trail in the manifest + old version intact
    m = snap._load_manifest(t, 2)["meta"]
    assert m == {"delete_where": "k % 2 = 0", "rows_deleted": 50}
    assert snap.read(spark, t, version=1).count() == 100


def test_manifest_stats_prune_directories(spark, tmp_path):
    """Disjoint-range appends: a range read must skip non-intersecting
    directories at the MANIFEST level and still return exact rows."""
    t = str(tmp_path / "tbl")
    for lo in (0, 100, 200, 300):
        snap.commit(
            _df(spark, lo, lo + 100), t, stats_cols=["k"]
        )
    kept, total = snap.prune_dirs(t, {"k": (150, 160)})
    assert (len(kept), total) == (1, 4)  # only the [100,200) directory
    got = sorted(
        r["k"] for r in snap.read_pruned(spark, t, {"k": (150, 160)}).collect()
    )
    assert got == list(range(150, 161))
    # open-ended ranges: >= 250
    kept, _ = snap.prune_dirs(t, {"k": (250, None)})
    assert len(kept) == 2
    assert snap.read_pruned(spark, t, {"k": (250, None)}).count() == 150


def test_prune_keeps_dirs_without_stats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)  # no stats recorded
    snap.commit(_df(spark, 100, 110), t, stats_cols=["k"])
    kept, total = snap.prune_dirs(t, {"k": (0, 5)})
    # stats-less dir conservatively kept; stats dir provably disjoint
    assert (len(kept), total) == (1, 2)
    assert snap.read_pruned(spark, t, {"k": (0, 5)}).count() == 6


def test_prune_empty_result_still_correct_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t, stats_cols=["k"])
    df = snap.read_pruned(spark, t, {"k": (500, 600)})
    assert df.count() == 0
    assert df.columns == ["k"]


def test_streaming_materialized_view_matches_batch_agg(spark, tmp_path):
    """Two micro-batches maintained into the snapshot view must equal
    the from-scratch aggregate; replaying a batch_id must no-op."""
    import os

    from pyspark.sql import functions as F

    from mitoscape_spark.streaming.sinks import (
        aggregate_refresh_committer,
        stream_refresh_aggregate,
    )

    src, t, ckpt = (
        str(tmp_path / "land"),
        str(tmp_path / "view"),
        str(tmp_path / "ck"),
    )
    b0 = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long"
    )
    b0.coalesce(1).write.parquet(os.path.join(src, "b0"))

    def run_stream():
        stream = (
            spark.readStream.schema(b0.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = stream_refresh_aggregate(stream, t, ckpt, ["k"], "v")
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    state = {
        r["k"]: (r["sum_value"], r["n"])
        for r in snap.read(spark, t).collect()
    }
    assert state == {"a": (30, 2), "b": (5, 1)}

    # replay the committed batch — the ledger must reject it
    replay_id = snap.history(t)[-1]["meta"]["batch_id"]
    versions_before = snap.latest_version(t)
    aggregate_refresh_committer(t, ["k"], "v")(b0, replay_id)
    assert snap.latest_version(t) == versions_before

    # second micro-batch folds in incrementally
    spark.createDataFrame([("b", 5), ("c", 1)], "k string, v long").coalesce(
        1
    ).write.parquet(os.path.join(src, "b1"))
    run_stream()
    state = {
        r["k"]: (r["sum_value"], r["n"])
        for r in snap.read(spark, t).collect()
    }
    assert state == {"a": (30, 2), "b": (10, 2), "c": (1, 1)}


def test_restore_rolls_back_without_rewriting_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 100), t)
    snap.delete_where(spark, t, "k >= 50")  # v2: oops, bad delete
    assert snap.read(spark, t).count() == 50
    v = snap.restore(t, 1)
    assert v == 3
    assert snap.read(spark, t).count() == 100  # contents back
    assert snap.read(spark, t, version=2).count() == 50  # audit intact
    assert snap._load_manifest(t, 3)["meta"] == {"restored_from": 1}
    # restored version shares v1's data dirs: zero data movement
    assert snap._load_manifest(t, 3)["dirs"] == snap._load_manifest(t, 1)["dirs"]


def test_maybe_compact_policy_threshold(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 30, 10):
        snap.commit(_df(spark, lo, lo + 10), t)
    # 3 dirs <= threshold: no-op
    assert snap.maybe_compact(spark, t, max_dirs=4) is None
    for lo in range(30, 60, 10):
        snap.commit(_df(spark, lo, lo + 10), t)
    v = snap.maybe_compact(spark, t, max_dirs=4)  # 6 dirs > 4: compacts
    assert v is not None
    assert len(snap._load_manifest(t, v)["dirs"]) == 1
    assert snap.read(spark, t).count() == 60
    assert snap.maybe_compact(spark, t, max_dirs=4) is None  # idempotent


def test_schema_evolution_additive_column(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 10), t)
    snap.commit(
        _df(spark, 10, 20).withColumn("extra", F.lit("x")),
        t,
        allow_new_columns=True,
    )
    evolved = snap.read(spark, t, merge_schema=True)
    assert set(evolved.columns) == {"k", "extra"}
    assert evolved.where("extra IS NULL").count() == 10  # old data
    assert evolved.where("extra = 'x'").count() == 10


def test_truly_concurrent_writers_both_land(spark, tmp_path):
    """Two writers committing at the same moment must serialize into
    two distinct versions with no loss (optimistic concurrency under
    REAL thread concurrency, not a simulated race)."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, 0, 5), t)

    def committer(lo):
        return snap.commit(_df(spark, lo, lo + 5), t)

    with ThreadPoolExecutor(max_workers=2) as ex:
        versions = sorted(
            f.result() for f in [ex.submit(committer, 100),
                                 ex.submit(committer, 200)]
        )
    assert versions == [2, 3]
    assert snap.read(spark, t).count() == 15  # nothing lost


def test_prune_dirs_interval_logic_pure(tmp_path):
    """prune_dirs against hand-written manifests (no Spark): keep iff
    ranges may intersect; open-ended bounds; null stats conservative."""
    import json
    import os

    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "_manifests"))
    manifest = {
        "version": 1, "parent": 0, "mode": "append",
        "dirs": ["data/a", "data/b", "data/c", "data/d"],
        "meta": {},
        "stats": {
            "data/a": {"k": [0, 10]},
            "data/b": {"k": [20, 30]},
            "data/c": {"k": [None, None]},  # null stats -> keep
            # data/d has no stats entry at all -> keep
        },
    }
    with open(snap._manifest_path(t, 1), "w") as fh:
        json.dump(manifest, fh)

    kept, total = snap.prune_dirs(t, {"k": (12, 18)})
    assert total == 4
    assert kept == ["data/c", "data/d"]  # a and b provably disjoint
    kept, _ = snap.prune_dirs(t, {"k": (5, 25)})
    assert kept == ["data/a", "data/b", "data/c", "data/d"]
    kept, _ = snap.prune_dirs(t, {"k": (None, 15)})  # <= 15
    assert kept == ["data/a", "data/c", "data/d"]
    kept, _ = snap.prune_dirs(t, {"k": (25, None)})  # >= 25
    assert kept == ["data/b", "data/c", "data/d"]


# ------------------------------------------------------- change feed
def _feed(spark, t, lo, hi):
    rows = snap.table_changes(spark, t, lo, hi).collect()
    return sorted((r._change_type, r.v) for r in rows)


def test_table_changes_append_is_insert_only(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(5).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(5, 8).withColumnRenamed("id", "v"), t)
    assert _feed(spark, t, 1, 2) == [("insert", v) for v in (5, 6, 7)]
    # bootstrap from version 0: everything is an insert
    assert _feed(spark, t, 0, 2) == [("insert", v) for v in range(8)]


def test_table_changes_delete_emits_exactly_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(10).withColumnRenamed("id", "v"), t)
    snap.delete_where(spark, t, "v % 3 = 0")
    # survivors rewrote into a fresh dir but cancel via EXCEPT ALL
    assert _feed(spark, t, 1, 2) == [
        ("delete", 0), ("delete", 3), ("delete", 6), ("delete", 9)
    ]


def test_table_changes_compaction_is_silent(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(4).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(4, 6).withColumnRenamed("id", "v"), t)
    snap.compact(spark, t, target_partitions=1)
    assert _feed(spark, t, 2, 3) == []
    # and the span across append+compact nets out to just the append
    assert _feed(spark, t, 1, 3) == [("insert", 4), ("insert", 5)]


def test_table_changes_reads_only_changed_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(3, 5).withColumnRenamed("id", "v"), t)
    feed = snap.table_changes(spark, t, 1, 2)
    m1 = set(snap._load_manifest(t, 1)["dirs"])
    m2 = set(snap._load_manifest(t, 2)["dirs"])
    changed = m2 ^ m1
    for f in feed.inputFiles():
        assert any(d in f for d in changed), f
        assert not any(d in f for d in m1 & m2), f


def test_table_changes_bad_range_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snap.table_changes(spark, t, 5, 1)


# -------------------------------------------------- deletion vectors
def _vals(spark, t, **kw):
    return sorted(r.v for r in snap.read(spark, t, **kw).collect())


def test_dv_delete_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(10).withColumnRenamed("id", "v"), t)
    v, n = snap.delete_where_dv(spark, t, "v % 3 = 0", key_col="v")
    assert (v, n) == (2, 4)
    assert _vals(spark, t) == [1, 2, 4, 5, 7, 8]
    # the data dirs did NOT rewrite: manifest v2 references v1's dirs
    assert snap._load_manifest(t, 2)["dirs"] == \
        snap._load_manifest(t, 1)["dirs"]
    # time travel to v1 still sees everything
    assert _vals(spark, t, version=1) == list(range(10))


def test_dv_survives_appends_and_blocks_reinsert(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(5).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v = 3", key_col="v")
    snap.commit(spark.range(10, 12).withColumnRenamed("id", "v"), t)
    assert _vals(spark, t) == [0, 1, 2, 4, 10, 11]
    # re-inserting a tombstoned key stays invisible until a rewrite
    snap.commit(
        spark.createDataFrame([(3,)], "v long"), t
    )
    assert 3 not in _vals(spark, t)


def test_dv_compact_materializes_and_clears(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(8).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v >= 6", key_col="v")
    ver = snap.compact(spark, t, target_partitions=1)
    m = snap._load_manifest(t, ver)
    assert not m.get("dvs")
    assert _vals(spark, t) == list(range(6))
    # after compaction the tombstoned key may come back
    snap.commit(spark.createDataFrame([(6,)], "v long"), t)
    assert 6 in _vals(spark, t)


def test_dv_vacuum_keeps_dv_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(6).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v = 1", key_col="v")
    removed = snap.vacuum(t, min_age_seconds=0)
    assert removed == []
    assert _vals(spark, t) == [0, 2, 3, 4, 5]


def test_dv_table_changes_reports_deletes_and_revives(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(6).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v IN (1, 4)", key_col="v")
    # dv commit: unchanged dirs, feed = exactly the tombstoned rows
    assert _feed(spark, t, 1, 2) == [("delete", 1), ("delete", 4)]
    # compact: materializes the delete — net change vs v2 is EMPTY
    snap.compact(spark, t, target_partitions=1)
    assert _feed(spark, t, 2, 3) == []
    # and the span v1 -> v3 still shows the two deletes once
    assert _feed(spark, t, 1, 3) == [("delete", 1), ("delete", 4)]


def test_dv_datasource_refuses(spark, tmp_path):
    import pytest as _pytest

    from mitoscape_spark.sources.snapshot_datasource import register

    register(spark)
    t = str(tmp_path / "t")
    snap.commit(spark.range(4).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v = 0", key_col="v")
    with _pytest.raises(Exception, match="deletion vectors"):
        spark.read.format("snapshot").load(t).collect()


def test_dv_read_pruned_applies_vectors(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(
        spark.range(0, 50).withColumnRenamed("id", "v"),
        t,
        stats_cols=["v"],
    )
    snap.commit(
        spark.range(50, 100).withColumnRenamed("id", "v"),
        t,
        stats_cols=["v"],
    )
    snap.delete_where_dv(spark, t, "v IN (10, 60)", key_col="v")
    got = sorted(
        r.v
        for r in snap.read_pruned(spark, t, {"v": (0, 20)}).collect()
    )
    assert got == [x for x in range(21) if x != 10]


# ------------------------------------- schema enforcement + AS OF
def test_commit_rejects_incompatible_appends(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    # missing column
    with _pytest.raises(ValueError, match="missing table columns"):
        snap.commit(spark.range(3).select(F.lit("a").alias("w")), t)
    # type change
    with _pytest.raises(ValueError, match="type changed"):
        snap.commit(
            spark.range(3).select(F.col("id").cast("string").alias("v")),
            t,
        )
    # silent new column
    with _pytest.raises(ValueError, match="allow_new_columns"):
        snap.commit(
            spark.range(3)
            .withColumnRenamed("id", "v")
            .withColumn("extra", F.lit(1)),
            t,
        )
    # overwrite may change anything
    v = snap.commit(
        spark.range(3).select(F.lit("a").alias("w")), t, mode="overwrite"
    )
    assert v == 2


def test_read_timestamp_as_of(spark, tmp_path):
    import time as _time

    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    t1 = _time.time()
    _time.sleep(0.05)
    snap.commit(spark.range(3, 6).withColumnRenamed("id", "v"), t)
    assert snap.version_as_of(t, t1) == 1
    got = sorted(r.v for r in snap.read(spark, t, as_of=t1).collect())
    assert got == [0, 1, 2]
    got = sorted(
        r.v for r in snap.read(spark, t, as_of=_time.time()).collect()
    )
    assert got == [0, 1, 2, 3, 4, 5]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no version"):
        snap.version_as_of(t, 0.0)
    with _pytest.raises(ValueError, match="not both"):
        snap.read(spark, t, version=1, as_of=t1)


def test_optimize_zorder_clusters_and_keeps_history(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    # scattered on both dims: hash-ish ordering of (x, y)
    df = spark.range(4000).select(
        (F.col("id") * 997 % 1000).alias("x"),
        (F.col("id") * 577 % 1000).alias("y"),
    )
    snap.commit(df, t)
    v = snap.optimize_zorder(spark, t, ["x", "y"], n_files=4)
    assert snap._load_manifest(t, v)["meta"] == {"zorder": ["x", "y"]}
    # content unchanged
    assert snap.read(spark, t).count() == 4000
    assert snap.read(spark, t, version=1).count() == 4000
    # manifest stats recorded for the clustered dims
    m = snap._load_manifest(t, v)
    d = m["dirs"][0]
    assert set(m["stats"][d]) == {"x", "y"}
    # clustering effect: each output FILE spans a bounded slice of
    # BOTH dimensions (z-order locality), unlike the scattered input
    import pyarrow.parquet as pq

    full = os.path.join(t, d)
    spans_x, spans_y = [], []
    for f in sorted(os.listdir(full)):
        if not f.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(full, f))
        xs, ys = tbl.column("x").to_pylist(), tbl.column("y").to_pylist()
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    assert len(spans_x) >= 3
    # a single-dim sort would leave the second dim spanning ~full range
    # in every file; z-order keeps the AVERAGE span well below it
    assert sum(spans_y) / len(spans_y) < 800
    assert sum(spans_x) / len(spans_x) < 800


# ------------------------------------------------- bloom dir skipping
def test_bloom_point_lookup_skips_dirs_no_false_negatives(spark, tmp_path):
    t = str(tmp_path / "t")
    # three directories with DISJOINT id sets but overlapping ranges
    # (min/max stats could never separate them)
    snap.commit(
        spark.range(0, 3000, 3).withColumnRenamed("id", "v"), t
    )
    snap.commit(
        spark.range(1, 3000, 3).withColumnRenamed("id", "v"), t
    )
    snap.commit(
        spark.range(2, 3000, 3).withColumnRenamed("id", "v"), t
    )
    v = snap.attach_bloom(spark, t, ["v"])
    m = snap._load_manifest(t, v)
    assert all("v" in m["blooms"][d] for d in m["dirs"])
    # no false negatives: every present value is found, exactly once
    for probe in (0, 1, 2, 2997, 1501):
        got = snap.read_point_lookup(spark, t, "v", probe).collect()
        assert [r.v for r in got] == [probe], probe
    # pruning actually happens: a value in dir-0 only should read
    # FEWER input files than the full table (allow bloom false
    # positives, but at 1000 keys/dir the 3-dir worst case is rare)
    looked = snap.read_point_lookup(spark, t, "v", 0)
    all_files = snap.read(spark, t).inputFiles()
    assert len(looked.inputFiles()) < len(all_files)
    # absent value: usually zero dirs -> empty result either way
    assert snap.read_point_lookup(spark, t, "v", 999999).count() == 0


def test_bloom_survives_append_without_blooms(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(10).withColumnRenamed("id", "v"), t)
    snap.attach_bloom(spark, t, ["v"])
    # an append WITHOUT blooms: its dir is conservatively kept, and
    # the OLD dir's bloom metadata must survive the commit
    snap.commit(spark.range(100, 110).withColumnRenamed("id", "v"), t)
    m = snap._load_manifest(t, snap.latest_version(t))
    bloomed = [d for d in m["dirs"] if "v" in m.get("blooms", {}).get(d, {})]
    assert len(bloomed) == 1  # the original dir kept its bloom
    got = snap.read_point_lookup(spark, t, "v", 105).collect()
    assert [r.v for r in got] == [105]
    got = snap.read_point_lookup(spark, t, "v", 5).collect()
    assert [r.v for r in got] == [5]
    # and pruning still works: a value in NEITHER dir reads only the
    # bloomless dir (the bloomed one is provably absent-pruned)
    probe = snap.read_point_lookup(spark, t, "v", 987654)
    assert len(probe.inputFiles()) < len(snap.read(spark, t).inputFiles())


# ------------------------------------------- MERGE INTO + replication
def test_merge_into_updates_and_inserts(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, val string"
        ),
        t,
    )
    src = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k long, val string"
    )
    v = snap.merge_into(spark, t, src, keys=["k"])
    got = {r.k: r.val for r in snap.read(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    assert snap._load_manifest(t, v)["meta"] == {"merge_keys": ["k"]}
    # pre-merge state still time-travels
    assert {r.k: r.val for r in snap.read(spark, t, version=1).collect()} \
        == {1: "a", 2: "b"}


def test_replicate_changes_mirrors_source(spark, tmp_path):
    src_t, dst_t = str(tmp_path / "src"), str(tmp_path / "dst")
    snap.commit(spark.range(6).withColumnRenamed("id", "v"), src_t)
    # bootstrap the mirror from version 0
    snap.replicate_changes(spark, src_t, dst_t, "v", from_version=0)
    assert sorted(r.v for r in snap.read(spark, dst_t).collect()) == \
        list(range(6))
    mark = snap.latest_version(src_t)
    # source evolves: append + row-level delete
    snap.commit(spark.range(6, 9).withColumnRenamed("id", "v"), src_t)
    snap.delete_where(spark, src_t, "v % 2 = 0")
    snap.replicate_changes(spark, src_t, dst_t, "v", from_version=mark)
    src_rows = sorted(r.v for r in snap.read(spark, src_t).collect())
    dst_rows = sorted(r.v for r in snap.read(spark, dst_t).collect())
    assert dst_rows == src_rows == [1, 3, 5, 7]
    m = snap._load_manifest(dst_t, snap.latest_version(dst_t))["meta"]
    assert m["replicated_from"] == src_t


def test_table_count_from_manifest_metadata(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(7).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(7, 12).withColumnRenamed("id", "v"), t)
    m = snap._load_manifest(t, 2)
    assert sum(m["rows"].values()) == 12  # recorded at commit time
    assert snap.table_count(spark, t) == 12
    assert snap.table_count(spark, t, version=1) == 7
    # deletion vectors force the real count (keys != rows in general)
    snap.delete_where_dv(spark, t, "v < 3", key_col="v")
    assert snap.table_count(spark, t) == 9


def test_restore_to_dv_version_keeps_tombstones(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(10).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v >= 8", key_col="v")   # v2
    snap.commit(spark.range(50, 53).withColumnRenamed("id", "v"), t)
    snap.restore(t, 2)
    got = sorted(r.v for r in snap.read(spark, t).collect())
    # restored state = v2's EFFECTIVE rows: tombstones must not revert
    assert got == list(range(8))
    # row counts + vacuum still coherent after the restore
    assert snap.table_count(spark, t) == 8
    assert snap.vacuum(t, min_age_seconds=0) == []


def test_zorder_and_merge_materialize_deletion_vectors(spark, tmp_path):
    """Lifecycle interactions: optimize_zorder and merge_into both
    read THROUGH deletion vectors and publish overwrites, so the new
    version has the tombstones materialized and cleared."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    snap.commit(
        spark.range(20).selectExpr("id AS k", "id * 2 AS x"), t
    )
    snap.delete_where_dv(spark, t, "k >= 15", key_col="k")
    v = snap.optimize_zorder(spark, t, ["k", "x"], n_files=2)
    assert not snap._load_manifest(t, v).get("dvs")
    assert sorted(r.k for r in snap.read(spark, t).collect()) == \
        list(range(15))

    t2 = str(tmp_path / "t2")
    snap.commit(
        spark.range(10).selectExpr("id AS k", "id AS x"), t2
    )
    snap.delete_where_dv(spark, t2, "k = 0", key_col="k")
    src = spark.createDataFrame([(5, 99), (50, 1)], "k long, x long")
    v = snap.merge_into(spark, t2, src, keys=["k"])
    assert not snap._load_manifest(t2, v).get("dvs")
    rows = {r.k: r.x for r in snap.read(spark, t2).collect()}
    assert 0 not in rows          # tombstone did not resurrect
    assert rows[5] == 99 and rows[50] == 1 and len(rows) == 10


def test_consume_changes_checkpointed_loop(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "cdc.json")
    seen = []

    def apply_fn(feed, lo, hi):
        seen.append((lo, hi, sorted(
            (r._change_type, r.v) for r in feed.collect()
        )))

    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    assert snap.consume_changes(spark, t, ckpt, apply_fn) == (0, 1)
    # nothing new: apply_fn is NOT called
    assert snap.consume_changes(spark, t, ckpt, apply_fn) == (1, 1)
    snap.commit(spark.range(3, 5).withColumnRenamed("id", "v"), t)
    snap.delete_where(spark, t, "v = 0")
    assert snap.consume_changes(spark, t, ckpt, apply_fn) == (1, 3)
    assert seen == [
        (0, 1, [("insert", 0), ("insert", 1), ("insert", 2)]),
        (1, 3, [("delete", 0), ("insert", 3), ("insert", 4)]),
    ]


def test_consume_changes_crash_before_watermark_replays(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "cdc.json")
    snap.commit(spark.range(4).withColumnRenamed("id", "v"), t)

    def boom(feed, lo, hi):
        raise RuntimeError("crash mid-apply")

    with pytest.raises(RuntimeError):
        snap.consume_changes(spark, t, ckpt, boom)
    # watermark did NOT advance: the next consumer sees the same range
    got = []
    snap.consume_changes(
        spark, t, ckpt, lambda f, lo, hi: got.append((lo, hi, f.count()))
    )
    assert got == [(0, 1, 4)]


def test_concurrent_dv_and_append_both_land(spark, tmp_path):
    """A deletion-vector commit racing a data append: optimistic
    retries must serialize them into two consistent versions — the dv
    publish re-reads its parent on every retry, so whichever order
    wins, the final state is (base + appended) minus tombstones."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "t")
    snap.commit(spark.range(10).withColumnRenamed("id", "v"), t)

    def do_append():
        return snap.commit(
            spark.range(100, 105).withColumnRenamed("id", "v"), t
        )

    def do_dv():
        return snap.delete_where_dv(spark, t, "v < 3", key_col="v")[0]

    with ThreadPoolExecutor(2) as ex:
        fa, fd = ex.submit(do_append), ex.submit(do_dv)
        va, vd = fa.result(), fd.result()
    assert {va, vd} == {2, 3}
    got = sorted(r.v for r in snap.read(spark, t).collect())
    assert got == [3, 4, 5, 6, 7, 8, 9, 100, 101, 102, 103, 104]
    # the feed across the whole race nets to the same state
    assert snap.table_count(spark, t) == 12


# ----------------------------- round-2 review fixes, regression-pinned
def test_commit_stats_reflect_written_data_not_lineage(spark, tmp_path):
    """Non-deterministic input: manifest stats must describe the rows
    actually WRITTEN (re-executing the plan could yield different
    min/max and make pruning skip real data)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    nondet = spark.range(500).select(
        (F.rand() * 1000).alias("x")
    )
    snap.commit(nondet, t, stats_cols=["x"])
    m = snap._load_manifest(t, 1)
    d = m["dirs"][0]
    lo, hi = m["stats"][d]["x"]
    got = snap.read(spark, t).agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    ).head()
    assert lo == got["lo"] and hi == got["hi"]


def test_schema_enforcement_sees_evolved_columns(spark, tmp_path):
    """A column added via allow_new_columns must be type-checked on
    later appends (plain single-footer schema would miss it)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "a"), t)
    snap.commit(
        spark.range(3).withColumnRenamed("id", "a")
        .withColumn("b", F.lit("s")),
        t,
        allow_new_columns=True,
    )
    # conflicting type for the evolved column must be rejected
    with pytest.raises(ValueError, match="type changed|missing"):
        snap.commit(
            spark.range(3).withColumnRenamed("id", "a")
            .withColumn("b", F.lit(1)),
            t,
            allow_new_columns=True,
        )


def test_prune_dirs_timestamp_bounds_do_not_crash(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    t = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    for day in (0, 10):
        df = spark.range(5).select(
            (F.lit(base) + F.make_interval(days=F.col("id") + day)
             ).alias("ts")
        )
        snap.commit(df, t, stats_cols=["ts"])
    kept, total = snap.prune_dirs(
        t, {"ts": (dt.datetime(2024, 1, 11), dt.datetime(2024, 1, 12))}
    )
    assert total == 2 and len(kept) == 1  # first dir provably disjoint
    got = snap.read_pruned(
        spark, t,
        {"ts": (dt.datetime(2024, 1, 11), dt.datetime(2024, 1, 12))},
    ).count()
    assert got == 2  # Jan 11 + Jan 12 rows


def test_table_changes_skips_common_dirs_when_dv_unchanged(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    snap.commit(spark.range(6).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v = 0", key_col="v")
    snap.commit(spark.range(10, 12).withColumnRenamed("id", "v"), t)
    feed = snap.table_changes(spark, t, 2, 3)
    rows = sorted((r._change_type, r.v) for r in feed.collect())
    assert rows == [("insert", 10), ("insert", 11)]
    # cost contract: only the appended dir is read — the unchanged
    # (tombstone-carrying) base dir never opens
    m2 = set(snap._load_manifest(t, 2)["dirs"])
    for f in feed.inputFiles():
        assert not any(d in f for d in m2), f


def test_vacuum_age_guard_skips_fresh_dirs_by_default(spark, tmp_path):
    t = str(tmp_path / "t")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    spark.range(2).write.parquet(os.path.join(t, "data", "inflight"))
    assert snap.vacuum(t) == []  # young unreferenced dir: protected
    assert snap.vacuum(t, min_age_seconds=0) == [
        os.path.join("data", "inflight")
    ]


def test_schema_diff_reports_evolution(spark, tmp_path):
    from mitoscape_spark.sources import snapshots as snap

    t = str(tmp_path / "evolve")
    v1 = snap.commit(
        spark.createDataFrame([(1, "a")], "k long, v string"), t
    )
    v2 = snap.commit(
        spark.createDataFrame(
            [(2, "b", 1.5)], "k long, v string, score double"
        ),
        t,
        mode="append",
        allow_new_columns=True,
    )
    diff = snap.schema_diff(spark, t, v1, v2)
    assert diff == [
        {"change": "added", "column": "score",
         "from_type": None, "to_type": "double"}
    ]
    assert snap.schema_diff(spark, t, v2, v2) == []
    # direction matters: reversed diff reports a removal
    assert snap.schema_diff(spark, t, v2, v1) == [
        {"change": "removed", "column": "score",
         "from_type": "double", "to_type": None}
    ]


def test_concurrent_writers_serialize_without_lost_commits(spark, tmp_path):
    """10 threads race 3 commits each through the optimistic
    exclusive-create loop: every commit must land as a distinct
    version, no manifest lost or overwritten, final row count exact."""
    import threading

    from mitoscape_spark.sources import snapshots as snap

    t = str(tmp_path / "contended")
    snap.commit(spark.createDataFrame([(0, -1)], "w long, i long"), t)
    errors = []

    def writer(w: int):
        try:
            for i in range(3):
                snap.commit(
                    spark.createDataFrame([(w, i)], "w long, i long"),
                    t,
                    mode="append",
                    meta={"writer": w, "i": i},
                )
        except Exception as exc:  # noqa: BLE001
            errors.append((w, exc))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(10)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert snap.latest_version(t) == 31  # 1 seed + 30 racing commits
    rows = snap.read(spark, t).collect()
    assert len(rows) == 31
    got = {(r.w, r.i) for r in rows}
    assert {(w, i) for w in range(10) for i in range(3)} <= got
    # the manifest chain is a single unbroken parent line
    hist = snap.history(t)
    versions = sorted(m["version"] for m in hist)
    assert versions == list(range(1, 32))
    parents = {m["version"]: m["parent"] for m in hist}
    assert all(parents[v] == v - 1 for v in range(2, 32))


def test_clone_is_self_contained(spark, tmp_path):
    import shutil

    from mitoscape_spark.sources import snapshots as snap

    src = str(tmp_path / "src")
    dst = str(tmp_path / "branch")
    snap.commit(spark.createDataFrame([(1, "a")], "k long, v string"), src)
    snap.commit(
        spark.createDataFrame([(2, "b")], "k long, v string"),
        src, mode="append",
    )
    v = snap.clone(spark, src, dst, version=1)  # clone the OLD version
    assert v == 1
    got = {(r.k, r.v) for r in snap.read(spark, dst).collect()}
    assert got == {(1, "a")}  # version-1 contents only
    meta = snap.history(dst)[0]["meta"]
    assert meta["cloned_from"] == src and meta["cloned_version"] == 1
    # self-contained: deleting the source leaves the clone readable
    shutil.rmtree(src)
    assert {(r.k, r.v) for r in snap.read(spark, dst).collect()} == {(1, "a")}


def test_clone_applies_deletion_vectors(spark, tmp_path):
    from mitoscape_spark.sources import snapshots as snap

    src = str(tmp_path / "dv_src")
    dst = str(tmp_path / "dv_clone")
    snap.commit(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                              "k long, v string"),
        src,
    )
    snap.delete_where_dv(spark, src, "k >= 7", key_col="k")
    snap.clone(spark, src, dst)
    got = {r.k for r in snap.read(spark, dst).collect()}
    assert got == set(range(7))  # tombstoned rows do NOT resurrect
    # and the clone carries no DV baggage: its manifest is a plain v1
    assert snap.history(dst)[0].get("dvs") in (None, [])
