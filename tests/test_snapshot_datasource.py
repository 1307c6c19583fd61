"""format("snapshot") — Python DataSource batch reader/writer over
snapshot tables (sources/snapshot_datasource.py)."""

from __future__ import annotations

import pytest

from mitoscape_spark.sources import snapshots as snap
from mitoscape_spark.sources.snapshot_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_write_then_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    df.write.format("snapshot").mode("append").save(t)
    back = spark.read.format("snapshot").load(t)
    assert back.count() == 1000
    assert sorted(back.columns) == ["k"]
    assert back.agg({"k": "sum"}).head()[0] == df.agg({"k": "sum"}).head()[0]
    # written through the SAME commit protocol: library API reads it
    assert snap.read(spark, t).count() == 1000
    assert snap.history(t)[-1]["meta"]["writer"] == "python-datasource"


def test_append_and_overwrite_modes_version_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.range(0, 10).write.format("snapshot").mode("append").save(t)
    spark.range(10, 30).write.format("snapshot").mode("append").save(t)
    assert spark.read.format("snapshot").load(t).count() == 30
    spark.range(0, 5).write.format("snapshot").mode("overwrite").save(t)
    assert spark.read.format("snapshot").load(t).count() == 5
    # time travel through the reader option
    assert (
        spark.read.format("snapshot").option("version", 2).load(t).count()
        == 30
    )


def test_interop_library_commit_then_format_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(spark.range(0, 42).withColumnRenamed("id", "k"), t)
    assert spark.read.format("snapshot").load(t).count() == 42


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(Exception, match="no commits"):
        spark.read.format("snapshot").load(str(tmp_path / "none")).count()


# ------------------------------------------------ streaming the table
def _stream_once(spark, t, out, ckpt, **opts):
    from mitoscape_spark.sources.snapshot_stream import register

    register(spark)
    reader = spark.readStream.format("snapshotstream").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_snapshotstream_tails_appends_exactly_once(spark, tmp_path):
    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snap.commit(spark.range(5).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(5, 8).withColumnRenamed("id", "v"), t)
    _stream_once(spark, t, out, ckpt)
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(8))
    # new commit: the SAME checkpoint picks up only the delta
    snap.commit(spark.range(8, 10).withColumnRenamed("id", "v"), t)
    _stream_once(spark, t, out, ckpt)
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(10))  # nothing re-emitted


def test_snapshotstream_starting_version_skips_history(spark, tmp_path):
    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snap.commit(spark.range(5).withColumnRenamed("id", "v"), t)
    snap.commit(spark.range(5, 8).withColumnRenamed("id", "v"), t)
    _stream_once(spark, t, out, ckpt, startingVersion="1")
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == [5, 6, 7]


def test_snapshotstream_rejects_overwrite_unless_opted_in(spark, tmp_path):
    import pytest as _pytest

    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snap.commit(spark.range(4).withColumnRenamed("id", "v"), t)
    snap.commit(
        spark.range(100, 103).withColumnRenamed("id", "v"),
        t,
        mode="overwrite",
    )
    with _pytest.raises(Exception, match="not\\s+an append|ignoreChanges"):
        _stream_once(spark, t, out, ckpt)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _stream_once(spark, t, out2, ckpt2, ignoreChanges="true")
    got = sorted(r.v for r in spark.read.parquet(out2).collect())
    # first commit's rows + the overwrite's added dir rows both stream
    assert got == [0, 1, 2, 3, 100, 101, 102]


def test_snapshotstream_skips_pure_dv_commits_when_opted_in(
    spark, tmp_path
):
    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snap.commit(spark.range(6).withColumnRenamed("id", "v"), t)
    snap.delete_where_dv(spark, t, "v = 2", key_col="v")
    snap.commit(spark.range(10, 12).withColumnRenamed("id", "v"), t)
    _stream_once(spark, t, out, ckpt, ignoreChanges="true")
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    # the append stream sees appended rows; the tombstone is a
    # documented non-event under ignoreChanges
    assert got == [0, 1, 2, 3, 4, 5, 10, 11]


def test_snapshotstream_bounded_trigger_and_restart(spark, tmp_path):
    """maxVersionsPerTrigger bounds catch-up batches; a restart from a
    checkpoint must not regress behind the committed frontier (the
    post-restart trigger takes a full catch-up batch by design)."""
    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for lo in range(0, 12, 3):
        snap.commit(
            spark.range(lo, lo + 3).withColumnRenamed("id", "v"), t
        )
    _stream_once(spark, t, out, ckpt, maxVersionsPerTrigger="1")
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(12))  # all versions drained, 1 per trigger
    # restart with new commits: same checkpoint, no duplicates
    snap.commit(spark.range(12, 15).withColumnRenamed("id", "v"), t)
    _stream_once(spark, t, out, ckpt, maxVersionsPerTrigger="1")
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(15))


def test_medallion_bronze_stream_silver_view(spark, tmp_path):
    """Medallion composition end-to-end: writers commit to a BRONZE
    snapshot table; a streaming tail (format('snapshotstream')) feeds
    an incrementally refreshed SILVER aggregate view (itself a
    snapshot table). Every layer is exactly-once; the silver state
    must equal a from-scratch aggregation of bronze after each sync,
    and bronze is never rescanned (the feed reads only new commits)."""
    from pyspark.sql import functions as F

    import mitoscape_spark.sources.snapshots as snap
    from mitoscape_spark.sources.snapshot_stream import register
    from mitoscape_spark.streaming.sinks import aggregate_refresh_committer

    register(spark)
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    def sync():
        q = (
            spark.readStream.format("snapshotstream")
            .option("path", bronze)
            .load()
            .writeStream.foreachBatch(
                aggregate_refresh_committer(silver, ["k"], "v")
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def silver_state():
        return {
            (r.k, r.sum_value, r.n)
            for r in snap.read(spark, silver).collect()
        }

    def bronze_scratch():
        return {
            (r.k, r.s, r.n)
            for r in snap.read(spark, bronze)
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    snap.commit(
        spark.range(6).selectExpr("id % 3 AS k", "id AS v"), bronze
    )
    sync()
    assert silver_state() == bronze_scratch()
    snap.commit(
        spark.range(6, 10).selectExpr("id % 3 AS k", "id AS v"), bronze
    )
    sync()
    assert silver_state() == bronze_scratch()
    # re-sync with nothing new: no-op, same silver version
    v = snap.latest_version(silver)
    sync()
    assert snap.latest_version(silver) == v


def test_snapshotstream_streams_evolved_columns(spark, tmp_path):
    """Columns added via allow_new_columns must appear in the stream
    (null-filled for pre-evolution files), not silently drop."""
    from pyspark.sql import functions as F

    import mitoscape_spark.sources.snapshots as snap

    t = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snap.commit(spark.range(3).withColumnRenamed("id", "v"), t)
    snap.commit(
        spark.range(10, 12)
        .withColumnRenamed("id", "v")
        .withColumn("tag", F.lit("new")),
        t,
        allow_new_columns=True,
    )
    _stream_once(spark, t, out, ckpt)
    rows = {r.v: r.tag for r in spark.read.parquet(out).collect()}
    assert rows == {0: None, 1: None, 2: None, 10: "new", 11: "new"}
