"""Structured Streaming smoke: parquet readStream → windowed/session
aggs → memory sink, checked against the equivalent batch plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table
from mitoscape_spark.operators.sessionize import sessionize
from mitoscape_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    session_counts,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_stream_matches_batch(spark):
    stream = events_stream(spark, SF)
    assert stream.isStreaming
    run_to_memory(windowed_counts(stream), "win_smoke")
    got = {
        (r.w_start, r.event_type): (r.n, r.v)
        for r in spark.sql("SELECT * FROM win_smoke").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "v",
        )
        .collect()
    )
    expected = {(r.w_start, r.event_type): (r.n, r.v) for r in batch}
    assert got == expected


def test_session_counts_stream_matches_batch_operator(spark):
    stream = events_stream(spark, SF)
    run_to_memory(session_counts(stream), "sess_smoke")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess_smoke").collect()
    }
    batch = sessionize(load_table(spark, SF, "events"), "5 minutes").collect()
    expected = {(r.user_id, r.session_start): r.n_events for r in batch}
    assert got == expected


def test_stateful_running_stats_across_batches(spark, tmp_path):
    import os

    from mitoscape_spark.streaming.stateful import running_user_stats

    events = load_table(spark, SF, "events").select("user_id", "ts", "value")
    # two files → two micro-batches (maxFilesPerTrigger=1): state must
    # carry across batches
    stream_dir = str(tmp_path / "stream")
    half = events.count() // 2
    first = events.limit(half)
    second = events.subtract(first)
    first.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    second.coalesce(1).write.parquet(os.path.join(stream_dir, "b1"))

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # memory sink in update mode appends every update; the LAST row per
    # user is the final state
    import pandas as pd  # noqa: F401

    updates = spark.sql("SELECT * FROM stateful_smoke").collect()
    final = {}
    for r in updates:  # appended in batch order
        prev = final.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            final[r.user_id] = (r.n_events, r.sum_value)
    batch = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    expected = {r.user_id: (r.n, r.s) for r in batch}
    assert {u: v[0] for u, v in final.items()} == {
        u: v[0] for u, v in expected.items()
    }
    for u in expected:
        assert final[u][1] == pytest.approx(expected[u][1], rel=1e-9)


def test_stream_static_enrichment(spark):
    from mitoscape_spark.streaming.windows import enrich_stream

    stream = events_stream(spark, SF)
    dim = (
        load_table(spark, SF, "events")
        .select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )
    enriched = enrich_stream(stream, dim).groupBy("segment").count()
    run_to_memory(enriched, "enrich_smoke")
    got = {r.segment: r["count"] for r in spark.sql("SELECT * FROM enrich_smoke").collect()}
    batch = (
        load_table(spark, SF, "events")
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
        .groupBy("segment").count().collect()
    )
    assert got == {r.segment: r["count"] for r in batch}


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    import os

    from mitoscape_spark.streaming.windows import dedup_stream

    events = load_table(spark, SF, "events").select("user_id", "ts", "value")
    doubled = events.unionAll(events)  # every row duplicated
    stream_dir = str(tmp_path / "dups")
    doubled.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = (
        dedup_stream(stream, ["user_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT COUNT(*) AS n FROM dedup_smoke").head()["n"]
    expected = events.dropDuplicates(["user_id", "ts"]).count()
    assert got == expected


def test_stream_stream_join_matches_batch(spark):
    from mitoscape_spark.streaming.windows import stream_stream_join

    got_df = stream_stream_join(
        events_stream(spark, SF), events_stream(spark, SF)
    )
    assert got_df.isStreaming
    run_to_memory(got_df, "ssj_smoke", output_mode="append")
    got = spark.sql("SELECT COUNT(*) AS n FROM ssj_smoke").head()["n"]
    e = load_table(spark, SF, "events")
    l = e.select(F.col("user_id").alias("k"), F.col("ts").alias("lt"))
    r = e.select(F.col("user_id").alias("k2"), F.col("ts").alias("rt"))
    batch = l.join(
        r,
        (F.col("k") == F.col("k2"))
        & (F.col("rt") > F.col("lt"))
        & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 5 MINUTES")),
    ).count()
    assert got == batch


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """Stop a checkpointed stream mid-source, add more data, restart
    with the same checkpoint: the sink must end exactly-once complete —
    every input row counted once, nothing reprocessed."""
    import os

    events = load_table(spark, SF, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    half = events.count() // 2
    first = events.limit(half)
    second = events.subtract(first)
    first.coalesce(1).write.parquet(os.path.join(src, "b0"))

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # processes first batch, commits offsets to checkpoint
    second.coalesce(1).write.parquet(os.path.join(src, "b1"))
    run_once()  # restart: must pick up ONLY b1
    got = spark.read.parquet(out).count()
    assert got == events.count()


def _has_protobuf() -> bool:
    """TWS's Python driver worker imports google.protobuf at start.

    Vendoring was investigated and ruled out (round-3 verdict #6):
    site-packages ships no protobuf distribution, installs are out of
    scope for this environment, and pyspark's generated
    ``sql/streaming/proto/StateMessage_pb2.py`` needs the full
    ``google.protobuf`` RUNTIME (descriptor/descriptor_pool/
    symbol_database/internal.builder + the wire-format serializer) —
    a shim satisfying the generated module would be a protobuf
    reimplementation, not a vendor. The processor logic stays covered
    engine-independently via fake state handles
    (test_tws_processor_logic_without_runner); this integration test
    runs wherever protobuf exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas runner requires google.protobuf "
    "(not installed in this container; operator code is API-complete, "
    "exercised wherever protobuf is present)",
)
def test_transform_with_state_across_batches(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: ValueState + ListState carry
    across micro-batches; final per-user count/sum equals the batch agg."""
    import os

    from mitoscape_spark.streaming.stateful import running_user_stats_tws

    events = load_table(spark, SF, "events").select("user_id", "ts", "value")
    stream_dir = str(tmp_path / "tws_stream")
    half = events.count() // 2
    first = events.limit(half)
    second = events.subtract(first)
    first.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    second.coalesce(1).write.parquet(os.path.join(stream_dir, "b1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_user_stats_tws(stream, recent_keep=3)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_smoke")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    updates = spark.sql("SELECT * FROM tws_smoke").collect()
    final = {}
    for r in updates:  # appended in batch order; highest count wins
        prev_r = final.get(r.user_id)
        if prev_r is None or r.n_events >= prev_r[0]:
            final[r.user_id] = (r.n_events, r.sum_value, r.recent)
    batch = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    expected = {r.user_id: (r.n, r.s) for r in batch}
    assert {u: v[0] for u, v in final.items()} == {
        u: v[0] for u, v in expected.items()
    }
    all_values = {
        u: {round(float(r.value), 6) for r in events.where(F.col("user_id") == u).collect()}
        for u in list(expected)[:3]
    }
    for u, (n, s, recent) in final.items():
        assert s == pytest.approx(expected[u][1], rel=1e-9)
        assert 1 <= len(recent) <= 3
        if u in all_values:
            assert {round(v, 6) for v in recent} <= all_values[u]


def test_dedup_within_watermark_collapses_jittered_retries(spark, tmp_path):
    """Same event_id re-emitted with a jittered ts must dedup to one
    row — dropDuplicates([key, ts]) would keep both copies."""
    import os

    from mitoscape_spark.streaming.windows import dedup_stream_within_watermark

    events = load_table(spark, SF, "events").select("event_id", "ts", "value")
    jittered = events.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")
    )
    doubled = events.unionAll(jittered)
    stream_dir = str(tmp_path / "jitter")
    doubled.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    stream = (
        spark.readStream.schema(doubled.schema)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = (
        dedup_stream_within_watermark(stream, ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ddww_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT COUNT(*) AS n FROM ddww_smoke").head()["n"]
    assert got == events.select("event_id").distinct().count()


def test_event_replay_python_streaming_source(spark):
    """Spark 4 Python streaming data source: a parquet snapshot replayed
    in fixed-size micro-batches must produce the same windowed rollup as
    the batch plan, across >1 micro-batch."""
    from mitoscape_spark.sources.replay import register

    register(spark)
    path = f"{SF}/events.parquet"
    stream = (
        spark.readStream.format("eventreplay")
        .option("path", path)
        .option("batchSize", 300)
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(
            F.col("window.start").alias("w_start"), "event_type", "n", "v"
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("replay_win")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert n_batches > 1, "replay must split the snapshot into micro-batches"
    got = {
        (r.w_start, r.event_type): (r.n, r.v)
        for r in spark.sql("SELECT * FROM replay_win").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n", "v")
        .collect()
    )
    expected = {(r.w_start, r.event_type): (r.n, r.v) for r in batch}
    assert got == expected


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart a checkpointed file-stream query: rows that arrived
    before the stop must not be reprocessed after restart — the parquet
    sink ends up with each input row exactly once."""
    import os

    events = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    first, second = (
        events.where(F.col("event_id") % 2 == 0),
        events.where(F.col("event_id") % 2 == 1),
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.parquet(os.path.join(src, "b0"))

    def run_until_caught_up():
        q = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_caught_up()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()
    second.coalesce(1).write.parquet(os.path.join(src, "b1"))
    run_until_caught_up()  # restart from the same checkpoint
    result = spark.read.parquet(out)
    assert result.count() == events.count()
    # each event_id exactly once — no replays, no losses
    assert result.groupBy("event_id").count().where("count > 1").count() == 0


def test_tws_processor_logic_without_runner():
    """RunningStatsProcessor semantics, engine-independent: the TWS
    Spark runner needs google.protobuf (absent in this container, and
    installing packages is out of scope), so the ValueState/ListState
    update logic is driven directly through fake state handles across
    three simulated micro-batches. The engine-integrated twin
    (test_transform_with_state below) runs wherever protobuf exists."""
    import pandas as pd

    from mitoscape_spark.streaming.stateful import RunningStatsProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeListState:
        def __init__(self):
            self._rows = None

        def exists(self):
            return self._rows is not None

        def get(self):
            return list(self._rows)

        def put(self, rows):
            self._rows = list(rows)

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl = ttlDurationMs
            return self.states.setdefault(name, FakeValueState())

        def getListState(self, name, schema):
            return self.states.setdefault(name, FakeListState())

    proc = RunningStatsProcessor(recent_keep=3, ttl_ms=60_000)
    handle = FakeHandle()
    proc.init(handle)
    assert handle.ttl == 60_000  # TTL plumbed through to the state var

    def feed(values):
        [out] = list(
            proc.handleInputRows(
                (7,), iter([pd.DataFrame({"value": values})]), None
            )
        )
        return out.iloc[0]

    r1 = feed([1.0, 2.0])
    assert (r1.n_events, r1.sum_value, r1.recent) == (2, 3.0, [1.0, 2.0])
    r2 = feed([10.0])
    assert (r2.n_events, r2.sum_value) == (3, 13.0)
    assert r2.recent == [1.0, 2.0, 10.0]
    r3 = feed([4.0, 5.0, 6.0, 7.0])  # recent window stays bounded at 3
    assert (r3.n_events, r3.sum_value) == (7, 35.0)
    assert r3.recent == [5.0, 6.0, 7.0]
    proc.close()


def test_event_replay_restart_from_checkpoint_no_duplicates(
    spark, tmp_path
):
    """Stop a checkpointed eventreplay query mid-replay, restart it from
    the same checkpoint: the restarted reader instance must resume at
    the checkpointed offset, not rewind to 0 — each snapshot row lands
    in the sink exactly once (the reader's admission-control cursor is
    instance state; restart-awareness comes from clamping to the
    engine's planned/committed offsets, sources/replay.py)."""
    import time

    from mitoscape_spark.sources.replay import register

    register(spark)
    path = f"{SF}/events.parquet"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    total = spark.read.parquet(path).count()

    def start_query():
        return (
            spark.readStream.format("eventreplay")
            .option("path", path)
            .option("batchSize", max(total // 6, 1))
            .load()
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    # phase 1: let a few micro-batches commit, then stop mid-replay
    q = start_query()
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            done = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(done) >= 2:
                break
            time.sleep(0.2)
        assert done, "no micro-batch completed before the stop"
    finally:
        q.stop()
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first, "phase 1 wrote nothing"

    # phase 2: restart from the same checkpoint, run to caught-up
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.read.parquet(out)
    assert result.count() == total
    # exactly once: no row replayed across the restart boundary
    assert (
        result.groupBy("event_id").count().where("count > 1").count() == 0
    )


def test_python_streaming_sink_two_phase_commit(spark, tmp_path):
    """auditlog sink: every input row lands exactly once across
    micro-batches; readers see only committed batches; staging is
    empty after the run."""
    import os

    from mitoscape_spark.sources.replay import register as reg_src
    from mitoscape_spark.streaming.pysink import (
        read_audit_log,
        register as reg_sink,
    )

    reg_src(spark)
    reg_sink(spark)
    out = str(tmp_path / "audit")
    stream = (
        spark.readStream.format("eventreplay")
        .option("path", f"{SF}/events.parquet")
        .option("batchSize", 400)
        .load()
        .select("event_id", "event_type", "value")
    )
    q = (
        stream.writeStream.format("auditlog")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_audit_log(
        spark, out, "event_id long, event_type string, value double"
    )
    events = load_table(spark, SF, "events")
    assert got.count() == events.count()
    assert got.groupBy("event_id").count().where("count > 1").count() == 0
    staged = os.listdir(os.path.join(out, "_staging"))
    assert staged == []
    n_batches = len(os.listdir(os.path.join(out, "_commits")))
    assert n_batches > 1


def test_incremental_available_now_processes_only_new_files(spark, tmp_path):
    """Two invocations over a growing landing zone: the second must
    process only the files added in between (no reprocessing, no loss)."""
    import os

    from mitoscape_spark.streaming.sinks import run_incremental

    events = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    a, b = (
        events.where(F.col("event_id") % 2 == 0),
        events.where(F.col("event_id") % 2 == 1),
    )
    src, out, ckpt = (
        str(tmp_path / "land"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    a.coalesce(1).write.parquet(os.path.join(src, "h0"))
    transform = lambda df: df.withColumn("v2", F.col("value") * 2)  # noqa: E731
    run_incremental(spark, src, events.schema, transform, out, ckpt)
    assert spark.read.parquet(out).count() == a.count()
    b.coalesce(1).write.parquet(os.path.join(src, "h1"))
    run_incremental(spark, src, events.schema, transform, out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == events.count()
    assert result.groupBy("event_id").count().where("count > 1").count() == 0


def test_event_replay_chunked_partitions(spark):
    """chunkrows < batchSize must split each micro-batch into several
    row-range partitions without losing or duplicating rows."""
    from mitoscape_spark.sources.replay import register

    register(spark)
    stream = (
        spark.readStream.format("eventreplay")
        .option("path", f"{SF}/events.parquet")
        .option("batchSize", 700)
        .option("chunkrows", 150)
        .load()
    )
    q = (
        stream.groupBy()
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("replay_chunks")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM replay_chunks").head()["count"]
    assert got == load_table(spark, SF, "events").count()


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    """leftOuter stream-stream join: an unmatched left row must emit
    null-padded — but only after BOTH sides' watermarks pass its join
    window. Two AvailableNow runs over one checkpoint: run 1 joins the
    matched row and holds the unmatched one in state; run 2's sentinel
    rows advance the watermarks and flush it."""
    import os

    from mitoscape_spark.streaming.windows import stream_stream_join

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, event_id long"

    def write_batch(path, rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(path, name)
        )

    t = "2024-01-01 10:{:02d}:00"
    import datetime as dt

    def ts(m):
        return dt.datetime(2024, 1, 1, 10 + m // 60, m % 60)

    write_batch(ldir, [(1, ts(0), 100), (2, ts(0), 200)], "b0")
    write_batch(rdir, [(1, ts(2), 300)], "b0")

    def run_once():
        l = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(ldir)
        )
        r = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(rdir)
        )
        joined = stream_stream_join(l, r, how="leftOuter")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # sentinels far in the future push both watermarks past 10:05
    write_batch(ldir, [(98, ts(120), 800)], "b1")
    write_batch(rdir, [(99, ts(120), 900)], "b1")
    run_once()

    rows = spark.read.parquet(out).collect()
    by_left = {r.l_event: r for r in rows}
    assert by_left[100].r_event == 300  # matched pair
    assert by_left[200].r_event is None  # unmatched left, null-padded
    assert by_left[200].r_ts is None
    # the late sentinel itself is still within its window: not emitted
    assert 800 not in by_left


def test_upsert_sink_read_failure_does_not_wipe_snapshot(spark, tmp_path):
    """A failing merge (schema drift) must PROPAGATE, not silently
    overwrite the snapshot with the bad batch's few rows."""
    import os

    import pytest as _pytest

    from mitoscape_spark.streaming.sinks import upsert_to_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    good = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, val string"
    )
    good.coalesce(1).write.parquet(os.path.join(src, "b0"))
    q = upsert_to_parquet(
        spark.readStream.schema(good.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        out,
        ckpt,
        keys=["k"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 2

    # schema-drifted batch: missing the 'val' column entirely
    bad = spark.createDataFrame([(9,)], "k long")
    bad.coalesce(1).write.parquet(os.path.join(src, "b1"))
    q2 = upsert_to_parquet(
        spark.readStream.schema(bad.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        out,
        str(tmp_path / "ckpt2"),
        keys=["k"],
    )
    with _pytest.raises(Exception):
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
    # original snapshot intact — NOT wiped down to the bad batch
    assert spark.read.parquet(out).count() == 2


def test_upsert_sink_order_col_picks_last_write(spark, tmp_path):
    import os

    from mitoscape_spark.streaming.sinks import upsert_to_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.createDataFrame(
        [(1, "old", 10), (1, "new", 20), (2, "only", 5)],
        "k long, val string, seq long",
    )
    batch.coalesce(1).write.parquet(os.path.join(src, "b0"))
    q = upsert_to_parquet(
        spark.readStream.schema(batch.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        out,
        ckpt,
        keys=["k"],
        order_col="seq",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.k: r.val for r in spark.read.parquet(out).collect()}
    assert got == {1: "new", 2: "only"}  # max seq wins, deterministic


def test_streaming_hot_keys_matches_batch_heavy_hitters(spark, tmp_path):
    import os

    from mitoscape_spark.operators.heavyhitters import exact_heavy_hitters
    from mitoscape_spark.streaming.stateful import streaming_hot_keys

    # keep event_id so the split preserves multiplicity (subtract on a
    # bare user_id projection would set-dedup the rows)
    events = load_table(spark, SF, "events").select("event_id", "user_id")
    stream_dir = str(tmp_path / "hotstream")
    half = events.count() // 2
    first = events.limit(half)
    second = events.subtract(first)  # user sets overlap across batches
    first.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    second.coalesce(1).write.parquet(os.path.join(stream_dir, "b1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = (
        streaming_hot_keys(stream, threshold=50, key_col="user_id")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hot_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    updates = spark.sql("SELECT * FROM hot_smoke").collect()
    final = {}
    for r in updates:  # appended in batch order; last update wins
        prev = final.get(r.key)
        if prev is None or r.n >= prev:
            final[r.key] = r.n
    want = {
        str(r.user_id): r.n
        for r in exact_heavy_hitters(events, ["user_id"], 50).collect()
    }
    assert final == want and want  # same hot set, exact lifetime counts
    # keys below threshold never surfaced
    assert all(n >= 50 for n in final.values())


def test_stream_dedup_pairs_service_exactly_once(spark, tmp_path):
    import os

    from mitoscape_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import (
        dedup_index_committer,
        stream_dedup_pairs,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    stream_dir = str(tmp_path / "docstream")
    first = docs.where(F.col("doc_id") < 250)
    second = docs.where(F.col("doc_id") >= 250)
    first.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    second.coalesce(1).write.parquet(os.path.join(stream_dir, "b1"))

    index_dir = str(tmp_path / "band_index")
    pairs_dir = str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = stream_dedup_pairs(
        stream, index_dir, pairs_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.doc_a, r.doc_b)
        for r in snap.read(spark, pairs_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert got == want and want  # streamed union == from-scratch pairs

    # replaying an already-committed batch_id is a no-op on BOTH tables
    v_idx = snap.latest_version(index_dir)
    v_pairs = snap.latest_version(pairs_dir)
    committer = dedup_index_committer(index_dir, pairs_dir)
    committer(second, 1)  # same batch_id as the stream's second batch
    assert snap.latest_version(index_dir) == v_idx
    assert snap.latest_version(pairs_dir) == v_pairs

    # crash-between-commits replay: wipe the pairs ledger entry by
    # simulating a fresh batch id on the pairs side only is not
    # possible without internals — instead verify the replay-safe pair
    # computation directly: recomputing batch 1's pairs against the
    # index that ALREADY contains batch 1's bands yields the same set
    from mitoscape_spark.operators.dedup import incremental_minhash_pairs

    full_index = snap.read(spark, index_dir)
    replay_pairs, _ = incremental_minhash_pairs(full_index, second)
    delta = {
        (r.doc_a, r.doc_b) for r in replay_pairs.collect()
    }
    old_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(minhash_signatures(first)).collect()
    }
    assert delta == want - old_pairs


def test_drift_monitor_committer_exactly_once_and_matches_batch(
    spark, tmp_path
):
    """Streaming drift monitor: per-batch PSI rows equal the batch
    drift_report against the frozen reference, and a replayed batch_id
    (Structured Streaming's at-least-once foreachBatch contract) must
    NOT append a duplicate report — the ledger skips it."""
    from mitoscape_spark.operators.drift import drift_report
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import drift_monitor_committer

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    monitor = str(tmp_path / "monitor")
    commit = drift_monitor_committer(docs, monitor, ["lang", "n_chars"])
    b0 = docs.where(F.col("doc_id") < 250)
    b1 = docs.where(F.col("doc_id") >= 250)
    commit(b0, 0)
    commit(b1, 1)
    commit(b0, 0)  # replay — must be a no-op
    rows = {
        (r.batch_id, r.col_name): r.psi
        for r in snap.read(spark, monitor).collect()
    }
    assert len(rows) == 4  # 2 batches x 2 cols, no duplicates
    want0 = {
        r.col_name: r.psi
        for r in drift_report(docs, b0, ["lang", "n_chars"]).collect()
    }
    assert rows[(0, "lang")] == want0["lang"]
    assert rows[(0, "n_chars")] == want0["n_chars"]


def test_forget_documents_removes_state_and_future_pairs(spark, tmp_path):
    """forget_documents between batches: the forgotten doc's bands and
    pairs vanish, the NEXT batch cannot pair against it, and the final
    accumulated pairs equal from-scratch MinHash over
    (batch0 \\ forgotten) ∪ batch1 — the exactness contract of the
    service survives a takedown."""
    from mitoscape_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
    )
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import (
        dedup_index_committer,
        forget_documents,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") < 250)
    b1 = docs.where(F.col("doc_id") >= 250)
    idx, prs = str(tmp_path / "idx"), str(tmp_path / "prs")
    commit = dedup_index_committer(idx, prs, max_bucket_size=None)
    commit(b0, 0)

    # forget a doc that actually participates in a batch-0 pair
    first_pair = snap.read(spark, prs).head()
    victim = int(first_pair.doc_a)
    stats = forget_documents(spark, idx, prs, [victim])
    assert stats["index_keys_deleted"] == 1
    assert stats["pair_rows_deleted"] >= 1
    assert (
        snap.read(spark, idx).where(F.col("doc_id") == victim).count() == 0
    )

    commit(b1, 1)
    got = {
        (r.doc_a, r.doc_b) for r in snap.read(spark, prs).collect()
    }
    survivors = docs.where(F.col("doc_id") != victim)
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(
            minhash_signatures(survivors)
        ).collect()
    }
    assert got == want and want
    assert all(victim not in p for p in got)


def test_forget_documents_embedding_service_twin(spark, tmp_path):
    """forget_documents parameterizes to the embedding service
    (index_key=vec_id, pair_cols=id_a/id_b): forgotten vectors leave
    the corpus via deletion vector, their pairs leave the pairs table,
    and the next batch's accumulated pairs equal from-scratch
    embedding_near_duplicates over the reduced corpus."""
    from mitoscape_spark.operators.dedup import embedding_near_duplicates
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import (
        embedding_dedup_committer,
        forget_documents,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    b0 = emb.where(F.col("vec_id") < 300)
    b1 = emb.where(F.col("vec_id") >= 300)
    cor, prs = str(tmp_path / "cor"), str(tmp_path / "prs")
    commit = embedding_dedup_committer(cor, prs, threshold=0.35)
    commit(b0, 0)

    victim = int(snap.read(spark, prs).head().id_a)
    stats = forget_documents(
        spark, cor, prs, [victim],
        pair_cols=("id_a", "id_b"), index_key="vec_id",
    )
    assert stats["index_keys_deleted"] == 1
    assert (
        snap.read(spark, cor).where(F.col("vec_id") == victim).count() == 0
    )

    commit(b1, 1)
    got = {
        (r.id_a, r.id_b) for r in snap.read(spark, prs).collect()
    }
    survivors = emb.where(F.col("vec_id") != victim)
    want = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            survivors, threshold=0.35
        ).collect()
    }
    assert got == want and want
    assert all(victim not in p for p in got)


def test_dedup_committer_crash_replay_converges_with_bucket_cap(
    spark, tmp_path
):
    """Round-3 advice: with max_bucket_size set, a crash between the
    index and pairs commits must still converge to the no-crash pair
    set. The committer now detects the batch's existing index commit
    and re-reads the corpus AS-OF the preceding version, so a corpus
    bucket that crosses the cap only WITH this batch's bands (10 > 8
    here) cannot collapse the replayed pairs to representative-only
    links."""
    from mitoscape_spark.operators.dedup import incremental_minhash_pairs
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import dedup_index_committer

    dup = "the quick brown fox jumps over the lazy dog again and again"

    def mk(ids, texts):
        return spark.createDataFrame(
            list(zip(ids, texts)), "doc_id long, text string"
        )

    # duplicate cluster spans the batches: 6 copies in batch 0 (under
    # the cap of 8), 4 more in batch 1 (combined 10 — over the cap)
    first = mk(range(6), [dup] * 6).unionByName(
        mk([50], ["a completely different unique document text"])
    )
    second = mk(range(100, 104), [dup] * 4).unionByName(
        mk([150], ["another unrelated singleton document here"])
    )
    cap = 8

    def run(base, crash):
        idx, prs = str(base / "idx"), str(base / "prs")
        committer = dedup_index_committer(idx, prs, max_bucket_size=cap)
        committer(first, 0)
        if crash:
            # simulate the crash point: batch 1's bands reach the
            # index, the pairs commit never happens
            corpus = snap.read(spark, idx)
            _, nb = incremental_minhash_pairs(
                corpus, second, max_bucket_size=cap
            )
            snap.commit(nb, idx, mode="append", meta={"batch_id": 1})
        committer(second, 1)  # first run, or the post-crash replay
        return (
            {(r.doc_a, r.doc_b) for r in snap.read(spark, prs).collect()},
            snap.latest_version(idx),
        )

    clean_pairs, v_clean = run(tmp_path / "clean", crash=False)
    crash_pairs, v_crash = run(tmp_path / "crash", crash=True)
    assert crash_pairs == clean_pairs and clean_pairs
    # replay must not double-commit the batch's bands either
    assert v_clean == v_crash == 2


def test_stream_embedding_dedup_service_exactly_once(spark, tmp_path):
    """Embedding twin of the LSH dedup service: streamed batches must
    produce exactly the from-scratch pair set, replays must be
    no-ops, and a crash between the corpus and pairs commits must
    converge to the no-crash tables (as-of replay)."""
    import os

    from mitoscape_spark.operators.dedup import (
        embedding_near_duplicates,
        incremental_embedding_pairs,
    )
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import (
        embedding_dedup_committer,
        stream_embedding_dedup_pairs,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    stream_dir = str(tmp_path / "vecstream")
    first = emb.where(F.col("vec_id") < 250)
    second = emb.where(F.col("vec_id") >= 250)
    first.coalesce(1).write.parquet(os.path.join(stream_dir, "b0"))
    second.coalesce(1).write.parquet(os.path.join(stream_dir, "b1"))

    corpus_dir = str(tmp_path / "corpus")
    pairs_dir = str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = stream_embedding_dedup_pairs(
        stream, corpus_dir, pairs_dir, str(tmp_path / "ckpt"),
        threshold=0.35,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.id_a, r.id_b) for r in snap.read(spark, pairs_dir).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(emb, threshold=0.35).collect()
    }
    assert got == want and want
    # replaying a committed batch_id is a no-op on both tables
    v_c, v_p = snap.latest_version(corpus_dir), snap.latest_version(pairs_dir)
    committer = embedding_dedup_committer(
        corpus_dir, pairs_dir, threshold=0.35
    )
    committer(second, 1)
    assert snap.latest_version(corpus_dir) == v_c
    assert snap.latest_version(pairs_dir) == v_p

    # crash between corpus and pairs commits: fresh dirs, manual
    # corpus-only commit of batch 1, then the replay must converge to
    # the same pair set
    c2, p2 = str(tmp_path / "c2"), str(tmp_path / "p2")
    committer2 = embedding_dedup_committer(c2, p2, threshold=0.35)
    committer2(first, 0)
    snap.commit(
        second.select("vec_id", "embedding"), c2, mode="append",
        meta={"batch_id": 1},
    )
    committer2(second, 1)  # replay
    crash_pairs = {
        (r.id_a, r.id_b) for r in snap.read(spark, p2).collect()
    }
    assert crash_pairs == want


def test_dedup_committer_replay_after_vacuum_fails_loudly(spark, tmp_path):
    """If the pre-commit index version a crash replay needs was
    vacuumed during the outage, the committer must RAISE — a silent
    fall-back to an empty corpus would commit a pair set missing
    every corpus-vs-batch pair (code-review finding, round 4)."""
    import pytest

    from mitoscape_spark.operators.dedup import incremental_minhash_pairs
    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming.sinks import dedup_index_committer

    def mk(ids):
        return spark.createDataFrame(
            [(i, f"document number {i} with words") for i in ids],
            "doc_id long, text string",
        )

    idx, prs = str(tmp_path / "idx"), str(tmp_path / "prs")
    committer = dedup_index_committer(idx, prs)
    committer(mk(range(5)), 0)
    # crash state: batch 1's bands committed, pairs not
    corpus = snap.read(spark, idx)
    _, nb = incremental_minhash_pairs(corpus, mk(range(10, 15)))
    snap.commit(nb, idx, mode="append", meta={"batch_id": 1})
    # outage-time retention: only the newest manifest survives
    snap.vacuum(idx, keep_versions=1, min_age_seconds=0)
    with pytest.raises(ValueError, match="not found"):
        committer(mk(range(10, 15)), 1)


def test_commit_ledger_retries_transient_race_then_raises(monkeypatch):
    """_commit_ledger must RETRY a transient history() race and return
    the real ledger once the read succeeds — returning set() on the
    race made an already-committed batch look uncommitted (round-4
    advice). A persistent failure still propagates after bounded
    retries."""
    import pytest

    from mitoscape_spark.sources import snapshots as snap
    from mitoscape_spark.streaming import sinks

    calls = {"n": 0}

    def flaky_history(table_dir):
        calls["n"] += 1
        if calls["n"] < 3:
            raise FileNotFoundError("manifest vanished mid-read")
        return [{"meta": {"batch_id": 7}}]

    monkeypatch.setattr(snap, "history", flaky_history)
    assert sinks._commit_ledger("/nonexistent") == {7}
    assert calls["n"] == 3

    def always_fails(table_dir):
        raise ValueError("version probe race")

    monkeypatch.setattr(snap, "history", always_fails)
    with pytest.raises(ValueError, match="version probe race"):
        sinks._commit_ledger("/nonexistent")
