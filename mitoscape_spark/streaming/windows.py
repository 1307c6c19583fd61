"""Structured Streaming over the events table (extension E06 — the
reference is strictly batch, SURVEY.md §2.7).

Streaming plans mirror the batch operators (operators.sessionize) so a
batch backfill and the live stream produce the same rollups:
tumbling/sliding windows + session windows with watermarked late-data
handling. Local smoke: parquet readStream → memory sink →
processAllAvailable() drives the batch of files through the streaming
engine synchronously.

Scale: watermarks bound state (old windows evict); session-window state
is per (user, open-session) — keyed state scales with active users, not
history. Sinks should be idempotent (foreachBatch + MERGE) on a real
deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table


_STREAM_DIRS: dict[str, str] = {}


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the events parquet (schema pinned from the batch
    table; ns→µs ts conversion matches catalog.load_table)."""
    import os
    import tempfile

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source ingests directories; sf_dir holds every
    # table's parquet, so expose the events file alone through a
    # symlink dir (a real deployment lands stream files in their own
    # directory to begin with). One CACHED dir per sf_dir — repeated
    # calls otherwise leak a /tmp dir each — and an ABSOLUTE target
    # (a relative sf_dir would resolve against /tmp and dangle).
    target = os.path.abspath(f"{sf_dir}/events.parquet")
    stream_dir = _STREAM_DIRS.get(target)
    if stream_dir is None or not os.path.isdir(stream_dir):
        stream_dir = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(
            target, os.path.join(stream_dir, "events.parquet")
        )
        _STREAM_DIRS[target] = stream_dir
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )
    # mirror catalog's nanos→µs normalization when ts arrives as long
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    # watermarks require TIMESTAMP (with local tz); parquet written by
    # pyarrow lands as TIMESTAMP_NTZ, which EventTimeWatermark rejects
    if dict(stream.dtypes)["ts"] == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.select(batch.columns)


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if slide given) event-time window counts
    per event_type with late-data watermark."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type",
            "n",
            "v",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming session windows (same semantics as
    operators.sessionize.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregation to completion against the current
    file set (local smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich the event stream with a broadcast
    dimension snapshot — each micro-batch joins against the static side
    (re-read per batch for file-based dims), no state involved."""
    return events.join(F.broadcast(dim), on=on, how="left")


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicates keyed on ``keys`` with
    watermark-bounded state — duplicate keys older than the watermark
    are evicted from the state store, so memory tracks the dedup window,
    not the whole stream history. The streaming twin of
    operators.dedup.exact_dedup."""
    if dict(events.dtypes)[watermark_col] == "timestamp_ntz":
        events = events.withColumn(
            watermark_col, F.col(watermark_col).cast("timestamp")
        )
    return events.withWatermark(watermark_col, watermark).dropDuplicates(
        [*keys, watermark_col]
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup on business keys alone (no event-time column in
    the key): ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival
    of each key and guarantees suppression of duplicates arriving
    within the watermark delay of it — the right tool when upstream
    retries re-emit the same record with a *jittered* timestamp, where
    ``dropDuplicates([key, ts])`` would pass both copies through.
    State per key is evicted once the watermark passes its first-seen
    event time, so memory tracks the dedup horizon, not history."""
    if dict(events.dtypes)[watermark_col] == "timestamp_ntz":
        events = events.withColumn(
            watermark_col, F.col(watermark_col).cast("timestamp")
        )
    return events.withWatermark(
        watermark_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    within: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right-side events joined to left-side
    events of the same key within ``(lt, lt + within]`` event time.

    Both sides carry watermarks and the join has a time-range
    constraint — that pair is what lets the state store evict rows
    older than (watermark + range), so state is bounded by the join
    window, not stream history.

    ``how='leftOuter'`` emits unmatched left rows null-padded — but
    only once the watermark passes their join window (the engine can't
    declare "no match will come" earlier); downstreams must expect
    that delay. The same watermark+range bound applies, so outer state
    is no larger than inner state.
    """
    def _ts(side: DataFrame) -> DataFrame:
        # same ntz guard as the dedup helpers: EventTimeWatermark
        # rejects TIMESTAMP_NTZ (pyarrow-written parquet default)
        if dict(side.dtypes)["ts"] == "timestamp_ntz":
            side = side.withColumn("ts", F.col("ts").cast("timestamp"))
        return side

    l = _ts(left).select(
        F.col(on).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    ).withWatermark("l_ts", watermark)
    r = _ts(right).select(
        F.col(on).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    ).withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        how,
    )
