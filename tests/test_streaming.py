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
