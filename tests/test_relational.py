"""t2 mirror: every declared query hash-matches its DuckDB oracle.

Runs at sf0.001 (fast inner loop); the driver runs the same contract at
sf0.01. mitoscape_spark.verify can be run standalone at any sf.
"""

from __future__ import annotations

import pytest

from mitoscape_spark.queries import ORACLE, QUERIES
from mitoscape_spark.verify import compare_query, duckdb_connection

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn = QUERIES[name]
    if name not in ORACLE:
        # non-SQL-expressible: rows-only smoke (driver does the same)
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0
        return
    res = compare_query(spark, con, name, fn, ORACLE[name], SF_SMOKE)
    assert res.spark_rows == res.oracle_rows, res
    assert res.cols_match, res
    assert res.hash_match, res


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "n_orders", "revenue"]


def test_verdict_history_sorts_rounds_numerically(tmp_path):
    """An unpadded CORRECTNESS_r10.json must supersede r2, not sort
    before it lexicographically (round-6 advice item 4)."""
    import json

    import __spark_entry__ as e

    (tmp_path / "CORRECTNESS_r2.json").write_text(
        json.dumps({"q": {"err": "boom", "rows_match": False}})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"q": {"err": None, "hash_match": True}})
    )
    latest = e._verdict_history(here=str(tmp_path))
    assert latest["q"][0] == 10
    assert latest["q"][1]["hash_match"] is True


def test_q13_interval_join_counts_subsecond_pairs(spark):
    """Round-12 precision pin: every corpus event carries sub-second
    precision and the oracle compares FULL timestamps, so two same-user
    events inside one truncated second are a valid pair (the old
    unix_timestamp seconds path dropped exactly one such pair at
    sf0.1), and the window edge is inclusive at exactly +1h, exclusive
    one microsecond past it."""
    import datetime as dt

    from mitoscape_spark.operators.intervals import point_interval_join
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 14, 10, 49, 26, 417201)
    rows = [
        (1, 7, base),
        # same truncated second, 59 ms later -> MUST pair with event 1
        (2, 7, base + dt.timedelta(microseconds=58870)),
        # exactly +1h from event 1 -> included (closed='right')
        (3, 7, base + dt.timedelta(hours=1)),
        # +1h and 1 microsecond from event 1 -> excluded
        (4, 7, base + dt.timedelta(hours=1, microseconds=1)),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)"
    intervals = events.selectExpr(
        "event_id", "user_id", f"{us} AS w_start",
        f"{us} + 3600000000 AS w_end",
    )
    points = events.selectExpr("user_id", f"{us} AS p_ts")
    joined = point_interval_join(
        points, intervals, point_col="p_ts", start_col="w_start",
        end_col="w_end", equi_keys=["user_id"],
        bucket_width=3600 * 1_000_000, closed="right",
    )
    got = {
        r["event_id"]: r["n"]
        for r in joined.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # event 1 sees events 2 and 3 (sub-second sibling + the exact-hour
    # edge), NOT event 4; event 2 sees 3 and 4; event 3 sees only 4.
    assert got == {1: 2, 2: 2, 3: 1}
