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
