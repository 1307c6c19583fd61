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
