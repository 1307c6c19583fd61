"""Parquet footer introspection (sources/inspect.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mitoscape_spark.sources.inspect import pruning_fraction, rowgroup_stats


def test_rowgroup_stats_reports_footer_minmax(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 1000).withColumnRenamed("id", "k").coalesce(
        1
    ).write.parquet(path)
    rows = rowgroup_stats(spark, path, cols=["k"]).collect()
    assert len(rows) >= 1
    r = rows[0]
    assert (int(r["min_val"]), int(r["max_val"])) == (0, 999)
    assert r["null_count"] == 0
    assert sum(x["n_rows"] for x in rows) == 1000


def test_pruning_fraction_sorted_vs_random(spark, tmp_path):
    """A range-sorted layout must be far more skippable than a
    hash-scattered one for the same predicate."""
    df = spark.range(0, 50_000).withColumnRenamed("id", "k")
    sorted_path = str(tmp_path / "sorted")
    random_path = str(tmp_path / "random")
    df.repartitionByRange(10, "k").sortWithinPartitions("k").write.parquet(
        sorted_path
    )
    df.withColumn("h", F.pmod(F.hash("k"), 10)).repartition(
        10, "h"
    ).drop("h").write.parquet(random_path)

    good = pruning_fraction(spark, sorted_path, "k", 1000, 2000)
    bad = pruning_fraction(spark, random_path, "k", 1000, 2000)
    assert good >= 0.8  # ~9 of 10 files provably disjoint
    assert bad == 0.0  # every scattered file spans the whole range


def test_aggregate_pushdown_reads_footers_only(spark, tmp_path):
    """Inside v2_aggregate_pushdown, MIN/MAX/COUNT plans must show
    PushedAggregation (footer-only scan) and match the normal answer."""
    import contextlib
    import io

    from mitoscape_spark.sources.inspect import v2_aggregate_pushdown

    path = str(tmp_path / "t")
    spark.range(0, 10_000).withColumnRenamed("id", "k").write.parquet(path)
    normal = spark.read.parquet(path).selectExpr(
        "min(k) as lo", "max(k) as hi", "count(*) as n"
    ).head()
    with v2_aggregate_pushdown(spark):
        agg = spark.read.parquet(path).selectExpr(
            "min(k) as lo", "max(k) as hi", "count(*) as n"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("formatted")
        assert "PushedAggregation" in buf.getvalue()
        pushed = agg.head()
    assert pushed == normal
    # conf restored on exit
    assert "parquet" in spark.conf.get("spark.sql.sources.useV1SourceList")
