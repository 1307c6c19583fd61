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
