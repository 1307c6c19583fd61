"""Partitioned parquet layout — the data-layout half of the 100 TB
story (bucketing in sources.bucketed is the join half).

``write_partitioned`` lays data out hive-style (one directory per
partition value); reads that filter on the partition column never list,
open, or scan non-matching partitions (PartitionFilters in the plan,
asserted in tests/test_scale_ops.py). Choose LOW-cardinality columns
(date, lang, source) — one directory + ≥1 file per value; high-
cardinality keys belong in bucketing instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 512,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite ``path`` into files of roughly
    ``target_file_mb`` each. The 100 TB chronic disease this treats:
    streaming appends and over-parallel writes leave thousands of tiny
    files per partition; every downstream scan then pays listing +
    open + footer-parse per file, and the scheduler pays one task per
    file. Compaction is a full rewrite (no shuffle beyond a coalesce-
    style repartition), sized from the *actual on-disk bytes*.

    Returns the number of output files requested. Production notes:
    run per-partition (pass ``partition_cols`` to keep layout), write
    to a new path then swap — never in place over live readers.
    """
    import math

    sc = spark.sparkContext
    # on-disk size via Hadoop FS (works for local and HDFS-style URIs)
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    size_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)
    return n_files
