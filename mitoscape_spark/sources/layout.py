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
