"""Bucketed tables — shuffle-free co-located joins (brief:
"repartition()/bucketing for co-located joins").

Spark bucketing hashes rows into a fixed number of buckets at WRITE
time (``bucketBy`` + ``saveAsTable``); a join between two tables
bucketed on the join key with the same bucket count needs **no
exchange** on either side — the single biggest shuffle eliminated in a
repeated-join workload (fact ⋈ fact on read_name / doc_id).

At 100 TB: bucket the alignment/document tables once at ingest on
their join key; every downstream join/groupBy on that key is then
exchange-free. Pair with ``sortWithinPartitions`` on the key so
sort-merge joins skip their sort too.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Robust to a stale managed-table location left by a previous
    process: a fresh metastore does not know the table, so
    ``mode("overwrite")`` alone raises LOCATION_ALREADY_EXISTS — drop
    the table and remove the orphaned directory first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    stale = os.path.join(warehouse, table)
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — the plan
    must contain no Exchange (asserted in tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=key)
