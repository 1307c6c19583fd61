"""Uniform multi-format table I/O: parquet / ORC / CSV / JSON.

The reference ingests tab-CSV (LD.scala:40-45) and plain text
(MTClassifierModel.scala:157-172); the engine generalizes to the full
set of Spark's built-in columnar + text formats behind one helper pair,
with explicit-schema reads as the default posture (schema inference is
a full extra pass over text formats — at 100 TB you declare, not infer;
SURVEY.md §1.2).

Format guidance encoded here: columnar (parquet/orc) for anything
queried repeatedly — predicate pushdown, column pruning, row-group
skipping; text (csv/json) only at ingest/egress boundaries. CSV/JSON
scans parallelize per file split; gzip'd text is non-splittable (one
task per file), so landing zones should prefer many medium files or
splittable compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TEXT_DEFAULTS = {
    "csv": {"header": "true"},
    "json": {},
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    **options: str,
) -> None:
    """Write ``df`` at ``path`` in any built-in format, optionally
    hive-partitioned (partition values become directory keys and prune
    at read time)."""
    w = df.write.mode(mode).format(fmt)
    for k, v in {**_TEXT_DEFAULTS.get(fmt, {}), **options}.items():
        w = w.option(k, v)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in any built-in format. Pass ``schema`` for text
    formats — inference costs a full extra scan and widens types."""
    r = spark.read.format(fmt)
    for k, v in {**_TEXT_DEFAULTS.get(fmt, {}), **options}.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
