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


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "json",
    corrupt_col: str = "_corrupt_record",
):
    """Ingest text data without letting bad records kill the job OR
    silently vanish: PERMISSIVE parse with a corrupt-record column,
    split into (clean_rows, quarantined_raw_lines).

    The 100 TB posture: a landing zone always contains malformed lines;
    FAILFAST aborts hours into a backfill, DROPMALFORMED silently
    loses data. Capturing the raw text of failed rows into a
    quarantine output keeps ingest total and auditable — count it,
    alert on it, reprocess it after the upstream fix.

    Returns (clean DataFrame in the declared schema, quarantine
    DataFrame of raw lines).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    full = StructType(
        [*schema.fields, StructField(corrupt_col, StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    df = getattr(reader, fmt)(path)
    # caching rule from the Spark docs: the corrupt-record split must
    # not re-trigger two divergent scans of a lazily parsed source
    df = df.cache()
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return clean, quarantine


def read_parquet_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: parquet files written at different times
    with added/removed columns resolve to the union schema
    (``mergeSchema``), missing fields null-filled.

    Costly footer merge at planning (reads every file's footer) — at
    100 TB prefer a declared evolved schema once known; this is the
    discovery/migration tool.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
