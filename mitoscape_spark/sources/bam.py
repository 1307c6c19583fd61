"""Alignment ingest (reference S1–S3: ADAM ``loadAlignments``,
``BamReader.scala:100-101, 172-173``; sink S7 ``saveAsSam``,
``MTClassify.scala:204``).

Engine-native path: alignment records as parquet with the explicit
schema below — scans prune/pushdown, and everything downstream is
columnar. This is the 100 TB path: BAM is a row-oriented, bgzf-blocked
format with no column projection; any serious deployment converts to
parquet once and queries many times.

Direct-BAM path: a pure-Python, *splittable* reader (no pysam). BGZF
block framing + a per-file record-boundary index pass (sources.bgzf /
sources.bamcodec) yield exact split bounds; each Spark task then
decodes only its byte range inside ``mapInPandas``. Parallelism is
per-split within files — the property that matters when single BAMs
are tens of GB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# the fields the reference consumes (Feature.scala:115-127 + MD parse)
ALIGNMENT_SCHEMA = T.StructType(
    [
        T.StructField("read_name", T.StringType(), False),
        T.StructField("chrom", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("mapq", T.IntegerType(), True),
        T.StructField("attributes", T.StringType(), True),
        T.StructField("seq", T.StringType(), True),
        T.StructField("md", T.StringType(), True),
        T.StructField("primary_alignment", T.BooleanType(), True),
        T.StructField("read_paired", T.BooleanType(), True),
        T.StructField("proper_pair", T.BooleanType(), True),
        T.StructField("mate_mapped", T.BooleanType(), True),
        T.StructField("supplementary", T.BooleanType(), True),
    ]
)


def read_alignments_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Native path: alignment parquet with the explicit schema (schema
    enforced so column pruning reaches the scan even on heterogeneous
    inputs)."""
    return spark.read.schema(ALIGNMENT_SCHEMA).parquet(path)


def plan_bam_splits(
    spark: SparkSession, paths: list[str], records_per_split: int = 10_000
) -> list[tuple[str, int, int]]:
    """Distributed split planning: one indexing task per file streams
    its BGZF blocks once and emits record-boundary virtual offsets at
    ``records_per_split`` spacing (sources.bamcodec). The collected
    plan is tiny (two longs per split) — the data itself never moves.
    """
    from pyspark.sql import functions as F  # noqa: F401

    files_df = spark.createDataFrame(
        [(p,) for p in paths], "bam_path: string"
    ).repartition(len(paths))

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mitoscape_spark.sources.bamcodec import index_record_voffsets

        for pdf in batches:
            for p in pdf["bam_path"]:
                checkpoints, end = index_record_voffsets(
                    p, every_n=records_per_split
                )
                bounds = checkpoints + [end]
                yield pd.DataFrame(
                    {
                        "bam_path": p,
                        "vstart": bounds[:-1],
                        "vend": bounds[1:],
                    }
                )

    plan = files_df.mapInPandas(
        index, "bam_path: string, vstart: long, vend: long"
    )
    return [(r.bam_path, r.vstart, r.vend) for r in plan.collect()]


def read_alignments_bam(
    spark: SparkSession,
    path: str | list[str],
    records_per_split: int = 10_000,
    batch_size: int = 10_000,
) -> DataFrame:
    """Splittable BAM scan, pure Python (no pysam): plan exact
    record-boundary splits per file (one indexing pass, distributed
    per-file), then decode each split in its own task via mapInPandas.

    Parallelism is per-split *within* files, not just per-file — the
    property that matters when single BAMs are tens of GB. The parquet
    path above remains the steady-state 100 TB answer (columnar,
    prunable); this is the ingest edge of that pipeline.
    """
    paths = [path] if isinstance(path, str) else list(path)
    splits = plan_bam_splits(spark, paths, records_per_split)
    splits_df = spark.createDataFrame(
        splits, "bam_path: string, vstart: long, vend: long"
    ).repartition(max(len(splits), 1))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mitoscape_spark.sources.bamcodec import decode_range

        for pdf in batches:
            for p, vs, ve in zip(
                pdf["bam_path"], pdf["vstart"], pdf["vend"]
            ):
                rows = []
                for rec in decode_range(p, int(vs), int(ve)):
                    rows.append(rec)
                    if len(rows) >= batch_size:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return splits_df.mapInPandas(scan, ALIGNMENT_SCHEMA)


def write_alignments_parquet(df: DataFrame, path: str) -> None:
    """Engine-native sink (reference writes single-file BAM; a pysam
    writer would foreachPartition — out of scope without pysam)."""
    df.write.mode("overwrite").parquet(path)
