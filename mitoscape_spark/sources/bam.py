"""Alignment ingest (reference S1–S3: ADAM ``loadAlignments``,
``BamReader.scala:100-101, 172-173``; sink S7 ``saveAsSam``,
``MTClassify.scala:204``).

Engine-native path: alignment records as parquet with the explicit
schema below — scans prune/pushdown, and everything downstream is
columnar. This is the 100 TB path: BAM is a row-oriented, bgzf-blocked
format with no column projection; any serious deployment converts to
parquet once and queries many times.

Compatibility path: read actual BAM via pysam inside ``mapInPandas``
(one file split per task). pysam is not installed in this container,
so the reader is import-gated; the plumbing (schema, batching,
partition-by-file-split) is real and unit-tested against the parquet
path which shares the same record layout.
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


def _require_pysam():
    try:
        import pysam  # noqa: F401

        return pysam
    except ImportError as exc:  # pragma: no cover - not in container
        raise NotImplementedError(
            "BAM ingest needs pysam, which is not installed in this "
            "environment. Convert BAM→parquet offline (schema: "
            "sources.bam.ALIGNMENT_SCHEMA) or install pysam."
        ) from exc


def read_alignments_bam(
    spark: SparkSession, path: str, batch_size: int = 10_000
) -> DataFrame:
    """BAM path via pysam in mapInPandas (one task per file for now;
    bgzf chunk splitting is a documented extension).

    Raises NotImplementedError without pysam — the parquet path above
    is the engine-native ingest.
    """
    _require_pysam()

    files_df = spark.createDataFrame([(path,)], ["bam_path"])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pysam

        for pdf in batches:
            for bam_path in pdf["bam_path"]:
                with pysam.AlignmentFile(bam_path, "rb") as bam:
                    rows = []
                    for rec in bam:
                        rows.append(
                            {
                                "read_name": rec.query_name,
                                "chrom": rec.reference_name,
                                "start": (rec.reference_start or 0) + 1,
                                "mapq": rec.mapping_quality,
                                "attributes": " ".join(
                                    f"{t}:i:{v}"
                                    for t, v in rec.get_tags()
                                    if isinstance(v, int)
                                ),
                                "seq": rec.query_sequence,
                                "md": (
                                    rec.get_tag("MD")
                                    if rec.has_tag("MD")
                                    else None
                                ),
                                "primary_alignment": not rec.is_secondary,
                                "read_paired": rec.is_paired,
                                "proper_pair": rec.is_proper_pair,
                                "mate_mapped": not rec.mate_is_unmapped,
                                "supplementary": rec.is_supplementary,
                            }
                        )
                        if len(rows) >= batch_size:
                            yield pd.DataFrame(rows)
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows)

    return files_df.mapInPandas(scan, ALIGNMENT_SCHEMA)


def write_alignments_parquet(df: DataFrame, path: str) -> None:
    """Engine-native sink (reference writes single-file BAM; a pysam
    writer would foreachPartition — out of scope without pysam)."""
    df.write.mode("overwrite").parquet(path)
