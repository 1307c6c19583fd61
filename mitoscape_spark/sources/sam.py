"""SAM-text alignment ingest as a Spark 4 **Python data source**
(reference S1–S3 read BAM through JVM ADAM, ``BamReader.scala:100-101,
172-173``; SURVEY.md §4.2 flags the Python data source API as the
DataSourceV2-equivalent path).

``spark.read.format("samtext").load(path)`` yields rows in
``sources.bam.ALIGNMENT_SCHEMA`` — no pysam, no JVM extension: SAM is
a tab-separated text format, and the flag word decodes with integer
bit tests. One input partition per file (``path`` may be a file or a
directory of ``.sam`` files); at scale, shard files upstream the way
BAM ingest shards by bgzf block.

Field mapping (SAM spec v1.6):
  col 1 QNAME → read_name     col 3 RNAME → chrom
  col 4 POS   → start (1-based)  col 5 MAPQ → mapq
  col 10 SEQ  → seq           cols 12+ tags → attributes (verbatim),
  MD:Z:* → md
  FLAG bits: 0x1 paired, 0x2 proper_pair, 0x8 mate unmapped,
  0x100 secondary, 0x800 supplementary.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from mitoscape_spark.sources.bam import ALIGNMENT_SCHEMA


class _SamFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _parse_sam_line(line: str) -> tuple | None:
    if not line or line.startswith("@"):
        return None
    cols = line.rstrip("\n").split("\t")
    if len(cols) < 11:
        return None
    flag = int(cols[1])
    tags = cols[11:]
    md = None
    for t in tags:
        if t.startswith("MD:Z:"):
            md = t[5:]
            break
    return (
        cols[0],                      # read_name
        None if cols[2] == "*" else cols[2],  # chrom
        int(cols[3]),                 # start (1-based; 0 = unmapped)
        int(cols[4]),                 # mapq
        " ".join(tags),               # attributes
        None if cols[9] == "*" else cols[9],  # seq
        md,                           # md
        not (flag & 0x100),           # primary_alignment
        bool(flag & 0x1),             # read_paired
        bool(flag & 0x2),             # proper_pair
        not (flag & 0x8),             # mate_mapped
        bool(flag & 0x800),           # supplementary
    )


class SamTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("samtext: path is required")

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".sam")
            )
        else:
            files = [self.path]
        if not files:
            raise FileNotFoundError(f"no .sam files under {self.path}")
        return [_SamFilePartition(f) for f in files]

    def read(self, partition: _SamFilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                row = _parse_sam_line(line)
                if row is not None:
                    yield row


class SamTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "samtext"

    def schema(self) -> StructType:
        return ALIGNMENT_SCHEMA

    def reader(self, schema: StructType) -> SamTextReader:
        return SamTextReader(self.options)


def register_sam_source(spark) -> None:
    """Make ``spark.read.format('samtext')`` available on this session."""
    spark.dataSource.register(SamTextDataSource)
