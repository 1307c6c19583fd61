"""`format("snapshot")` — the snapshot table layer as a REAL Spark
data source (Spark 4 Python DataSource API, batch reader + writer).

This completes the engine's Python DataSource surface (streaming
reader: sources/replay.py; streaming writer: streaming/pysink.py) and
turns sources/snapshots.py from a helper library into a format any
Spark user can address declaratively:

    df.write.format("snapshot").mode("append").save(table_dir)
    spark.read.format("snapshot").option("version", 3).load(table_dir)

Reader: one InputPartition per parquet data FILE of the resolved
manifest version (intra-directory parallelism), each read as Arrow
RecordBatches via pyarrow — zero row-by-row Python. Writer: executors
write Arrow batches to parquet files in an UNPUBLISHED staging
directory (DataSourceArrowWriter); the driver-side commit() publishes
them with ONE atomic snapshot commit — so `format("snapshot")` writes
inherit the transaction layer's guarantees (atomic visibility, time
travel, vacuum-able aborts) without any sink-specific state.

Scale notes: partitions are per-file so a large snapshot reads with
full parallelism; the writer's staged files become the commit's data
directory as-is (a rename-level publish, no rewrite). Abort leaves
only an unpublished directory — reclaimed by snapshots.vacuum, same
crash story as every other writer of the format.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from mitoscape_spark.sources import snapshots as snap


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _StagedFile(WriterCommitMessage):
    rel_path: str
    n_rows: int


def _data_files(table_dir: str, version: int | None) -> list[str]:
    v = snap.latest_version(table_dir) if version is None else version
    if v == 0:
        raise ValueError(f"snapshot table {table_dir} has no commits")
    manifest = snap._load_manifest(table_dir, v)
    if manifest.get("dvs"):
        # refusing beats silently resurrecting deleted rows: this
        # reader maps files to partitions 1:1 and has no join stage to
        # apply tombstones in. compact() clears the vectors.
        raise ValueError(
            f"snapshot table {table_dir} v{v} carries deletion vectors; "
            "read via sources.snapshots.read (anti-joins them) or "
            "compact() first"
        )
    files: list[str] = []
    for d in manifest["dirs"]:
        full = os.path.join(table_dir, d)
        files.extend(
            os.path.join(full, f)
            for f in sorted(os.listdir(full))
            if f.endswith(".parquet")
        )
    return files


class _SnapshotReader(DataSourceReader):
    def __init__(self, options: dict):
        self.table_dir = options["path"]
        v = options.get("version")
        self.version = int(v) if v is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _FilePartition(p)
            for p in _data_files(self.table_dir, self.version)
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        for batch in pq.ParquetFile(partition.path).iter_batches():
            yield batch


class _SnapshotWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.table_dir = options["path"]
        self.overwrite = overwrite
        # staged (unpublished) data directory, named like every other
        # commit's — publish is just writing the manifest
        self.rel_dir = os.path.join("data", uuid.uuid4().hex)

    def write(self, iterator: Iterator) -> _StagedFile:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        staging = os.path.join(self.table_dir, self.rel_dir)
        os.makedirs(staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        rel = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet"
        out = os.path.join(staging, rel)
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_table(pa.Table.from_batches([batch]))
            n += batch.num_rows
        if writer is not None:
            writer.close()
            return _StagedFile(rel, n)
        return _StagedFile("", 0)

    def commit(self, messages: list) -> None:
        """Driver-side atomic publish: the staged directory becomes a
        manifest version through the SAME optimistic-concurrency path
        as snapshots.commit (shared-filesystem assumption as
        documented in sources/snapshots.py)."""
        n_rows = sum(m.n_rows for m in messages if m and m.rel_path)
        snap._publish_dir(
            self.table_dir,
            self.rel_dir,
            mode="overwrite" if self.overwrite else "append",
            meta={"writer": "python-datasource", "n_rows": n_rows},
        )

    def abort(self, messages: list) -> None:
        import shutil

        shutil.rmtree(
            os.path.join(self.table_dir, self.rel_dir), ignore_errors=True
        )


class SnapshotTableDataSource(DataSource):
    """spark.read/write.format("snapshot") over a snapshot table dir."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self) -> StructType | str:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _data_files(
            self.options["path"],
            int(self.options["version"])
            if self.options.get("version") is not None
            else None,
        )
        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema: StructType) -> _SnapshotReader:
        return _SnapshotReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> _SnapshotWriter:
        return _SnapshotWriter(self.options, overwrite)


def register(spark) -> None:
    """Register the format on ``spark`` AND pin the session as the
    calling JVM thread's active session. The pinning matters under
    pinned-thread mode: a Python worker thread maps to a fresh JVM
    thread with NO active session, and Python data-source lookup
    resolves through the active session's registry — without this,
    ``format("snapshot")`` raises DATA_SOURCE_NOT_FOUND from any
    thread but the main one (measured; see tests)."""
    try:
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except Exception:  # Spark Connect: no _jvm, and no pinned threads
        pass
    spark.dataSource.register(SnapshotTableDataSource)
