"""Python **streaming sink** (Spark 4 ``DataSourceStreamWriter``) with a
two-phase commit protocol — the writer-side twin of the eventreplay
Python streaming source (sources/replay.py).

``df.writeStream.format("auditlog").option("path", dir)`` lands each
micro-batch as JSONL part files through the classic staging → publish
dance:

  write()  (executors)  each partition streams rows to
                        ``<path>/_staging/<uuid>.jsonl`` and returns the
                        staged file in its WriterCommitMessage; a task
                        retry re-stages under a fresh uuid, so half-
                        written files are never visible.
  commit() (driver)     renames the staged files of THIS attempt into
                        ``<path>/batch=<id>/part-N.jsonl`` and marks the
                        batch done with ``_commits/<id>``. A batch replay
                        after a crash re-publishes the same batch id over
                        its own directory first — idempotent, so the sink
                        is exactly-once at micro-batch granularity (the
                        same guarantee file sinks get from their log).
  abort()  (driver)     deletes this attempt's staged files.

``read_audit_log`` reads back ONLY committed batches (staging and
uncommitted batch dirs are invisible to readers) — readers never see a
torn batch.

Scale: each executor partition writes its own part file (no driver
funnel); commit is a per-batch O(#partitions) driver rename.

DEPLOYMENT ASSUMPTION: ``commit()`` runs on the driver and
``os.replace``s files that ``write()`` staged on executors, so driver
and executors must share one POSIX filesystem (local mode, or a shared
mount like NFS/EFS). On a cluster without a shared mount, stage to an
object store / DFS instead and make commit() a metadata operation
(rename or manifest write) against that store — the protocol is
unchanged, only the path layer differs. Spark's own file sink makes
the same assumption via Hadoop FileSystem paths; this sink keeps plain
``os`` calls for stdlib-only portability in this repo.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclasses.dataclass
class _StagedPart(WriterCommitMessage):
    staged_path: str
    n_rows: int


class _AuditLogStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("auditlog sink requires .option('path', ...)")

    def write(self, iterator: Iterator) -> _StagedPart:
        staging = os.path.join(self._path, "_staging")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str))
                f.write("\n")
                n += 1
        return _StagedPart(staged_path=part, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        batch_dir = os.path.join(self._path, f"batch={batchId}")
        marker = os.path.join(self._path, "_commits", str(batchId))
        # replayed batch (failure between publish and offset-log write):
        # re-publish over our own previous attempt — idempotent
        if os.path.isdir(batch_dir):
            shutil.rmtree(batch_dir)
        os.makedirs(batch_dir)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        for i, msg in enumerate(m for m in messages if m is not None):
            os.replace(
                msg.staged_path, os.path.join(batch_dir, f"part-{i}.jsonl")
            )
        with open(marker, "w") as f:
            json.dump(
                {
                    "batch_id": batchId,
                    "n_rows": sum(m.n_rows for m in messages if m),
                },
                f,
            )

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.staged_path):
                os.remove(msg.staged_path)


class AuditLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "auditlog"

    def schema(self) -> str:
        # sink-only source; schema comes from the written stream
        return "placeholder string"

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _AuditLogStreamWriter(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(AuditLogDataSource)


def read_audit_log(spark, path: str, schema: str | StructType):
    """Committed rows only: batch dirs without a _commits marker (crash
    mid-publish) are excluded."""
    commits_dir = os.path.join(path, "_commits")
    committed = (
        sorted(os.listdir(commits_dir)) if os.path.isdir(commits_dir) else []
    )
    files = []
    for b in committed:
        bdir = os.path.join(path, f"batch={b}")
        if os.path.isdir(bdir):
            files += [
                os.path.join(bdir, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".jsonl")
            ]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
