"""Snapshot tables as a Spark 4 Python STREAMING data source — stream
new commits as micro-batches (the table→stream half of the lakehouse
loop; `streaming/sinks.py::append_stream_to_snapshot` is stream→table).

``spark.readStream.format("snapshotstream").option("path", table_dir)
.load()`` tails the table's manifest log: each micro-batch covers a
contiguous VERSION RANGE and reads only the data directories those
commits ADDED. Downstream plans see exactly the appended rows — an
incremental consumer with no bookkeeping of its own (the streaming
twin of ``snapshots.table_changes``, restricted to append deltas).

Offset model: ``{"version": v}`` — the manifest log IS the offset log,
so restart safety is structural: ``latestOffset`` reads the durable
manifest directory (no instance-state cursor to regress, unlike a
synthetic replay source), and a re-planned batch over (s, e] always
resolves to the same directory list because manifests are immutable.

Non-append commits: an overwrite/compaction/DV commit rewrites or
tombstones history a pure append stream can't express. Default is to
FAIL LOUDLY at that version; ``.option("ignoreChanges", "true")``
streams just the commit's added directories (so a compaction re-emits
rows it rewrote — the same documented contract as Delta's
ignoreChanges) and skips pure-tombstone commits entirely.

Scale: one partition per parquet file of the added dirs (normal
file-level parallelism); the per-trigger admission knob
``maxVersionsPerTrigger`` bounds catch-up batches after downtime.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from mitoscape_spark.sources import snapshots as snap


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _added_dirs(table_dir: str, version: int) -> tuple[list[str], str]:
    """(directories added by ``version``, commit mode)."""
    m = snap._load_manifest(table_dir, version)
    parent = m.get("parent", version - 1)
    prev = (
        set(snap._load_manifest(table_dir, parent)["dirs"])
        if parent > 0
        else set()
    )
    return sorted(set(m["dirs"]) - prev), m.get("mode", "append")


def _is_pure_dv(table_dir: str, version: int) -> bool:
    m = snap._load_manifest(table_dir, version)
    parent = m.get("parent", version - 1)
    if parent <= 0:
        return False
    p = snap._load_manifest(table_dir, parent)
    return m["dirs"] == p["dirs"] and m.get("dvs", []) != p.get("dvs", [])


def _spark_to_arrow(spark_type):
    """Spark → Arrow type for null-filled evolved columns (same
    4-type surface as replay._arrow_schema_to_spark)."""
    import pyarrow as pa
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        TimestampType,
    )

    if isinstance(spark_type, TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(spark_type, LongType):
        return pa.int64()
    if isinstance(spark_type, DoubleType):
        return pa.float64()
    if isinstance(spark_type, StringType):
        return pa.string()
    raise TypeError(f"snapshotstream: unsupported type {spark_type}")


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._table = options.get("path")
        if not self._table:
            raise ValueError("snapshotstream requires .option('path', ...)")
        self._start = int(options.get("startingversion", 0))
        self._max_versions = int(options.get("maxversionspertrigger", 0))
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._names = schema.fieldNames()
        self._types = {f.name: f.dataType for f in schema.fields}

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = snap.latest_version(self._table)
        # Admission control only once we've SEEN an engine offset
        # (partitions/commit set the frontier). On restart this reader
        # is a fresh instance and the engine's committed offset is
        # unknown until it calls us — capping against instance state
        # here would emit an offset BEHIND the committed frontier (the
        # replay-source restart bug class; see sources/replay.py).
        # First post-restart trigger therefore takes the full
        # catch-up batch; subsequent triggers are bounded.
        frontier = getattr(self, "_last_end", None)
        if self._max_versions > 0 and frontier is not None:
            latest = min(latest, frontier + self._max_versions)
        self._last_end = max(frontier or 0, latest)
        return {"version": latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = start["version"], end["version"]
        self._last_end = max(getattr(self, "_last_end", 0), e)
        files: list[str] = []
        for v in range(s + 1, e + 1):
            added, mode = _added_dirs(self._table, v)
            if mode != "append" and not self._ignore_changes:
                raise ValueError(
                    f"snapshotstream: version {v} is mode={mode!r} — not "
                    "an append; restart from a newer startingVersion or "
                    "set .option('ignoreChanges','true') to stream only "
                    "its added files (rewritten rows will re-emit)"
                )
            if _is_pure_dv(self._table, v):
                if self._ignore_changes:
                    continue
                raise ValueError(
                    f"snapshotstream: version {v} is a deletion-vector "
                    "commit; appends-only streaming cannot express "
                    "deletes (set ignoreChanges to skip them)"
                )
            for d in added:
                full = os.path.join(self._table, d)
                files.extend(
                    os.path.join(full, f)
                    for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")
                )
        if not files:
            return [_FilePartition("")]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator:
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mitoscape_spark.sources.replay import _normalize_batch

        pf = pq.ParquetFile(partition.path)
        present = set(pf.schema_arrow.names)
        # schema evolution: files written before an allow_new_columns
        # append lack the evolved columns — read what exists, null-fill
        # the rest (the same contract as batch merge_schema reads)
        want = [c for c in self._names if c in present]
        tbl = pq.read_table(partition.path, columns=want)
        missing = [c for c in self._names if c not in present]
        if missing:
            n = tbl.num_rows
            for c in missing:
                pa_type = _spark_to_arrow(self._types[c])
                tbl = tbl.append_column(
                    c, pa.nulls(n, type=pa_type)
                )
        for batch in tbl.to_batches():
            if batch.num_rows:
                yield _normalize_batch(batch, self._names)

    def commit(self, end: dict) -> None:
        # committed offsets are a floor for future admission windows
        self._last_end = max(
            getattr(self, "_last_end", 0) or 0, end["version"]
        )

    def stop(self) -> None:
        pass


class SnapshotStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshotstream"

    def schema(self) -> StructType | str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mitoscape_spark.sources.replay import _arrow_schema_to_spark

        table_dir = self.options["path"]
        v = snap.latest_version(table_dir)
        if v == 0:
            raise ValueError(
                f"snapshot table {table_dir} has no commits to infer "
                "a schema from"
            )
        dirs = snap._load_manifest(table_dir, v)["dirs"]
        # MERGE footer schemas across directories: after an
        # allow_new_columns append, only newer dirs carry the evolved
        # columns — taking one (oldest) footer would silently drop
        # them from every streamed row. One footer per dir, KB of I/O.
        schemas = []
        for d in dirs:
            full = os.path.join(table_dir, d)
            for f in sorted(os.listdir(full)):
                if f.endswith(".parquet"):
                    schemas.append(
                        pq.ParquetFile(
                            os.path.join(full, f)
                        ).schema_arrow
                    )
                    break
        if not schemas:
            raise ValueError(
                f"snapshot table {table_dir} has no data files"
            )
        return _arrow_schema_to_spark(
            pa.unify_schemas(schemas, promote_options="permissive")
        )

    def streamReader(self, schema: StructType) -> _SnapshotStreamReader:
        return _SnapshotStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Register the format (and pin the active session — same
    pinned-thread caveat as sources/snapshot_datasource.register)."""
    try:
        spark.dataSource.register(SnapshotStreamDataSource)
    except Exception as exc:  # noqa: BLE001
        if "already" not in str(exc).lower():
            raise
    jvm_session = getattr(spark, "_jsparkSession", None)
    if jvm_session is not None:
        jvm_session.setActiveSession(jvm_session)
