"""Snapshot tables: versioned parquet with atomic commits and
time travel (a minimal lakehouse transaction layer, stdlib + Spark).

The pattern every serious 100 TB deployment needs and plain parquet
directories lack: writers publish IMMUTABLE data files, then make them
visible with one atomic manifest commit; readers resolve a manifest
version to a file list and never observe half-written state. This is
the public Delta/Iceberg design re-expressed minimally:

* data files: each commit writes a fresh parquet directory under
  ``data/`` (never mutated, never reused across commits);
* manifests: ``_manifests/v%012d.json`` records the FULL directory
  list for that version (append = parent list + new dir, overwrite =
  new dir only) — reads need exactly one manifest, no log replay;
* atomicity: the manifest is staged to a temp name and published with
  an exclusive-create hard link; two racing writers targeting the same
  version get exactly one winner, the loser retries at version+1
  (optimistic concurrency). On an object store without atomic create,
  swap the publish step for a conditional PUT — the rest is unchanged;
* time travel: ``read(version=...)`` resolves any retained manifest;
  ``history()`` lists them; ``vacuum()`` deletes data directories no
  retained manifest references (crash-orphaned or overwritten-away).

Scale notes: manifests hold directory paths, not per-row state — a
commit is O(1) metadata regardless of data size; reads hand Spark the
resolved directory list so normal parquet pruning/pushdown applies
unchanged. Like streaming/pysink, the local implementation assumes
driver and executors share a filesystem; the commit protocol itself is
storage-agnostic.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_FMT = "v%012d.json"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, _FMT % version)


def latest_version(table_dir: str) -> int:
    """Highest committed version, or 0 if the table is empty/new."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(name[1:13])
        for name in os.listdir(mdir)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions, default=0)


def _load_manifest(table_dir: str, version: int) -> dict:
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        raise ValueError(
            f"snapshot version {version} not found in {table_dir} "
            f"(latest = {latest_version(table_dir)})"
        )
    with open(path) as fh:
        return json.load(fh)


def _json_scalar(v):
    return v if isinstance(v, (int, float, str, type(None))) else str(v)


def _check_schema_compatible(
    existing, incoming, allow_new_columns: bool
) -> None:
    """Append-time schema enforcement: every existing column must
    arrive with the same type; new columns need an explicit opt-in
    (they read back null-filled for old data via merge_schema)."""
    old = {f.name: f.dataType for f in existing.fields}
    new = {f.name: f.dataType for f in incoming.fields}
    missing = sorted(set(old) - set(new))
    if missing:
        raise ValueError(
            f"commit: append is missing table columns {missing} "
            "(write all existing columns, or overwrite)"
        )
    for name, t in old.items():
        if new[name] != t:
            raise ValueError(
                f"commit: column {name!r} type changed "
                f"{t.simpleString()} -> {new[name].simpleString()} "
                "(type changes require an overwrite)"
            )
    extra = sorted(set(new) - set(old))
    if extra and not allow_new_columns:
        raise ValueError(
            f"commit: append adds new columns {extra}; pass "
            "allow_new_columns=True to evolve the schema additively "
            "(readers see them null-filled via merge_schema=True)"
        )


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    max_retries: int = 20,
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
    enforce_schema: bool = True,
    allow_new_columns: bool = False,
) -> int:
    """Write ``df`` and atomically publish it; returns the new version.

    ``mode='append'`` adds to the current snapshot; ``'overwrite'``
    replaces it. The data write happens BEFORE any manifest exists, so
    a crash mid-write leaves only an orphaned directory (reclaimed by
    ``vacuum``), never a corrupt table. Publication is an exclusive
    create: racing writers serialize by version number.

    ``stats_cols``: record per-directory min/max of these columns in
    the manifest (one tiny aggregate on the committed batch). Appended
    directories keep the parent's stats, so ``read_pruned`` can skip
    whole directories without opening a single parquet footer — the
    manifest-level data skipping that makes an append-heavy table
    scannable at 100 TB.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if mode == "append" and enforce_schema:
        parent = latest_version(table_dir)
        if parent > 0:
            # merge_schema: the live table schema must include columns
            # added by earlier allow_new_columns appends — a plain read
            # takes one footer's schema and would let a CONFLICTING
            # type for an evolved column slip past the check
            existing = read(
                df.sparkSession, table_dir, version=parent,
                merge_schema=True,
            ).schema
            _check_schema_compatible(
                existing, df.schema, allow_new_columns
            )
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)

    rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    df.write.parquet(os.path.join(table_dir, rel_dir))
    n_rows = _dir_row_count(os.path.join(table_dir, rel_dir))

    dir_stats: dict[str, list] = {}
    if stats_cols:
        from pyspark.sql import functions as F

        # aggregate the WRITTEN files, not df's lineage: re-executing
        # a non-deterministic plan (rand/sample/changed source) could
        # record stats that disagree with the committed rows, and
        # prune_dirs would then skip matching data — pruning must
        # never be a semantic change. Reading back is also cheaper
        # (one fresh dir) than re-running the full input lineage.
        written = df.sparkSession.read.parquet(
            os.path.join(table_dir, rel_dir)
        )
        row = written.agg(
            *[F.min(c).alias(f"_min_{c}") for c in stats_cols],
            *[F.max(c).alias(f"_max_{c}") for c in stats_cols],
        ).head()
        dir_stats = {
            c: [_json_scalar(row[f"_min_{c}"]), _json_scalar(row[f"_max_{c}"])]
            for c in stats_cols
        }

    return _publish_dir(
        table_dir, rel_dir, mode, meta, dir_stats, max_retries,
        n_rows=n_rows,
    )


def _dir_row_count(full_dir: str) -> int:
    """Exact row count of a freshly written parquet directory, from
    footers alone (driver-side pyarrow metadata reads — KB of I/O, no
    Spark job)."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(full_dir):
        if f.endswith(".parquet"):
            total += pq.ParquetFile(
                os.path.join(full_dir, f)
            ).metadata.num_rows
    return total


def _publish_manifest(
    table_dir: str,
    build_fn,
    max_retries: int = 20,
) -> int:
    """THE commit protocol: stage → exclusive-create publish →
    optimistic retry. Every manifest writer (data commits, deletion
    vectors, restore, bloom backfill) goes through this one loop, so a
    change to the publish mechanism (e.g. conditional PUT on an object
    store) happens in exactly one place.

    ``build_fn(parent_version, parent_manifest_or_None)`` returns the
    manifest BODY (everything except version/parent/committed_at,
    which this function stamps); it is re-invoked per retry against
    the fresh parent, so racing writers always chain consistently.
    """
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    for _ in range(max_retries):
        parent = latest_version(table_dir)
        parent_manifest = (
            _load_manifest(table_dir, parent) if parent > 0 else None
        )
        manifest = build_fn(parent, parent_manifest)
        manifest["version"] = parent + 1
        manifest["parent"] = parent
        manifest["committed_at"] = time.time()
        staged = os.path.join(
            table_dir, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}"
        )
        with open(staged, "w") as fh:
            json.dump(manifest, fh)
        try:
            # hard link = atomic create-exclusive publish on POSIX
            os.link(staged, _manifest_path(table_dir, parent + 1))
            return parent + 1
        except FileExistsError:
            continue  # lost the race — rebuild against the new parent
        finally:
            os.unlink(staged)
    raise RuntimeError(
        f"commit to {table_dir} lost {max_retries} optimistic-concurrency "
        "races; raise max_retries or reduce writer contention"
    )


def _publish_dir(
    table_dir: str,
    rel_dir: str,
    mode: str,
    meta: dict | None = None,
    dir_stats: dict | None = None,
    max_retries: int = 20,
    dv_entry: dict | None = None,
    n_rows: int | None = None,
) -> int:
    """Atomically publish an already-written data directory as the
    next version — shared by ``commit``, the ``format(\"snapshot\")``
    batch writer, and ``delete_where_dv`` (``dv_entry`` set: the
    directory is a DELETION VECTOR — data dirs stay as the parent's,
    the entry joins the manifest's ``dvs`` list)."""

    def build(parent: int, parent_manifest: dict | None) -> dict:
        stats: dict[str, dict] = {}
        rows: dict[str, int] = {}
        blooms: dict[str, dict] = {}
        dvs: list[dict] = []
        if dv_entry is not None:
            if parent_manifest is None:
                raise ValueError(
                    "deletion vector on an empty table: nothing to delete"
                )
            dirs = list(parent_manifest["dirs"])
            stats = dict(parent_manifest.get("stats", {}))
            rows = dict(parent_manifest.get("rows", {}))
            blooms = dict(parent_manifest.get("blooms", {}))
            dvs = list(parent_manifest.get("dvs", [])) + [dv_entry]
        elif mode == "append" and parent_manifest is not None:
            dirs = parent_manifest["dirs"] + [rel_dir]
            stats = dict(parent_manifest.get("stats", {}))
            rows = dict(parent_manifest.get("rows", {}))
            # carried dirs keep their bloom metadata; the NEW dir has
            # none until the next attach_bloom backfill
            blooms = dict(parent_manifest.get("blooms", {}))
            # tombstones stay live across appends (key-scoped, see
            # delete_where_dv docstring)
            dvs = list(parent_manifest.get("dvs", []))
        else:
            dirs = [rel_dir]
        if dir_stats:
            stats[rel_dir] = dir_stats
        if n_rows is not None:
            rows[rel_dir] = n_rows
        manifest = {
            "mode": mode,
            "dirs": dirs,
            "meta": meta or {},
            "stats": stats,
            "rows": {d: rows[d] for d in dirs if d in rows},
        }
        kept_blooms = {d: blooms[d] for d in dirs if d in blooms}
        if kept_blooms:
            manifest["blooms"] = kept_blooms
        if dvs:
            manifest["dvs"] = dvs
        return manifest

    return _publish_manifest(table_dir, build, max_retries)


def version_as_of(table_dir: str, timestamp: float) -> int:
    """The newest version committed at or before ``timestamp`` (unix
    seconds) — SQL ``TIMESTAMP AS OF`` resolution. Commit times are
    read from retained manifests; raises if nothing that old exists."""
    best = 0
    for m in history(table_dir):
        if m.get("committed_at", 0.0) <= timestamp:
            best = max(best, m["version"])
    if best == 0:
        raise ValueError(
            f"snapshot table {table_dir}: no version at or before "
            f"timestamp {timestamp}"
        )
    return best


def read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
    as_of: float | None = None,
) -> DataFrame:
    """Snapshot read — latest by default, any retained version for
    time travel. Hands Spark the resolved directory list, so partition
    pruning / predicate pushdown behave exactly as on raw parquet.

    ``merge_schema=True`` unions the schemas of all referenced
    directories (appends that ADDED columns read back with nulls for
    older data — parquet's additive schema evolution); off by default
    because footer-schema merging costs one extra metadata pass."""
    if as_of is not None and version is not None:
        raise ValueError("read: pass version= OR as_of=, not both")
    if as_of is not None:
        version = version_as_of(table_dir, as_of)
    v = latest_version(table_dir) if version is None else version
    if v == 0:
        raise ValueError(f"snapshot table {table_dir} has no commits")
    m = _load_manifest(table_dir, v)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(table_dir, d) for d in m["dirs"]])
    return _apply_dvs(spark, table_dir, m, df)


def _dv_key_col(manifest: dict) -> str | None:
    """The (single, enforced-consistent) key column of a manifest's
    deletion vectors, or None when there are none."""
    dvs = manifest.get("dvs", [])
    if not dvs:
        return None
    cols = {e["key_col"] for e in dvs}
    if len(cols) != 1:
        raise ValueError(
            f"deletion vectors disagree on key_col: {sorted(cols)}"
        )
    return cols.pop()


def _dv_keys(spark: SparkSession, table_dir: str, manifest: dict):
    """Distinct tombstoned keys of a manifest (None when no dvs)."""
    dvs = manifest.get("dvs", [])
    if not dvs:
        return None
    df = spark.read.parquet(
        *[os.path.join(table_dir, e["dir"]) for e in dvs]
    )
    return df.select(_dv_key_col(manifest)).distinct()


def _apply_dvs(
    spark: SparkSession, table_dir: str, manifest: dict, df: DataFrame
) -> DataFrame:
    keys = _dv_keys(spark, table_dir, manifest)
    if keys is None:
        return df
    return df.join(keys, on=_dv_key_col(manifest), how="left_anti")


def history(table_dir: str) -> list[dict]:
    """All retained manifests, oldest first (version/mode/#dirs/time)."""
    return [
        _load_manifest(table_dir, v)
        for v in range(1, latest_version(table_dir) + 1)
        if os.path.exists(_manifest_path(table_dir, v))
    ]


def vacuum(
    table_dir: str,
    keep_versions: int | None = None,
    min_age_seconds: float = 600.0,
) -> list[str]:
    """Delete data directories referenced by NO retained manifest;
    optionally first drop all but the newest ``keep_versions``
    manifests. Returns the removed directory names.

    ``min_age_seconds`` is the in-flight-writer guard: a concurrent
    commit writes its data directory BEFORE publishing a manifest, so
    an unreferenced-but-fresh directory may be a commit in progress —
    deleting it would let the commit succeed pointing at vanished
    files (table corruption). Directories younger than the threshold
    are skipped, exactly the age-gated retention real table formats
    use; pass ``min_age_seconds=0`` only when no writer can be active
    (tests, single-writer maintenance windows).
    """
    latest = latest_version(table_dir)
    if keep_versions is not None:
        for v in range(1, max(latest - keep_versions + 1, 1)):
            path = _manifest_path(table_dir, v)
            if os.path.exists(path):
                os.unlink(path)
    referenced = {d for m in history(table_dir) for d in m["dirs"]}
    referenced |= {
        e["dir"] for m in history(table_dir) for e in m.get("dvs", [])
    }
    data_root = os.path.join(table_dir, _DATA_DIR)
    removed = []
    now = time.time()
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            rel = os.path.join(_DATA_DIR, name)
            if rel in referenced:
                continue
            full = os.path.join(data_root, name)
            if now - os.path.getmtime(full) < min_age_seconds:
                continue  # possible in-flight commit — too young
            shutil.rmtree(full)
            removed.append(rel)
    return sorted(removed)


def compact(
    spark: SparkSession, table_dir: str, target_partitions: int | None = None
) -> int:
    """Rewrite the current snapshot's many data directories into one
    (coalesced) directory and commit it as an overwrite — the
    small-files compaction every append-heavy table eventually needs
    (N streaming micro-batches = N directories of tiny parquet files;
    scan planning cost grows with file count, not data size).

    Readers are never disturbed: the compacted files land under a new
    version, prior versions stay time-travelable until ``vacuum``.
    """
    current = read(spark, table_dir)
    if target_partitions:
        current = current.coalesce(target_partitions)
    return commit(
        current, table_dir, mode="overwrite", meta={"compaction": True}
    )


def delete_where(
    spark: SparkSession, table_dir: str, predicate: str
) -> tuple[int, int]:
    """Row-level delete: commit a snapshot without rows matching
    ``predicate`` (a SQL boolean expression). Returns
    (new_version, rows_deleted).

    Copy-on-write semantics, like the table formats' default: the
    surviving rows rewrite, the old version remains for time travel /
    audit. Parquet predicate pushdown prunes files with no matches
    during the rewrite scan; a deletion-vector variant (mark, don't
    rewrite) is the upgrade path when deletes are tiny fractions of
    huge tables.
    """
    from pyspark.sql import functions as F

    current = read(spark, table_dir)
    survivors = current.where(~F.expr(predicate))
    n_deleted = current.count() - survivors.count()
    version = commit(
        survivors,
        table_dir,
        mode="overwrite",
        meta={"delete_where": predicate, "rows_deleted": n_deleted},
    )
    return version, n_deleted


def delete_where_dv(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    key_col: str,
) -> tuple[int, int]:
    """Row-level delete WITHOUT rewriting data: commit a deletion
    vector — a tiny parquet of tombstoned ``key_col`` values readers
    anti-join away. Returns (new_version, rows_deleted).

    This is the mark-don't-rewrite path ``delete_where`` documents as
    the upgrade for deletes that touch a tiny fraction of a huge
    table: the commit's I/O is proportional to the DELETED KEYS, not
    to the surviving 100 TB (copy-on-write rewrites everything).

    Semantics: ``key_col`` must uniquely identify rows (a primary
    key); tombstones are key-scoped and stay live across later
    appends — re-inserting a tombstoned key keeps it invisible until
    a rewrite (``compact``/overwrite) materializes the deletes and
    clears the vectors, exactly like engines that only reconcile DVs
    at OPTIMIZE time. All reader paths (``read``, ``read_pruned``,
    ``table_changes``) apply vectors; the ``format("snapshot")``
    datasource refuses DV'd tables rather than silently resurrecting
    deleted rows.
    """
    from pyspark.sql import functions as F

    current = read(spark, table_dir)
    doomed = current.where(F.expr(predicate))
    keys = doomed.select(key_col).distinct()
    n_deleted = keys.count()
    rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    keys.write.parquet(os.path.join(table_dir, rel_dir))
    version = _publish_dir(
        table_dir,
        rel_dir,
        mode="append",
        meta={"delete_where_dv": predicate, "rows_deleted": n_deleted},
        dv_entry={"dir": rel_dir, "key_col": key_col},
    )
    return version, n_deleted


def prune_dirs(
    table_dir: str,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> tuple[list[str], int]:
    """Directories whose manifest stats MAY intersect every queried
    range — (surviving dirs, total dirs). A directory with no recorded
    stats for a queried column is kept (conservative, like a parquet
    file with missing column statistics).

    Type discipline: stats for non-JSON types (timestamps, dates)
    are stored via ``str()`` — fixed-width ISO-like forms whose
    lexicographic order matches chronology — so query bounds of those
    types are coerced through the same ``str()`` before comparing.
    A bound that still can't compare against a stat (e.g. Decimal vs
    str) keeps the directory instead of crashing: pruning degrades to
    conservative, never to wrong or broken."""
    v = latest_version(table_dir) if version is None else version
    m = _load_manifest(table_dir, v)
    stats = m.get("stats", {})

    def _coerce(bound, stat_sample):
        if bound is None:
            return None
        if isinstance(stat_sample, str) and not isinstance(bound, str):
            return str(bound)
        return bound

    kept = []
    for d in m["dirs"]:
        dstats = stats.get(d, {})
        keep = True
        for col, (lo, hi) in ranges.items():
            if col not in dstats:
                continue
            cmin, cmax = dstats[col]
            if cmin is None or cmax is None:
                continue
            lo_c, hi_c = _coerce(lo, cmin), _coerce(hi, cmax)
            try:
                if (hi_c is not None and cmin > hi_c) or (
                    lo_c is not None and cmax < lo_c
                ):
                    keep = False
                    break
            except TypeError:
                continue  # incomparable bound/stat: keep (conservative)
        if keep:
            kept.append(d)
    return kept, len(m["dirs"])


def read_pruned(
    spark: SparkSession,
    table_dir: str,
    ranges: dict[str, tuple],
    version: int | None = None,
) -> DataFrame:
    """Snapshot read that skips directories via manifest min/max stats,
    THEN applies the same range predicates row-exactly (pruning is an
    optimization, never a semantic change). At scale this is the
    two-level skip every table format gives you: manifest stats drop
    whole directories before parquet footer stats drop row groups."""
    from pyspark.sql import functions as F

    kept, _total = prune_dirs(table_dir, ranges, version)
    if not kept:
        return read(spark, table_dir, version).where(F.lit(False))
    df = spark.read.parquet(*[os.path.join(table_dir, d) for d in kept])
    v = latest_version(table_dir) if version is None else version
    df = _apply_dvs(spark, table_dir, _load_manifest(table_dir, v), df)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(col) >= lo)
        if hi is not None:
            df = df.where(F.col(col) <= hi)
    return df


def restore(table_dir: str, version: int) -> int:
    """Roll the table back to ``version``'s contents by committing its
    directory list (and stats) as a NEW version — history is never
    rewritten, so the bad versions remain auditable and the rollback
    itself is one O(1) manifest publish (no data movement at all)."""
    src = _load_manifest(table_dir, version)

    def build(parent: int, parent_manifest: dict | None) -> dict:
        manifest = {
            "mode": "overwrite",
            "dirs": src["dirs"],
            "meta": {"restored_from": version},
            "stats": src.get("stats", {}),
            # the restored STATE includes the source version's row
            # counts, blooms, and — critically — deletion vectors:
            # restoring without the dvs would resurrect deleted rows
            "rows": src.get("rows", {}),
        }
        if src.get("blooms"):
            manifest["blooms"] = src["blooms"]
        if src.get("dvs"):
            manifest["dvs"] = src["dvs"]
        return manifest

    return _publish_manifest(table_dir, build)


def maybe_compact(
    spark: SparkSession,
    table_dir: str,
    max_dirs: int = 16,
    target_partitions: int | None = None,
) -> int | None:
    """Compaction POLICY: compact only when the current snapshot spans
    more than ``max_dirs`` data directories (the append-heavy state
    where scan planning cost starts tracking file count). Returns the
    new version, or None when no compaction was needed — cheap enough
    to call after every streaming batch or on a schedule."""
    v = latest_version(table_dir)
    if v == 0:
        return None
    if len(_load_manifest(table_dir, v)["dirs"]) <= max_dirs:
        return None
    return compact(spark, table_dir, target_partitions)


def table_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed between two versions (CDC read): every
    row with a ``_change_type`` of 'insert' or 'delete'; an update is
    its delete+insert pair. ``from_version=0`` emits the target
    version entirely as inserts (bootstrap).

    The manifest diff does the heavy lifting: only directories the two
    manifests DISAGREE on are read — directories carried unchanged
    across versions (the overwhelming majority under append-mostly
    workloads) are never opened. Rows that merely moved between
    directories (compaction, copy-on-write rewrite survivors) cancel
    via a multiset EXCEPT ALL, so a compact() produces an EMPTY feed
    and a delete_where() produces exactly its deleted rows. Cost is
    therefore ∝ churned bytes, not table size — except full-overwrite
    commits, where the churn IS the table.

    At 100 TB this is the incremental-consumer primitive: downstream
    jobs (index refresh, aggregate maintenance — see
    operators/incremental.py) chase the feed instead of re-scanning.
    """
    from pyspark.sql import functions as F

    to_v = latest_version(table_dir) if to_version is None else to_version
    if from_version > to_v:
        raise ValueError(
            f"table_changes: from_version {from_version} > to {to_v}"
        )
    m_from = (
        _load_manifest(table_dir, from_version) if from_version > 0 else {}
    )
    m_to = _load_manifest(table_dir, to_v)
    old_dirs = set(m_from.get("dirs", []))
    new_dirs = set(m_to["dirs"])
    added = sorted(new_dirs - old_dirs)
    removed = sorted(old_dirs - new_dirs)

    def _read_dirs(dirs: list[str]) -> DataFrame | None:
        if not dirs:
            return None
        return spark.read.parquet(
            *[os.path.join(table_dir, d) for d in dirs]
        )

    ins, dels = _read_dirs(added), _read_dirs(removed)

    # deletion-vector awareness: effective(v) = dirs(v) ∖ dv-keys(v).
    # Changed dirs apply their own side's vectors; UNCHANGED dirs can
    # still change effectively — but only for keys the two vector sets
    # disagree on, so the common-dir scan is key-filtered (tiny) and
    # feed cost stays ∝ churn.
    kf, kt = _dv_key_col(m_from) if m_from else None, _dv_key_col(m_to)
    if kf or kt:
        key = kf or kt
        if kf and kt and kf != kt:
            raise ValueError(
                f"table_changes: dv key_col changed {kf!r} -> {kt!r}"
            )
        from pyspark.sql import functions as F

        empty_keys = None
        dv_from = (
            _dv_keys(spark, table_dir, m_from) if m_from else None
        )
        dv_to = _dv_keys(spark, table_dir, m_to)
        if ins is not None and dv_to is not None:
            ins = ins.join(dv_to, on=key, how="left_anti")
        if dels is not None and dv_from is not None:
            dels = dels.join(dv_from, on=key, how="left_anti")
        # metadata shortcut: identical dv DIRECTORY lists mean
        # identical key sets (dv dirs are immutable), so unchanged
        # data dirs cannot change effectively — skip their scan
        # entirely. Without this, every incremental batch on a
        # once-DV'd table would rescan the whole table.
        dv_dirs_from = [
            e["dir"] for e in (m_from or {}).get("dvs", [])
        ]
        dv_dirs_to = [e["dir"] for e in m_to.get("dvs", [])]
        common = (
            None
            if dv_dirs_from == dv_dirs_to
            else _read_dirs(sorted(old_dirs & new_dirs))
        )
        if common is not None:
            newly_dead = (
                dv_to
                if dv_from is None
                else (
                    empty_keys
                    if dv_to is None
                    else dv_to.exceptAll(dv_from)
                )
            )
            revived = (
                dv_from
                if dv_to is None
                else (
                    empty_keys
                    if dv_from is None
                    else dv_from.exceptAll(dv_to)
                )
            )
            if newly_dead is not None:
                extra_del = common.join(
                    newly_dead, on=key, how="left_semi"
                )
                dels = (
                    extra_del
                    if dels is None
                    else dels.unionByName(extra_del)
                )
            if revived is not None:
                extra_ins = common.join(
                    revived, on=key, how="left_semi"
                )
                ins = (
                    extra_ins
                    if ins is None
                    else ins.unionByName(extra_ins)
                )
    if ins is None and dels is None:
        # no manifest difference: empty feed with the table's schema
        base = read(spark, table_dir, to_v).where(F.lit(False))
        return base.withColumn("_change_type", F.lit("insert"))
    if dels is None:
        net_ins, net_del = ins, None
    elif ins is None:
        net_ins, net_del = None, dels
    else:
        net_ins, net_del = ins.exceptAll(dels), dels.exceptAll(ins)
    parts = []
    if net_ins is not None:
        parts.append(net_ins.withColumn("_change_type", F.lit("insert")))
    if net_del is not None:
        parts.append(net_del.withColumn("_change_type", F.lit("delete")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def optimize_zorder(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    n_files: int = 8,
    stats_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE ZORDER BY for snapshot tables: rewrite the current
    snapshot z-order-clustered on ``cols`` and commit it as a new
    version (overwrite semantics — history stays time-travelable,
    deletion vectors materialize and clear like ``compact``).

    Composition of the two existing primitives: the layout rewrite is
    ``sources.layout.zorder_layout`` (quantile-ranked Morton keys, no
    global window), the publication is the ordinary atomic manifest
    commit. ``stats_cols`` defaults to ``cols`` so the manifest gains
    min/max for exactly the clustered dimensions — directory-level
    skipping (``read_pruned``) and parquet row-group skipping then
    both benefit from the same layout decision.
    """
    from mitoscape_spark.sources.layout import zorder_layout

    current = read(spark, table_dir)
    clustered = zorder_layout(current, cols, n_files=n_files)
    return commit(
        clustered,
        table_dir,
        mode="overwrite",
        meta={"zorder": cols},
        stats_cols=stats_cols if stats_cols is not None else cols,
    )


# ---------------------------------------------------------------------
# Bloom-filter directory skipping: point-lookup pruning where min/max
# ranges are useless (high-cardinality ids scattered across the full
# range in every directory). Per directory and column, the manifest
# stores a small fixed-size bloom bitmap (default 8192 bits ≈ 2 KB hex)
# built with k=4 seeded Murmur3 hashes — a membership test that never
# yields false negatives, so pruning is an optimization, never a
# semantic change. The bitmap is computed DISTRIBUTED (distinct bit
# positions via one aggregation); only the ≤ m positions reach the
# driver.
# ---------------------------------------------------------------------

_BLOOM_BITS = 8192
_BLOOM_HASHES = 4


def _bloom_position_cols(col: str):
    from pyspark.sql import functions as F

    # hash over the STRING form: Murmur3 is type-width-sensitive (an
    # int32 column and an int64 literal of the same value hash
    # differently), and a false NEGATIVE would silently drop rows —
    # the string cast makes build and probe agree for any type
    s = F.col(col).cast("string")
    return [
        F.pmod(F.hash(s, F.lit(seed)), F.lit(_BLOOM_BITS))
        for seed in range(_BLOOM_HASHES)
    ]


def bloom_for_commit(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """{column: hex bitmap} for one committed directory."""
    from pyspark.sql import functions as F

    out: dict[str, str] = {}
    for c in cols:
        positions = [
            r[0]
            for r in df.select(
                F.explode(F.array(*_bloom_position_cols(c))).alias("p")
            )
            .distinct()
            .collect()
        ]
        bits = bytearray(_BLOOM_BITS // 8)
        for p in positions:
            bits[p // 8] |= 1 << (p % 8)
        out[c] = bytes(bits).hex()
    return out


def _bloom_probe_positions(spark: SparkSession, value) -> list[int]:
    """The probed value's bit positions — ONE tiny Spark job per
    lookup (Spark computes its own Murmur3, so build and probe can
    never drift), reused across every directory's bitmap."""
    from pyspark.sql import functions as F

    probe = F.lit(value).cast("string")
    row = (
        spark.range(1)
        .select(
            *[
                F.pmod(
                    F.hash(probe, F.lit(seed)),
                    F.lit(_BLOOM_BITS),
                ).alias(f"p{seed}")
                for seed in range(_BLOOM_HASHES)
            ]
        )
        .head()
    )
    return [row[i] for i in range(_BLOOM_HASHES)]


def _bloom_may_contain(bitmap_hex: str, positions: list[int]) -> bool:
    bits = bytes.fromhex(bitmap_hex)
    return all(bits[p // 8] & (1 << (p % 8)) for p in positions)


def attach_bloom(
    spark: SparkSession, table_dir: str, cols: list[str]
) -> int:
    """Backfill bloom bitmaps for the CURRENT version's directories and
    publish as a metadata-only commit (dirs unchanged): one pass per
    directory, O(bits) manifest growth."""
    v = latest_version(table_dir)
    m = _load_manifest(table_dir, v)
    blooms = dict(m.get("blooms", {}))
    for d in m["dirs"]:
        df = spark.read.parquet(os.path.join(table_dir, d))
        blooms.setdefault(d, {}).update(bloom_for_commit(df, cols))
    # metadata-only publish: same dirs/stats/dvs, blooms added
    def build(parent: int, parent_manifest: dict | None) -> dict:
        if parent_manifest is None:
            raise ValueError("attach_bloom on an empty table")
        manifest = dict(parent_manifest)
        manifest["mode"] = "append"
        manifest["meta"] = {"bloom_cols": cols}
        manifest["blooms"] = {
            **parent_manifest.get("blooms", {}),
            **blooms,
        }
        return manifest

    return _publish_manifest(table_dir, build)


def read_point_lookup(
    spark: SparkSession,
    table_dir: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point lookup with bloom directory skipping: read only the
    directories whose bloom MAY contain ``value`` (directories without
    a bloom for ``col`` are conservatively kept), then apply the exact
    equality predicate. Never a false negative; expected false-positive
    rate at 8192 bits / 4 hashes stays < 3% up to ~1k distinct values
    per directory."""
    from pyspark.sql import functions as F

    v = latest_version(table_dir) if version is None else version
    m = _load_manifest(table_dir, v)
    blooms = m.get("blooms", {})
    positions = _bloom_probe_positions(spark, value)
    kept = [
        d
        for d in m["dirs"]
        if col not in blooms.get(d, {})
        or _bloom_may_contain(blooms[d][col], positions)
    ]
    if not kept:
        base = read(spark, table_dir, v).where(F.lit(False))
        return base
    df = spark.read.parquet(*[os.path.join(table_dir, d) for d in kept])
    df = _apply_dvs(spark, table_dir, m, df)
    return df.where(F.col(col) == F.lit(value))


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
) -> int:
    """MERGE INTO for snapshot tables: WHEN MATCHED UPDATE (source row
    wins) / WHEN NOT MATCHED INSERT, committed atomically as a new
    version. Composition: operators.merge.merge_upsert computes the
    post-merge state (anti-join keeps the untouched majority
    streaming), the atomic overwrite commit publishes it; concurrent
    readers see the old version until the manifest lands, history
    stays time-travelable. The rewrite-everything cost profile is
    copy-on-write's; for key-deletes at tiny fractions use
    ``delete_where_dv`` instead."""
    from mitoscape_spark.operators.merge import merge_upsert

    current = read(spark, table_dir)
    merged = merge_upsert(current, source, keys)
    return commit(
        merged, table_dir, mode="overwrite", meta={"merge_keys": keys}
    )


def replicate_changes(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    key_col: str,
    from_version: int,
    to_version: int | None = None,
) -> int:
    """CDC replication: apply ``src_table``'s change feed
    (``table_changes``) to ``dst_table`` so it catches up to the source
    snapshot — the downstream-mirror primitive (read feed, not source
    scans). Deletes in the feed anti-join out of the mirror; inserts
    upsert. Returns the mirror's new version. Exactly-once per call:
    the caller tracks (from_version → to_version) watermarks, e.g. in
    the mirror's own manifest meta."""
    from pyspark.sql import functions as F

    from mitoscape_spark.operators.merge import apply_changes

    to_v = (
        latest_version(src_table) if to_version is None else to_version
    )
    feed = table_changes(spark, src_table, from_version, to_v)
    changes = feed.withColumn(
        "op",
        F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
            F.lit("I")
        ),
    ).drop("_change_type")
    current = (
        read(spark, dst_table)
        if latest_version(dst_table) > 0
        else changes.drop("op").where(F.lit(False))
    )
    new_state = apply_changes(current, changes, [key_col])
    return commit(
        new_state,
        dst_table,
        mode="overwrite",
        meta={
            "replicated_from": src_table,
            "src_versions": [from_version, to_v],
        },
        enforce_schema=False,
    )


def table_count(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> int:
    """Exact row count answered from manifest metadata when possible —
    O(manifest) instead of a table scan (the COUNT(*) every dashboard
    fires at a 100 TB table). Falls back to a real (still cheap:
    parquet footer) count for directories committed before row counts
    were recorded; deletion vectors force a real count (tombstoned
    KEYS ≠ tombstoned rows only if keys are unique — we don't assume)."""
    v = latest_version(table_dir) if version is None else version
    m = _load_manifest(table_dir, v)
    if m.get("dvs"):
        return read(spark, table_dir, v).count()
    rows = m.get("rows", {})
    total = 0
    for d in m["dirs"]:
        if d in rows:
            total += rows[d]
        else:
            total += _dir_row_count(os.path.join(table_dir, d))
    return total


def consume_changes(
    spark: SparkSession,
    table_dir: str,
    checkpoint_file: str,
    apply_fn,
) -> tuple[int, int]:
    """Checkpointed incremental CDC consumption: call
    ``apply_fn(feed_df, from_version, to_version)`` with the change
    feed since the last run, then atomically advance the durable
    watermark (tmp + rename). Returns the (from, to) range processed;
    (v, v) means nothing new.

    Exactly-once end-to-end requires ``apply_fn`` to be idempotent for
    a repeated (from, to) range (e.g. commit into a snapshot table
    keyed by the range, as ``replicate_changes`` records in its
    manifest meta) — the watermark write happens AFTER apply, so a
    crash between the two replays the same range, never skips one.
    This is the driver-side incremental-consumer loop for feeds whose
    semantics (deletes!) the append-only ``snapshotstream`` source
    deliberately refuses to flatten.
    """
    last = 0
    if os.path.exists(checkpoint_file):
        with open(checkpoint_file) as fh:
            last = json.load(fh)["version"]
    latest = latest_version(table_dir)
    if latest <= last:
        return (last, last)
    feed = table_changes(spark, table_dir, last, latest)
    apply_fn(feed, last, latest)
    staged = checkpoint_file + f".tmp-{uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(checkpoint_file) or ".", exist_ok=True)
    with open(staged, "w") as fh:
        json.dump({"version": latest, "updated_at": time.time()}, fh)
    os.replace(staged, checkpoint_file)
    return (last, latest)


def schema_diff(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int,
) -> list[dict]:
    """Schema evolution audit between two table versions: a list of
    {change: added|removed|retyped, column, from_type, to_type}.

    At 100 TB, "when did this column widen and who reads it as the old
    type" is an incident question; the manifest chain already pins
    which data each version references, so the answer is two
    merged-schema reads of METADATA (parquet footers of the referenced
    dirs), no data scan. Empty list == schemas identical.
    """
    def _schema(version: int) -> dict[str, str]:
        df = read(spark, table_dir, version=version, merge_schema=True)
        return {f.name: f.dataType.simpleString() for f in df.schema.fields}

    old, new = _schema(from_version), _schema(to_version)
    diff: list[dict] = []
    for col in sorted(set(old) | set(new)):
        if col not in new:
            diff.append(
                {"change": "removed", "column": col,
                 "from_type": old[col], "to_type": None}
            )
        elif col not in old:
            diff.append(
                {"change": "added", "column": col,
                 "from_type": None, "to_type": new[col]}
            )
        elif old[col] != new[col]:
            diff.append(
                {"change": "retyped", "column": col,
                 "from_type": old[col], "to_type": new[col]}
            )
    return diff


def clone(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    version: int | None = None,
) -> int:
    """Clone one version of a table into a fresh single-version table —
    the dev/test-branch primitive ("give me yesterday's table to
    experiment on" without touching production history).

    Data is re-committed through the ordinary commit path (deletion
    vectors APPLIED, blooms/stats rebuilt for the clone's own layout),
    so the clone is a self-contained v1 table with no references into
    the source — vacuuming the source can never corrupt it. A
    file-level shallow clone (manifest pointing at source files) would
    be cheaper but couples the clone's integrity to the source's
    retention policy; this engine's layer keeps tables self-contained.
    """
    df = read(spark, src_dir, version=version)
    return commit(
        df,
        dst_dir,
        mode="overwrite",
        meta={
            "cloned_from": src_dir,
            "cloned_version": version
            if version is not None
            else latest_version(src_dir),
        },
    )
