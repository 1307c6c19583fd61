"""Streaming sinks beyond the memory/console built-ins: partitioned
parquet append and a foreachBatch idempotent-upsert sink.

``foreachBatch`` is Spark's escape hatch for sinks Structured Streaming
doesn't ship (JDBC upsert, MERGE into a lake table, multi-sink fanout).
The contract that makes it exactly-once: the batch function receives
``(batch_df, batch_id)`` and must be *idempotent per batch_id* — on
failure/restart the same micro-batch is re-delivered with the same id.

``upsert_to_parquet`` composes the engine's own rewrite-merge
(operators/merge.py::merge_upsert) inside foreachBatch: each micro-batch
is merged into the snapshot by key, so replays converge to the same
snapshot instead of duplicating appends — the plain-parquet stand-in
for MERGE INTO on a table format.

Scale: the snapshot rewrite is proportional to snapshot size, which is
the plain-parquet cost of mutability (table formats buy you file-level
pruning here); the merge join itself broadcasts the micro-batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mitoscape_spark.pins import pin_eager

from mitoscape_spark.operators.merge import merge_upsert


def append_partitioned(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
) -> StreamingQuery:
    """Append-mode partitioned parquet sink — the default landing zone
    for raw event streams (hive-style layout, prunable downstream)."""
    w = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    return w.start()


def upsert_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str | None = None,
) -> StreamingQuery:
    """foreachBatch upsert sink: each micro-batch is rewrite-merged into
    the parquet snapshot at ``path`` by ``keys``.

    Intra-batch duplicates: with ``order_col`` the row with the MAX
    order value per key survives (deterministic last-write-wins and
    therefore idempotent across batch_id replays); without it an
    arbitrary row survives — fine for batches that can't carry
    duplicate keys, unsound for multi-update batches, so pass
    ``order_col`` whenever updates can collide.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        if order_col is not None:
            w = Window.partitionBy(*keys).orderBy(
                F.col(order_col).desc()
            )
            batch = (
                batch_df.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") == 1)
                .drop("_rk")
            )
        else:
            batch = batch_df.dropDuplicates(keys)
        # ONLY a missing snapshot means "first batch"; any other read
        # or merge failure must propagate — swallowing it would
        # overwrite the whole snapshot with this batch's few rows
        # (total data loss dressed up as recovery)
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jvm_path.getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        if fs.exists(jvm_path):
            target = spark.read.parquet(path)
            merged = merge_upsert(target, batch, keys)
        else:
            merged = batch
        # rewrite snapshot: stage in memory (bench-scale) or to a temp
        # dir then swap in production; localCheckpoint breaks the
        # read-own-input cycle
        merged.transform(pin_eager).write.mode("overwrite").parquet(
            path
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def run_incremental(
    spark,
    src_dir: str,
    schema,
    transform,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental batch over a growing file directory:
    ``Trigger.AvailableNow`` drains everything NOT yet recorded in the
    checkpoint, then stops — the recurring-batch-job pattern (hourly
    cron over a landing zone) with streaming's bookkeeping instead of
    hand-rolled "which files did I already process" manifests.

    Each invocation processes only new files, exactly once, and appends
    to the parquet sink; a crash mid-run resumes from the checkpoint.
    At scale this replaces the fragile `ls | diff` incremental-load
    scripts — the checkpoint's file log IS the manifest, and the work
    distributes like any other structured-streaming micro-batch.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def append_stream_to_snapshot(
    stream: DataFrame,
    table_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Exactly-once streaming append into a snapshot table
    (sources/snapshots.py) — transactional landing zone instead of
    bare-directory parquet append.

    foreachBatch delivers (batch_df, batch_id) at-least-once with a
    STABLE batch_id; the snapshot manifest records that id, so a
    replayed batch whose id is already committed becomes a no-op —
    idempotence lives in the TABLE's commit log, not in sink-side
    state that a restart could lose. Readers meanwhile get atomic
    visibility: a crash mid-write leaves an orphaned data directory
    (vacuumable), never a torn snapshot — strictly stronger than the
    file-sink's _spark_metadata contract because ANY engine reading
    manifests sees consistent versions, not just Spark.

    The already-committed check scans the manifest chain (O(versions));
    a long-lived deployment stores the high-water batch_id in the
    latest manifest instead — same protocol, one read.
    """
    return (
        stream.writeStream.foreachBatch(snapshot_batch_committer(table_dir))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def snapshot_batch_committer(table_dir: str):
    """The idempotent (batch_df, batch_id) function behind
    ``append_stream_to_snapshot`` — module-level so replay semantics
    are testable without driving a StreamingQuery."""
    from mitoscape_spark.sources import snapshots as snap

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        committed = {
            m.get("meta", {}).get("batch_id") for m in snap.history(table_dir)
        }
        if batch_id in committed:
            return
        snap.commit(batch_df, table_dir, meta={"batch_id": batch_id})

    return commit_batch


def stream_refresh_aggregate(
    stream: DataFrame,
    table_dir: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
    sum_col: str = "sum_value",
    count_col: str = "n",
) -> StreamingQuery:
    """Streaming materialized view: every micro-batch folds into a
    snapshot-backed (sum, count) aggregate exactly once.

    Composition of three engine pieces — incremental maintenance
    (operators/incremental.py, O(|batch|) per refresh), snapshot
    commits (atomic reader visibility + time travel over past view
    states), and the manifest batch_id ledger (replayed micro-batches
    no-op). Dashboards read the view table; the fact stream is never
    rescanned."""
    return (
        stream.writeStream.foreachBatch(
            aggregate_refresh_committer(
                table_dir, keys, value_col, sum_col, count_col
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def aggregate_refresh_committer(
    table_dir: str,
    keys: list[str],
    value_col: str,
    sum_col: str = "sum_value",
    count_col: str = "n",
):
    """(batch_df, batch_id) function behind ``stream_refresh_aggregate``
    — module-level so replay idempotence is directly testable."""
    from mitoscape_spark.operators.incremental import (
        refresh_snapshot_aggregate,
    )
    from mitoscape_spark.sources import snapshots as snap

    def refresh_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        committed = {
            m.get("meta", {}).get("batch_id") for m in snap.history(table_dir)
        }
        if batch_id in committed:
            return
        delta = batch_df.withColumn("op", F.lit("insert"))
        refresh_snapshot_aggregate(
            batch_df.sparkSession,
            table_dir,
            delta,
            keys,
            value_col,
            sum_col,
            count_col,
            meta={"batch_id": batch_id},
        )

    return refresh_batch


def _commit_ledger(table_dir: str) -> set:
    """batch_ids with a recorded commit in ``table_dir`` — the
    exactly-once ledger shared by both two-table dedup committers.

    history() returns [] for a never-created table, so "missing" needs
    no handling; only tolerate a manifest vanishing mid-read
    (FileNotFoundError TOCTOU vs a concurrent vacuum) / a version
    probe race (ValueError from _load_manifest) — and tolerate it by
    RETRYING, not by returning an empty ledger: an empty result here
    makes an already-committed batch look uncommitted and re-append its
    state, breaking the exactly-once contract in exactly the race this
    helper guards. After bounded retries the error propagates and the
    micro-batch fails loudly (Structured Streaming will re-run it).
    Anything else — corrupt JSON, permission errors — propagates
    immediately; JSONDecodeError is a ValueError subclass, hence the
    explicit re-raise."""
    import json
    import time

    from mitoscape_spark.sources import snapshots as snap

    last_err: Exception | None = None
    for attempt in range(5):
        try:
            return {
                m.get("meta", {}).get("batch_id")
                for m in snap.history(table_dir)
            }
        except json.JSONDecodeError:
            raise
        except (FileNotFoundError, ValueError) as err:
            last_err = err
            if attempt < 4:  # no sleep after the final attempt
                time.sleep(0.05 * (attempt + 1))
    raise last_err


def _version_before_batch(table_dir: str, batch_id: int) -> int | None:
    """If ``batch_id`` is ALREADY committed to the table (crash
    happened between the state and pairs commits), return the version
    preceding that commit; else None. Reading state as-of that version
    makes a crash replay see the IDENTICAL pre-commit state the first
    attempt saw — exact convergence for both committers."""
    from mitoscape_spark.sources import snapshots as snap

    for m in snap.history(table_dir):
        if m.get("meta", {}).get("batch_id") == batch_id:
            return m["version"] - 1
    return None


def dedup_index_committer(
    index_dir: str, pairs_dir: str, max_bucket_size: int | None = 256
):
    """(batch_df, batch_id) function for a STREAMING near-dedup
    service: each micro-batch of documents is paired against the
    persisted LSH band index (operators/dedup.py::
    incremental_minhash_pairs — the corpus is probed, never re-paired),
    discovered pairs append to one snapshot table, the batch's bands
    append to the index table.

    Exactly-once across TWO tables without a cross-table transaction,
    by commit order + ledgers + a replay-safe pair computation:
    the INDEX commits first (ledgered by batch_id), pairs second
    (ledgered independently). A replay after a crash between the two
    detects the batch's existing index commit and re-reads the corpus
    AS-OF the version preceding it (snapshot time travel), so the pair
    computation sees the identical corpus the first attempt saw —
    exact even when ``max_bucket_size`` caps hot buckets (a bucket
    that crosses the cap only after this batch's bands cannot alter
    the replayed pair set). Every crash point converges to the same
    two tables.
    """
    from mitoscape_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_bands,
        minhash_signatures,
    )
    from mitoscape_spark.sources import snapshots as snap

    _ledger = _commit_ledger  # shared protocol helper (see above)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # as-of crash replay (_version_before_batch): convergence is
        # exact even with max_bucket_size set — a corpus bucket that
        # crosses the cap only after this batch's bands cannot change
        # the replayed pair set (round-3 advice)
        replay_parent = _version_before_batch(index_dir, batch_id)
        empty_bands = lambda: minhash_bands(  # noqa: E731
            minhash_signatures(batch_df.limit(0))
        )
        if replay_parent == 0:
            # replaying the very first batch: pre-commit corpus empty
            corpus_bands = empty_bands()
        elif replay_parent is not None:
            # crash replay: read the exact pre-commit corpus. Errors
            # (e.g. the version was vacuumed during the outage) must
            # PROPAGATE and fail the batch — falling back to an empty
            # corpus here would silently commit a pair set missing
            # every corpus-vs-batch pair. Recovery from a vacuumed
            # replay version is operator-driven (re-run with a fresh
            # pairs table), never silent.
            corpus_bands = snap.read(spark, index_dir, version=replay_parent)
        else:
            try:
                corpus_bands = snap.read(spark, index_dir)
            except ValueError:  # first batch: empty index, right schema
                corpus_bands = empty_bands()
        pairs, new_bands = incremental_minhash_pairs(
            corpus_bands, batch_df, max_bucket_size=max_bucket_size
        )
        if batch_id not in _ledger(index_dir):
            snap.commit(
                new_bands, index_dir, mode="append",
                meta={"batch_id": batch_id},
            )
        if batch_id not in _ledger(pairs_dir):
            snap.commit(
                pairs, pairs_dir, mode="append",
                meta={"batch_id": batch_id},
            )

    return commit_batch


def stream_dedup_pairs(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint: str,
    max_bucket_size: int | None = 256,
) -> StreamingQuery:
    """Streaming near-dedup service: documents in, (doc_a, doc_b)
    candidate pairs + a growing LSH index out, exactly once."""
    return (
        stream.writeStream.foreachBatch(
            dedup_index_committer(index_dir, pairs_dir, max_bucket_size)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def embedding_dedup_committer(
    corpus_dir: str,
    pairs_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(batch_df, batch_id) function for the STREAMING embedding
    near-dedup service — the vector twin of ``dedup_index_committer``:
    each micro-batch of embeddings GEMMs against the persisted corpus
    blocks (operators/dedup.py::incremental_embedding_pairs — linear
    in corpus), discovered pairs append to one snapshot table, the
    batch's vectors append to the corpus table.

    Exactly-once by the identical two-table protocol: corpus commits
    first (ledgered by batch_id), pairs second; a crash replay detects
    the batch's existing corpus commit and re-reads the corpus AS-OF
    the preceding version, so the recomputed pair set is the one the
    first attempt saw; a vacuumed replay version fails loudly (see
    ``dedup_index_committer`` for the rationale on each rule)."""
    from mitoscape_spark.operators.dedup import incremental_embedding_pairs
    from mitoscape_spark.sources import snapshots as snap

    _ledger = _commit_ledger  # shared protocol helpers (see above)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, vec_col)
        replay_parent = _version_before_batch(corpus_dir, batch_id)
        if replay_parent == 0:
            corpus = batch.limit(0)
        elif replay_parent is not None:
            corpus = snap.read(spark, corpus_dir, version=replay_parent)
        else:
            try:
                corpus = snap.read(spark, corpus_dir)
            except ValueError:  # first batch: empty corpus, same schema
                corpus = batch.limit(0)
        pairs = incremental_embedding_pairs(
            corpus, batch, threshold, id_col, vec_col
        )
        if batch_id not in _ledger(corpus_dir):
            snap.commit(
                batch, corpus_dir, mode="append",
                meta={"batch_id": batch_id},
            )
        if batch_id not in _ledger(pairs_dir):
            snap.commit(
                pairs, pairs_dir, mode="append",
                meta={"batch_id": batch_id},
            )

    return commit_batch


def stream_embedding_dedup_pairs(
    stream: DataFrame,
    corpus_dir: str,
    pairs_dir: str,
    checkpoint: str,
    threshold: float = 0.95,
) -> StreamingQuery:
    """Streaming embedding near-dedup service: vectors in,
    (id_a, id_b, cos) pairs + a growing corpus table out, exactly
    once."""
    return (
        stream.writeStream.foreachBatch(
            embedding_dedup_committer(corpus_dir, pairs_dir, threshold)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def forget_documents(
    spark,
    index_dir: str,
    pairs_dir: str,
    doc_ids,
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    index_key: str = "doc_id",
) -> dict:
    """Right-to-be-forgotten for a streaming dedup service's state:
    remove ``doc_ids`` from BOTH tables — their LSH bands leave the
    index (future batches can no longer pair against them) and every
    pair touching them leaves the pairs table.

    Scale asymmetry, deliberately: the INDEX (∝ corpus, the 100 TB
    side) takes a deletion-vector delete — I/O proportional to the
    forgotten keys, no rewrite; the PAIRS table (candidates only,
    orders of magnitude smaller) takes a copy-on-write delete because
    "either endpoint" is not expressible with the single-key DV
    contract. Both deletes are snapshot commits: the pre-forget
    versions remain for audit/time travel until ``vacuum``.

    Operational contract (documented, not enforced): run against a
    QUIESCED stream. A crash replay that time-travels to a pre-forget
    index version (dedup_index_committer's as-of protocol) would see
    the forgotten bands again. DV tombstones are key-scoped and
    OUTLIVE later appends: a forgotten id that is re-fed stays
    invisible to corpus probes until a compact/overwrite materializes
    the deletes — i.e. forget bans the id, which is the semantics a
    takedown wants.

    ``doc_ids`` is a bounded iterable of ids (takedown sets are small;
    the id list inlines into the delete predicates).
    """
    from mitoscape_spark.sources import snapshots as snap

    ids = sorted({int(i) for i in doc_ids})
    if not ids:
        return {"index_keys_deleted": 0, "pair_rows_deleted": 0}
    id_list = ", ".join(str(i) for i in ids)
    _, n_idx = snap.delete_where_dv(
        spark,
        index_dir,
        f"{index_key} IN ({id_list})",
        key_col=index_key,
    )
    a, b = pair_cols
    _, n_pairs = snap.delete_where(
        spark,
        pairs_dir,
        f"{a} IN ({id_list}) OR {b} IN ({id_list})",
    )
    return {"index_keys_deleted": n_idx, "pair_rows_deleted": n_pairs}


def drift_monitor_committer(
    reference: DataFrame,
    monitor_dir: str,
    cols: list[str],
    bins: int = 10,
):
    """(batch_df, batch_id) function for a STREAMING drift monitor:
    every micro-batch is PSI-scored against the frozen ``reference``
    snapshot (operators/drift.py::drift_report — numeric columns via
    histogram bins, string/date columns via categorical frequencies)
    and the per-batch report appends to ONE snapshot table, ledgered
    by batch_id for exactly-once. The 100 TB ingest guard: "did
    today's files shift against the accepted baseline" becomes a
    queryable table that alerting reads with plain SQL, instead of a
    post-hoc batch job over the whole landing zone.

    Single-table protocol: one ledgered commit per batch — the simple
    end of the committer family (contrast dedup_index_committer's
    two-table ordering). A replayed batch re-computes the identical
    report (reference is frozen, the batch is the batch) and the
    ledger skip keeps the table append-exactly-once.
    """
    from mitoscape_spark.operators.drift import drift_report
    from mitoscape_spark.sources import snapshots as snap

    _ledger = _commit_ledger

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _ledger(monitor_dir):
            return
        report = drift_report(reference, batch_df, cols, bins=bins).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "col_name",
            "psi",
        )
        snap.commit(
            report, monitor_dir, mode="append", meta={"batch_id": batch_id}
        )

    return commit_batch


def stream_drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    monitor_dir: str,
    checkpoint: str,
    cols: list[str],
    bins: int = 10,
) -> StreamingQuery:
    """Streaming drift-monitor service: data in, a growing
    (batch_id, col_name, psi) report table out, exactly once."""
    return (
        stream.writeStream.foreachBatch(
            drift_monitor_committer(reference, monitor_dir, cols, bins)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def sketch_maintenance_committer(state_dir: str, build_fn, merge_fn):
    """(batch_df, batch_id) function maintaining a MERGEABLE sketch as
    a snapshot table: state_{n} = merge(state_{n-1}, build(batch_n)),
    one ledgered OVERWRITE commit per micro-batch. The always-on
    profile of a 100 TB ingest — frequency (Count-Min) or cardinality
    (HyperLogLog) answerable at any moment from a KB-scale table,
    without re-scanning the landing zone; history = per-batch sketch
    versions, time-travelable like any snapshot table.

    Exactly-once is what makes SUM-merged sketches (Count-Min) honest:
    a replayed batch merged twice would silently double-count — the
    batch_id ledger turns the replay into a no-op. (HLL's max-merge is
    idempotent and would survive replay anyway; the protocol covers
    both.) First batch bootstraps from the build alone; later batches
    read the LATEST committed state — safe against concurrent readers
    because snapshot versions are immutable until vacuum.
    """
    from mitoscape_spark.sources import snapshots as snap

    _ledger = _commit_ledger

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _ledger(state_dir):
            return
        delta = build_fn(batch_df)
        try:
            prev = snap.read(batch_df.sparkSession, state_dir)
            state = merge_fn(prev, delta)
        except (FileNotFoundError, ValueError):  # first batch
            state = delta
        snap.commit(
            state, state_dir, mode="overwrite",
            meta={"batch_id": batch_id},
        )

    return commit_batch


def stream_countmin(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> StreamingQuery:
    """Streaming Count-Min maintenance: rows in, the current frequency
    sketch out as a snapshot table, exactly once per micro-batch."""
    from mitoscape_spark.operators.countmin import (
        countmin_build,
        countmin_merge,
    )

    return (
        stream.writeStream.foreachBatch(
            sketch_maintenance_committer(
                state_dir,
                lambda b: countmin_build(b, key_col, width, depth),
                countmin_merge,
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_hll(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    p: int = 8,
) -> StreamingQuery:
    """Streaming HyperLogLog maintenance: the live distinct-count
    sketch as a snapshot table, register-wise max-merged per batch."""
    from mitoscape_spark.operators.hll import hll_merge, hll_registers

    return (
        stream.writeStream.foreachBatch(
            sketch_maintenance_committer(
                state_dir,
                lambda b: hll_registers(b, key_col, p),
                hll_merge,
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_bottomk_sample(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str,
    k: int = 100,
    salt: str = "bk",
) -> StreamingQuery:
    """Streaming uniform-sample maintenance: keep the k rows with the
    SMALLEST md5(salt || id) across everything ever seen — the
    bottom-k sketch, which IS a uniform sample without replacement
    (hash order is uniform) and, unlike reservoir sampling, is
    deterministic, engine-portable, and MERGEABLE (union → k smallest
    again). Rides the same exactly-once ledgered-overwrite protocol as
    stream_countmin/stream_hll; bottom-k is idempotent under replay,
    but the ledger still skips the wasted work."""

    def build(batch: DataFrame) -> DataFrame:
        keyed = batch.withColumn(
            "_hk",
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ),
        )
        return keyed.orderBy("_hk", id_col).limit(k)

    def merge(prev: DataFrame, delta: DataFrame) -> DataFrame:
        return (
            prev.unionByName(delta)
            .dropDuplicates([id_col])
            .orderBy("_hk", id_col)
            .limit(k)
        )

    return (
        stream.writeStream.foreachBatch(
            sketch_maintenance_committer(state_dir, build, merge)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )
