"""Join-based MERGE / upsert / CDC-apply — the mutation surface of an
append-only lake without a table format.

Spark has no in-place UPDATE on parquet; the scalable pattern is a
*rewrite merge*: join the snapshot with the change set and write the
next snapshot. That is exactly what table formats (Delta/Iceberg) do
under MERGE INTO — here it is expressed directly in DataFrame algebra
so it runs on plain parquet.

Scale shape: one join keyed on the merge keys. The change set is
usually tiny next to the snapshot, so Catalyst broadcasts it and the
snapshot is never shuffled; a worst-case full-size change set degrades
to a sort-merge join, which is still a single co-partitioned pass. The
anti-join + union form never compares non-key columns, so wide rows
stream through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """WHEN MATCHED THEN UPDATE (source row wins), WHEN NOT MATCHED
    THEN INSERT. Target rows with no source match pass through."""
    untouched = target.join(
        source.select(*keys).distinct(), keys, "left_anti"
    )
    return source.select(*target.columns).unionByName(untouched)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """CDC apply: ``changes`` carries an op column — 'D' deletes the
    key, 'I'/'U' upserts the row. Delete-then-upsert in one pass: all
    change keys are anti-joined out of the target, then the upsert rows
    are appended.

    An op outside {D, I, U} — including NULL — RAISES. The previous
    ``op != 'D'`` form silently DELETED such rows (NULL != 'D' is NULL
    → dropped from upserts, while the key anti-join still removed the
    target row): a malformed feed must stop the apply, not erase data.
    The guard rides the op column itself so column pruning can't
    optimize it away on the key-only anti-join branch."""
    guarded_op = F.when(
        F.col(op_col).isin("D", "I", "U"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("apply_changes: unknown CDC op: "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    checked = changes.withColumn(op_col, guarded_op)
    # the upsert branch's filter evaluates the guarded op for EVERY
    # change row (filters are never pruned), so bad rows raise even
    # though the key-only anti-join branch never reads the op
    upserts = checked.where(F.col(op_col) != "D").drop(op_col)
    untouched = target.join(
        changes.select(*keys).distinct(), keys, "left_anti"
    )
    return upserts.select(*target.columns).unionByName(untouched)
