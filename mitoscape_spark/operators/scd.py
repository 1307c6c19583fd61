"""Slowly-changing-dimension Type 2 maintenance as one relational pass.

``merge_into`` (sources/snapshots.py) is SCD Type 1 — update in place,
history lost. Type 2 keeps every version with a validity interval:
``(key, tracked..., effective_from, effective_to, is_current)``. This
module applies a change batch in a single null-safe full-outer join over
CURRENT rows only:

- key only in dim      → current row passes through
- key in both, tracked columns identical (null-safely) → pass through
  (no-op changes must NOT mint new versions — that's version churn that
  turns a 100-row update into a dimension that doubles every load)
- key in both, differs → close the current row (``effective_to = batch``,
  ``is_current = 0``) AND emit the new version
- key only in changes  → brand-new member, open at ``batch``

Historical (``is_current = 0``) rows never enter the join — they union
through untouched. At scale history dwarfs the current slice, so the
shuffle cost tracks |current| + |changes|, not table size; materialize
the dimension partitioned by ``is_current`` (snapshot layer) and the
rewrite touches only the current partition.

Batch ids are caller-supplied monotonic ints (a load-job sequence
number), keeping the operator deterministic and the oracle
SQL-expressible — wall-clock stamps would make every run differ.

No reference counterpart (the reference's writeback is a filtered copy,
`MTClassify.scala:182-204`); this is the warehouse-dimension primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin

SCD2_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(snapshot: DataFrame, batch_id: int = 0) -> DataFrame:
    """Open version 0 of every row of an initial snapshot."""
    return snapshot.select(
        "*",
        F.lit(batch_id).alias("effective_from"),
        F.lit(None).cast("int").alias("effective_to"),
        F.lit(1).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_id: int,
) -> DataFrame:
    """Apply one change batch (``key_cols + tracked_cols``) to an SCD2
    dimension. Keys must be unique WITHIN a batch — a duplicated key is
    an upstream bug this operator cannot adjudicate (it would emit one
    open version per duplicate); dedupe or aggregate the feed first
    (``profile.check_unique`` is the pre-flight)."""
    data_cols = [c for c in dim.columns if c not in SCD2_COLS]
    history = dim.where(F.col("is_current") == 0)
    current = dim.where(F.col("is_current") == 1)

    cur = current.alias("cur")
    # presence on each side of the full-outer join needs a column that is
    # non-null iff the row exists — data/key columns are nullable (and a
    # struct of nulls is still non-null), so plant literal markers
    chg = changes.select(*data_cols).withColumn(
        "_chg", F.lit(1)
    ).alias("chg")
    on = None
    for k in key_cols:
        clause = F.col(f"cur.{k}").eqNullSafe(F.col(f"chg.{k}"))
        on = clause if on is None else on & clause
    # §20 pin: the unchanged/closed/opened branches each consume this
    # full-outer join — without the checkpoint it executes three times
    joined = cur.join(chg, on, "full_outer").transform(pin)

    in_dim = F.col("cur.is_current").isNotNull()
    in_chg = F.col("chg._chg").isNotNull()
    differs = F.lit(False)
    for t in tracked_cols:
        differs = differs | ~F.col(f"cur.{t}").eqNullSafe(F.col(f"chg.{t}"))

    unchanged = joined.where(in_dim & (~in_chg | ~differs)).select("cur.*")
    closed = (
        joined.where(in_dim & in_chg & differs)
        .select("cur.*")
        .withColumn("effective_to", F.lit(batch_id))
        .withColumn("is_current", F.lit(0))
    )
    opened = (
        joined.where(in_chg & (~in_dim | differs))
        .select(*[F.col(f"chg.{c}").alias(c) for c in data_cols])
        .select(
            "*",
            F.lit(batch_id).alias("effective_from"),
            F.lit(None).cast("int").alias("effective_to"),
            F.lit(1).alias("is_current"),
        )
    )
    out_cols = data_cols + list(SCD2_COLS)
    return (
        history.select(*out_cols)
        .unionByName(unchanged.select(*out_cols))
        .unionByName(closed.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )
