"""As-of join — for every left row, the single nearest right row at or
before (backward) / at or after (forward) its timestamp (brief's
canonical custom-operator example; absent from both the reference and
Spark's built-ins).

The naive plan (join on key + time-range, then keep rank-1 per left
row) amplifies rows by the per-key right-side history. The merge
pattern here is the scale path: UNION both sides tagged by origin, one
window per key ordered by time, and carry the nearest right-side row
forward (`F.last(ignorenulls=True)`) — each left row then holds exactly
the nearest qualifying right row. One shuffle, one sort, zero row
amplification, works at any right-side density.

Row atomicity: the right row's payload (and its match time) travels as
ONE struct, not per-column carries. Independent per-column
``last(ignorenulls=True)`` would resurrect an OLDER row's value for any
column that is NULL in the nearest row — silently stitching together a
row that never existed (the packed-parallel-state desync class,
SCALE.md §13). The struct is non-null exactly when the right row
exists, so NULL payload fields pass through faithfully.

Tie rules: a right row AT the left row's timestamp matches in both
directions (inclusive); right rows sharing (key, time) resolve to the
greatest ``tiebreak`` (deterministic). ``tolerance`` (in the time
column's native units; seconds for timestamps) nulls the payload when
the matched row is farther than the bound — pandas ``merge_asof``
parity, evaluated AFTER the merge so it's a free column predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: all ``left`` columns + the nearest ``payload``
    columns from ``right`` (null when no right row qualifies). ``on``
    is the equi-key (same name both sides)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    def _to_num(col):
        # seconds-as-double for every temporal type (TIMESTAMP_NTZ has
        # no direct numeric cast; route through TIMESTAMP — the session
        # is pinned to UTC so the detour is lossless), native value for
        # numerics
        kind = right.schema[right_time].dataType.typeName()
        if kind in ("timestamp", "timestamp_ntz", "date"):
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    lcols = left.columns
    null_pack = F.lit(None).cast(
        "struct<" + ",".join(
            ["_mt:double"]
            + [
                f"_p_{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload
            ]
        ) + ">"
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != on],
        null_pack.alias("_pack"),
        F.lit(None).cast("long").alias("_tb"),
    )
    # pandas merge_asof parity on NULL keys: a right row with no
    # timestamp can never be "nearest" — drop it before the union
    # (otherwise it sorts to the front of the window and its non-null
    # packed struct is carried as a phantom match for left rows with no
    # real predecessor — round-3 advice).
    r = right.where(F.col(right_time).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on],
        F.struct(
            _to_num(F.col(right_time)).alias("_mt"),
            *[F.col(c).alias(f"_p_{c}") for c in payload],
        ).alias("_pack"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
    )
    # iteration order puts the MATCHING right row last before each left
    # row: right rows sort before left rows at equal time (inclusive
    # match); among right rows at equal time the greatest tie-break is
    # seen last and wins the carry
    # null-time LEFT rows must match nothing: sort them before every
    # right row so the carry they see is null. asc() already puts nulls
    # first; desc() defaults to nulls LAST (a null-time left row would
    # inherit the earliest right row) — force nulls first.
    t_order = (
        F.col("_t").asc_nulls_first()
        if direction == "backward"
        else F.col("_t").desc_nulls_first()
    )
    w = (
        W.partitionBy("_k")
        .orderBy(t_order, F.col("_is_left").asc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = (
        l.unionByName(r)
        .select("*", F.last("_pack", ignorenulls=True).over(w).alias("_hit"))
        .where(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        gap = (
            _to_num(F.col("_t")) - F.col("_hit._mt")
            if direction == "backward"
            else F.col("_hit._mt") - _to_num(F.col("_t"))
        )
        merged = merged.withColumn(
            "_hit", F.when(gap <= F.lit(float(tolerance)), F.col("_hit"))
        )
    return merged.select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[F.col(f"_hit._p_{c}").alias(c) for c in payload],
    )
