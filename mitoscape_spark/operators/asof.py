"""As-of join — for every left row, the single most recent right row
at or before its timestamp (brief's canonical custom-operator example;
absent from both the reference and Spark's built-ins).

The naive plan (join on key + time-range, then keep rank-1 per left
row) amplifies rows by the per-key right-side history. The merge
pattern here is the scale path: UNION both sides tagged by origin, one
window per key ordered by (time, origin, tie-break), and carry the last
right-side payload forward (`F.last(ignorenulls=True)`) — each left row
then holds exactly the latest right row ≤ its time. One shuffle, one
sort, zero row amplification, works at any right-side density.

Tie rules: a right row AT the left row's timestamp matches (inclusive);
right rows sharing (key, time) resolve to the greatest ``tiebreak``
(deterministic).
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
) -> DataFrame:
    """Left as-of join: all ``left`` columns + the latest ``payload``
    columns from ``right`` with right_time ≤ left_time (null when no
    right row precedes). ``on`` is the equi-key (same name both sides).
    """
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in payload],
        F.lit(None).cast("long").alias("_tb"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
    )
    # right rows sort before left rows at equal time (inclusive ≤);
    # among right rows at equal time, the greatest tie-break wins
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_is_left", "_tb")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload
        ],
    )
    return merged.where(F.col("_is_left") == 1).select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[F.col(f"_asof_{c}").alias(c) for c in payload],
    )
