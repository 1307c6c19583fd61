"""Bucketed (binned) interval joins — the big-big scale path for range
predicates (reference J6's intended semantics, SURVEY.md §2.3: alignment
position ∈ NUMT [start, end]; pipeline.numt handles the tiny-dimension
case with a broadcast).

A raw range join between two fact tables degenerates to a broadcast
nested loop (O(n·m) comparisons). The standard rewrite: quantize the
range dimension into fixed-width buckets, explode each interval onto
every bucket it overlaps (a cheap generate — intervals/bucket_width is
small), map each point to its single bucket, then **equi-join** on
(equi_keys..., bucket) with the exact range predicate as a residual.
Catalyst plans a shuffled hash / sort-merge join on the bucket key, so
both sides partition evenly and nothing is broadcast or nested-looped.

Bucket-width choice at scale: width ≈ the typical interval length keeps
the explode factor ≈ 2 while maximizing bucket selectivity; AQE's skew
split handles hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BOUNDS = {
    "both": (">=", "<="),
    "left": (">=", "<"),
    "right": (">", "<="),
    "neither": (">", "<"),
}


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: int = 3600,
    closed: str = "both",
    how: str = "inner",
) -> DataFrame:
    """Join every point to the intervals containing it.

    ``point_col``/``start_col``/``end_col`` must be numeric (epoch
    seconds for time — cast with ``F.unix_timestamp`` upstream); column
    names across the two inputs must be disjoint apart from
    ``equi_keys``, which are matched by name. ``closed`` picks bound
    inclusivity ('both'|'left'|'right'|'neither').

    Plan: generate buckets on the interval side (explode factor
    ≈ interval_len / bucket_width + 1), single bucket per point, then an
    equi-join on (equi_keys, bucket) with the range check as residual.
    """
    lo_op, hi_op = _BOUNDS[closed]
    equi_keys = equi_keys or []

    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ),
    )
    residual = F.expr(
        f"{point_col} {lo_op} {start_col} AND {point_col} {hi_op} {end_col}"
    )
    return p.join(i, on=[*equi_keys, "_bucket"], how=how).where(
        residual
    ).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    equi_keys: list[str] | None = None,
    bucket_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join overlapping interval pairs ([ls,le] ∩ [rs,re] ≠ ∅, closed
    bounds) — both sides explode onto their buckets; the equi-join on
    the shared bucket meets every overlapping pair at least once, and a
    containment-anchor dedup condition keeps exactly one meeting:
    the pair is emitted only in the bucket holding max(ls, rs).
    """
    equi_keys = equi_keys or []
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / F.lit(bucket_width)),
                F.floor(F.col(left_end) / F.lit(bucket_width)),
            )
        ),
    )
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bucket_width)),
                F.floor(F.col(right_end) / F.lit(bucket_width)),
            )
        ),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    anchor = F.col("_bucket") == F.floor(
        F.greatest(F.col(left_start), F.col(right_start))
        / F.lit(bucket_width)
    )
    return (
        l.join(r, on=[*equi_keys, "_bucket"], how=how)
        .where(overlap & anchor)
        .drop("_bucket")
    )


def coverage_depth(
    df: DataFrame, start_col: str, end_col: str, n_buckets: int = 64
) -> DataFrame:
    """Interval coverage depth: for integer intervals [start, end]
    (end inclusive), the number of intervals covering each position —
    reported at every breakpoint (the depth is constant between
    breakpoints). The genomics per-position read-depth operator
    (bedtools genomecov over NUMT/alignment intervals —
    MTClassifierModel.scala's interval table is the reference's use of
    this shape) and equally the "concurrent open orders/sessions over
    time" OLAP question.

    The classic sweep is sort-all-events + running sum — a global
    window. Here: explode each interval to (+1 at start, −1 at end+1)
    events (a flatMap), reduce per position (one hash agg), and take
    the inclusive running sum through ``orderstats.running_prefix`` —
    cost scales with distinct breakpoints, never a single-task sort.
    """
    from mitoscape_spark.operators.orderstats import running_prefix

    events = (
        df.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) >= F.col(start_col))
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).cast("long").alias("pos"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        (F.col(end_col).cast("long") + 1).alias("pos"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e")
        )
        .select(F.col("e.pos").alias("pos"), F.col("e.delta").alias("d"))
    )
    per_pos = events.groupBy("pos").agg(F.sum("d").alias("_d"))
    return running_prefix(
        per_pos, "pos", {"_depth": ("_d", "sum")}, n_buckets=n_buckets
    ).select("pos", F.col("_depth").cast("long").alias("depth"))
