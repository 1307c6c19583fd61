"""Plan-shaping helpers.

``ensure_min_parallelism`` — round-8 finding (PERF.md §23): the local
test corpora are single-file, SINGLE-ROW-GROUP parquet, and a parquet
row group is Spark's indivisible split unit — so every scan-rooted map
stage (shingle explosion + md5, Python mapInPandas decode) ran on ONE
task regardless of ``spark.sql.files.maxPartitionBytes``, leaving 31
of 32 cores idle until the first exchange. Operators whose map-side
work dominates (media synthesis/decode, shingling) opt in to an
explicit repartition-UP when — and only when — the incoming plan's
parallelism is below the cluster's core count.

100-TB posture: on any real layout (thousands of files / row groups)
``have >= want`` and this is a NO-OP — zero added exchanges, the
bucketed zero-Exchange plans keep their shape. It exists to rescue the
degenerate small-file case, which also appears in production as "one
ingest file landed hot" — there, shuffling the few rows that exist is
strictly better than serializing the expensive map work on one core.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# a SHUFFLE exchange ("Exchange hashpartitioning(...)", "Exchange
# rangepartitioning", "Exchange SinglePartition", ...) — deliberately
# NOT "BroadcastExchange": a broadcast-join plan's STREAM side can
# still be a single-row-group scan running as one task, exactly the
# degenerate case this helper exists to rescue (round-8 advice item 4).
# "ReusedExchange" is excluded too (round-9 advice item 2): a
# BroadcastExchange that Spark prints as a ReusedExchange node must not
# short-circuit the probe — the plan is still shuffle-free on the
# stream side. A reused SHUFFLE exchange cannot slip through: its
# ORIGINAL Exchange node is printed elsewhere in the same plan string
# (reuse references an existing subtree), and the ReusedExchange line
# itself restates the reused child ("ReusedExchange [...], Exchange
# hashpartitioning(...)"), which this pattern still matches.
_SHUFFLE_EXCHANGE = re.compile(r"(?<!Broadcast)(?<!Reused)Exchange\b")


def ensure_min_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ``df`` UP to ``min_partitions`` (default: the
    cluster's ``defaultParallelism``) when its current plan has fewer
    partitions; pass through untouched otherwise.

    Probe cost: with AQE enabled, ``df.rdd`` on a plan containing
    shuffle exchanges EXECUTES the upstream shuffle stages
    (AdaptiveSparkPlan finalization submits real jobs, and that work is
    then re-executed by the real action). So the probe runs only on
    SHUFFLE-FREE plans — checked from the physical plan string, a
    driver-side py4j call that launches nothing. A plan that already
    contains a shuffle exchange has ``spark.sql.shuffle.partitions``-
    grade parallelism downstream, so passing it through untouched is
    also the correct answer. A BroadcastExchange does NOT short-circuit
    the probe: the broadcast build side is tiny by definition, while
    the stream side may still be a one-task scan worth repartitioning
    (round-8 advice item 4). Streaming / un-plannable frames pass
    through unchanged.
    """
    spark = df.sparkSession
    want = min_partitions or spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if _SHUFFLE_EXCHANGE.search(plan):
            return df
        have = df.rdd.getNumPartitions()
    except Exception:  # streaming frame or exotic plan — leave it alone
        return df
    if have >= want:
        return df
    return df.repartition(want)
