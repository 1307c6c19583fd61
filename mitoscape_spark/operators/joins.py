"""Join-strategy control surface: explicit physical-strategy selection
where Catalyst's default is wrong for a workload the caller knows
better (reference strategy background: every Spark deployment guide;
the hints themselves are public Spark API — BROADCAST, MERGE,
SHUFFLE_HASH, SHUFFLE_REPLICATE_NL).

Why an engine surface and not ad-hoc hints at call sites: each helper
documents WHEN its strategy wins at scale, and the plan tests pin that
the hint actually lands (EnsureRequirements and AQE can silently
override a mis-specified hint — a comment saying "this broadcasts" is
worthless; an assertion on the physical plan is not).

The strategies, by workload:
- broadcast_join: dim ≤ a few hundred MB. No shuffle of the fact side
  at all; the dim ships once per executor. The default choice for
  star-schema dims; wrong when the "dim" can grow unboundedly.
- merge_join: both sides huge, both must shuffle anyway, output feeds
  a sort-consuming op (window, sort-merge downstream); sorted runs
  spill gracefully — the safe default for fact⋈fact.
- shuffle_hash_join: both sides shuffle, but the build side is small
  PER PARTITION (fits memory after partitioning) — skips the sort,
  beats SMJ when the build side is modest and the probe side enormous;
  loses badly if the build side skews past executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mitoscape_spark.pins import pin


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """fact ⋈ broadcast(dim) — zero fact-side shuffle."""
    from pyspark.sql import functions as F

    return fact.join(F.broadcast(dim), on, how)


def merge_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Sort-merge join, pinned with the MERGE hint: the spill-safe
    fact⋈fact strategy (sorted runs stream from disk)."""
    return left.hint("merge").join(right.hint("merge"), on, how)


def shuffle_hash_join(
    probe: DataFrame, build: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Shuffled hash join with ``build`` as the hash side: skips SMJ's
    sorts when the build side is small per partition. The caller
    asserts the build side's per-partition size discipline."""
    return probe.join(build.hint("shuffle_hash"), on, how)


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    top: int = 10,
) -> DataFrame:
    """Pre-flight audit for an equi-join: exact per-key output
    contribution (|left_k| × |right_k|), hottest keys first, plus a
    TOTAL row (null key) — the question to ask BEFORE running a
    fact⋈fact join at 100 TB, answered by two cheap key-count aggs
    and a count-table join (shuffles carry one row per DISTINCT key,
    never the facts).

    Reading it: total ≫ max(|left|,|right|) means row amplification
    (salt, pre-aggregate, or rethink); one key holding most of the
    total means skew (AQE skew split or operators.skew salting).
    """
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    per_key = (
        lc.join(rc, keys)
        .withColumn("out_rows", F.col("n_left") * F.col("n_right"))
        # §20 pin: consumed by the TOTAL aggregate and the hottest-key
        # top-k — both key-count aggs + the join would run twice
        .transform(pin)
    )
    total = per_key.agg(
        *[F.lit(None).cast(per_key.schema[k].dataType).alias(k)
          for k in keys],
        F.sum("n_left").alias("n_left"),
        F.sum("n_right").alias("n_right"),
        F.sum("out_rows").alias("out_rows"),
    )
    hottest = (
        per_key.orderBy(F.col("out_rows").desc(), *keys).limit(top)
    )
    return hottest.unionByName(total)
