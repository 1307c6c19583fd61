"""Skew mitigation: salting for hot keys (brief: "salting for skew";
AQE's skew-join split handles *join* skew at runtime — salting is the
explicit plan-level tool for skewed AGGREGATIONS with non-algebraic
aggregates, and for joins on engines/paths where AQE can't help).

``salted_agg`` two-phase pattern: shard each hot key across
``n_salts`` sub-keys (random salt per row), partially aggregate per
(key, salt), then merge the shards. Works for any *algebraic*
aggregate list (sum/count/min/max — things with a merge step).

``salted_join`` replicates the small side per salt and salts the big
side's key, turning one hot partition into ``n_salts`` even ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. The salt is ``pmod(hash-ish random), but
    deterministic per row``: crc32 of the monotonic row id is avoided —
    we use a uniform random salt; aggregates listed here are
    merge-safe, so nondeterministic sharding does not change results.
    """
    merge_fn = {
        "sum": F.sum,
        "count": F.sum,
        "min": F.min,
        "max": F.max,
        # merge = concatenate the per-salt shards (order not guaranteed,
        # same as unsalted collect_list). MEASURED SLOWER than unsalted
        # for full-list materialization (PERF.md: the flatten
        # re-concentrates the hot key onto one task) — use only when
        # downstream consumes per-shard partials.
        "collect_list": lambda c: F.flatten(F.collect_list(c)),
    }
    phase1_fn = {
        "sum": F.sum,
        "count": F.count,
        "min": F.min,
        "max": F.max,
        "collect_list": F.collect_list,
    }
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[
            phase1_fn[fn](col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            merge_fn[fn](out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    onto every salt, join on (key, salt). Costs n_salts× the small side
    (still tiny) and splits each hot key across n_salts partitions.
    """
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    small_replicated = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return big_salted.join(
        small_replicated, on=[key, "_salt"], how=how
    ).drop("_salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnostic: the n heaviest keys and their row counts —
    run before choosing n_salts."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.col("rows").desc())
        .limit(n)
    )
