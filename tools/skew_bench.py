"""Skew-join microbenchmark: one hot key vs three mitigations.

Synthesizes a fact table where ~half of all rows share a single key
(the worst-case hot partition) plus a uniform tail, then joins it to a
dimension table too large to broadcast in the test config, three ways:

1. baseline    — sort-merge join, AQE skew handling OFF: the hot key's
                 partition serializes one straggler task.
2. aqe-skew    — AQE ON with skewJoin: runtime splits the oversized
                 partition into ~target-size chunks.
3. salted      — operators.skew.salted_join: plan-level sharding of the
                 hot key across n_salts sub-partitions (the tool for
                 engines/paths where AQE can't see the skew).

Prints one JSON line per variant; all three row counts must agree.
Results are recorded in PERF.md. Run:

    python tools/skew_bench.py [--rows 4000000] [--dim 200000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_session(skew_join: bool) -> SparkSession:
    b = (
        SparkSession.builder.master("local[32]")
        .appName(f"skew-bench-{skew_join}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", str(skew_join).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.memory", "8g")
    )
    return b.getOrCreate()


def synth(spark: SparkSession, n_rows: int, n_dim: int):
    """Fact: ~50% of rows on key 0, rest uniform over [1, n_dim).
    Dim: one row per key with a padded payload (defeats broadcast)."""
    fact = spark.range(n_rows).select(
        F.when(F.rand(seed=7) < 0.5, F.lit(0))
        .otherwise((F.rand(seed=11) * (n_dim - 1)).cast("long") + 1)
        .alias("k"),
        (F.rand(seed=13) * 100).alias("v"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("name"),
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    return fact, dim


def run_variant(variant: str, n_rows: int, n_dim: int) -> dict:
    spark = build_session(skew_join=(variant == "aqe-skew"))
    try:
        fact, dim = synth(spark, n_rows, n_dim)
        # warm: materialize inputs once so timing is the join, not codegen
        fact.count(), dim.count()
        t0 = time.perf_counter()
        if variant == "salted":
            from mitoscape_spark.operators.skew import salted_join

            joined = salted_join(fact, dim, "k", n_salts=32)
        else:
            joined = fact.join(dim, "k")
        n = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        ).collect()[0]["n"]
        dt = time.perf_counter() - t0
        return {"variant": variant, "sec": round(dt, 3), "rows": n}
    finally:
        spark.stop()


def run_agg_variant(variant: str, n_rows: int, n_dim: int) -> dict:
    """Aggregation skew: collect_list on a 50%-hot key. Partial
    aggregation can't reduce list buffers map-side, so the hot key's
    values all shuffle to one task. Salting shards the SHUFFLE+BUILD
    across n_salts tasks; the phase-2 flatten re-concentrates, so any
    win is bounded — measured, either way, not assumed."""
    spark = build_session(skew_join=False)
    try:
        fact, _ = synth(spark, n_rows, n_dim)
        fact.count()
        t0 = time.perf_counter()
        if variant == "agg-salted":
            from mitoscape_spark.operators.skew import salted_agg

            agged = salted_agg(
                fact, "k", {"vals": ("v", "collect_list")}, n_salts=32
            )
        else:
            agged = fact.groupBy("k").agg(F.collect_list("v").alias("vals"))
        n = (
            agged.select(F.sum(F.size("vals")).alias("total"))
            .collect()[0]["total"]
        )
        dt = time.perf_counter() - t0
        return {"variant": variant, "sec": round(dt, 3), "rows": n}
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=200_000)
    args = ap.parse_args()
    results = [
        run_variant(v, args.rows, args.dim)
        for v in ("baseline", "aqe-skew", "salted")
    ]
    results += [
        run_agg_variant(v, args.rows, args.dim)
        for v in ("agg-baseline", "agg-salted")
    ]
    for r in results:
        print(json.dumps(r))
    counts = {r["rows"] for r in results[:3]}
    assert len(counts) == 1, f"join row counts diverge: {results}"
    agg_counts = {r["rows"] for r in results[3:]}
    assert len(agg_counts) == 1, f"agg value counts diverge: {results}"


if __name__ == "__main__":
    main()
