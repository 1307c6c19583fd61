"""Portable HyperLogLog: mergeable distinct-count sketch whose every
bit a DuckDB oracle can recompute.

Spark ships DataSketches HLL (used by ``operators/incremental.py`` for
maintained view state) — but its binary sketches are opaque to any
other engine, so that surface is rows-only-checkable. This module is
the engine-portable twin: registers derive from ``md5(key)`` with the
rank (position of the first 1-bit) computed by HEX-STRING arithmetic —
count leading '0' hex chars, then a 4-way CASE on the first non-zero
digit — never ``floor(log2(w))``, whose libm rounding at power-of-two
boundaries is exactly the kind of last-ulp cross-engine disagreement
that breaks a hash gate. Every register value is therefore
bit-identical in Spark and DuckDB, and the estimate matches to the
output rounding.

Sketch: m = 2^p registers; key → register = first p/4 hex digits,
rank = leading-zero count of the next 13 hex digits (52 bits) + 1;
register keeps the MAX rank (a groupBy max — map-side combinable, and
two sketches merge by the same max, the rollup property). Estimate:
αm·m²/Σ2^−M with the standard small-range correction
E ≤ 2.5m ∧ V>0 → m·ln(m/V). Standard error ≈ 1.04/√m (~6.5% at p=8).

Plan shape: one scan → groupBy(register) max — the sketch is ≤ m rows
of driver-free state; the estimate is one aggregate over that tiny
table. At 100 TB: registers are the ONLY shuffled rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank of a hex suffix, via string ops only (see module docstring):
# 4·(leading '0' chars) + {1:3, 2-3:2, 4-7:1, 8-f:0}[first nonzero] + 1
_RANK_SQL = """
    CASE WHEN _stripped = '' THEN 53
         ELSE (LENGTH(_hex) - LENGTH(_stripped)) * 4
              + CASE WHEN SUBSTRING(_stripped, 1, 1) = '1' THEN 3
                     WHEN SUBSTRING(_stripped, 1, 1) IN ('2', '3')
                         THEN 2
                     WHEN SUBSTRING(_stripped, 1, 1)
                          IN ('4', '5', '6', '7') THEN 1
                     ELSE 0 END
              + 1 END
"""


def hll_registers(
    df: DataFrame, key_col: str, p: int = 8
) -> DataFrame:
    """(register, max_rank) sketch rows, at most 2^p of them. Sketches
    over disjoint (or overlapping — max is idempotent) data merge with
    ``hll_merge``."""
    if not 4 <= p <= 16 or p % 4:
        raise ValueError("hll_registers: p in {4, 8, 12, 16}")
    h = F.md5(F.col(key_col).cast("string"))
    hex_digits = p // 4
    prepared = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.conv(F.substring(h, 1, hex_digits), 16, 10)
            .cast("int")
            .alias("register"),
            F.substring(h, hex_digits + 1, 13).alias("_hex"),
        )
        .withColumn(
            "_stripped", F.expr("TRIM(LEADING '0' FROM _hex)")
        )
        .withColumn("rank", F.expr(_RANK_SQL).cast("int"))
    )
    return prepared.groupBy("register").agg(
        F.max("rank").alias("max_rank")
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max of two same-p sketches."""
    return (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row: (hll_est,) from a register sketch — the harmonic-mean
    estimator with the standard small-range (linear counting)
    correction. Rounded to 4 dp: the Σ2^−M partial sums may round
    differently across engines' summation orders (last-ulp only)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    s_all = F.col("_s") + (F.lit(m) - F.col("_n"))  # empty regs = 2^0
    v = F.lit(m) - F.col("_n")  # empty register count
    raw = F.lit(alpha * m * m) / s_all
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("hll_est"))


def hll_registers_grouped(
    df: DataFrame, group_col: str, key_col: str, p: int = 8
) -> DataFrame:
    """(group, register, max_rank): one HLL sketch per group — the
    approximate-COUNT-DISTINCT-per-group workhorse (distinct users per
    day, distinct tokens per source) in ≤ 2^p rows per group instead
    of a distinct-key shuffle. Same register math as the global
    sketch; merge across loads with a (group, register) max."""
    if not 4 <= p <= 16 or p % 4:
        raise ValueError("hll_registers_grouped: p in {4, 8, 12, 16}")
    h = F.md5(F.col(key_col).cast("string"))
    hex_digits = p // 4
    prepared = (
        df.where(
            F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("grp"),
            F.conv(F.substring(h, 1, hex_digits), 16, 10)
            .cast("int")
            .alias("register"),
            F.substring(h, hex_digits + 1, 13).alias("_hex"),
        )
        .withColumn(
            "_stripped", F.expr("TRIM(LEADING '0' FROM _hex)")
        )
        .withColumn("rank", F.expr(_RANK_SQL).cast("int"))
    )
    return prepared.groupBy("grp", "register").agg(
        F.max("rank").alias("max_rank")
    )


def hll_estimate_grouped(
    registers: DataFrame, p: int = 8
) -> DataFrame:
    """(grp, hll_est) per group from grouped register sketches — same
    estimator and small-range correction as ``hll_estimate``."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    s_all = F.col("_s") + (F.lit(m) - F.col("_n"))
    v = F.lit(m) - F.col("_n")
    raw = F.lit(alpha * m * m) / s_all
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select("grp", F.round(est, 4).alias("hll_est"))
