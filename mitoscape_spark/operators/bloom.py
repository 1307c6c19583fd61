"""Portable Bloom-filter runtime join filter.

The 100 TB pattern: a selective dimension predicate should prune the
fact-table scan BEFORE the shuffle — Spark's own runtime filters do
this opportunistically; this operator is the explicit, engine-portable
form. Build a KB-scale bit array over the build-side keys (one compact
aggregate), ship it to every executor as a literal array (exactly how
Spark broadcasts its InSubqueryExec/bloom runtime filters), and probe
map-side: fact rows whose key cannot be in the build set never enter
the join shuffle.

Portability contract: positions come from ``md5(i || ':' || key)``
(the repo's cross-engine hash primitive, sampling.py), words hold
63 usable bits (bit 63 never set — DuckDB range-checks ``<<`` into the
sign bit, and avoiding it keeps every word positive in both engines),
so a DuckDB oracle can recompute the EXACT same filter — including its
false positives — and hash-match the probe statistics.

False positives do not affect join correctness (the exact join still
runs on the survivors); they only cost wasted shuffle rows. With k=3
hashes and m bits, FP ≈ (1 − e^(−3n/m))³ — size m ≥ ~15n for sub-1%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63  # keep the sign bit clear in both engines


def _position(key: Column, i: int, m_bits: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % m_bits
    )


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 4032, k: int = 3
) -> list[int]:
    """Aggregate the build side into a ``ceil(m_bits/63)``-word bit
    array (driver-side list — the deliberate KB-scale state a runtime
    filter ships). One scan, one tiny groupBy(word) bit_or."""
    if m_bits % BITS_PER_WORD:
        raise ValueError(f"m_bits must be a multiple of {BITS_PER_WORD}")
    n_words = m_bits // BITS_PER_WORD
    key = F.col(key_col)
    entries = F.array(
        *[
            F.struct(
                (_position(key, i, m_bits) / BITS_PER_WORD)
                .cast("long")
                .alias("w"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (_position(key, i, m_bits) % BITS_PER_WORD).cast(
                        "int"
                    ),
                ).alias("m"),
            )
            for i in range(k)
        ]
    )
    rows = (
        df.where(key.isNotNull())
        .select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.w").alias("w"))
        .agg(F.expr("bit_or(e.m)").alias("mask"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[int(r["w"])] = int(r["mask"])
    return words


def bloom_might_contain(
    key_col: str, words: list[int], m_bits: int = 4032, k: int = 3
) -> Column:
    """Map-side membership test against a built filter — a pure scalar
    expression (literal array lookup + bit tests), usable inside any
    ``where`` before a join shuffle."""
    key = F.col(key_col)
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for i in range(k):
        pos = _position(key, i, m_bits)
        word = F.element_at(
            arr, ((pos / BITS_PER_WORD).cast("int") + F.lit(1))
        )
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (pos % BITS_PER_WORD).cast("int"),
        )
        cond = cond & ((word.bitwiseAND(mask)) != 0)
    return cond


def bloom_join_stats(
    build: DataFrame,
    build_key: str,
    probe: DataFrame,
    probe_key: str,
    m_bits: int = 4032,
    k: int = 3,
) -> DataFrame:
    """Audit row for a bloom-prefiltered join: how many probe rows the
    filter passes vs how many truly match — (n_probe, n_pass, n_true,
    n_false_pos). The observability query that justifies (or vetoes)
    enabling the filter for a given build predicate."""
    # (round-11 A/B: a §20 pin here LOST 1.10→1.23 s — the distinct is
    # cheap next to the bloom agg and the pin serializes the two
    # branches. Left unpinned on evidence.)
    keys = build.select(F.col(build_key).alias("_bk")).distinct()
    words = build_bloom(keys, "_bk", m_bits=m_bits, k=k)
    flagged = (
        probe.where(F.col(probe_key).isNotNull())
        .withColumn(
            "_pass",
            bloom_might_contain(probe_key, words, m_bits=m_bits, k=k),
        )
        .join(
            F.broadcast(keys.withColumn("_hit", F.lit(1))),
            F.col(probe_key) == F.col("_bk"),
            "left",
        )
    )
    t = F.col("_hit").isNotNull()
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.col("_pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(t.cast("long")).cast("long").alias("n_true"),
        F.sum((F.col("_pass") & ~t).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
    )
