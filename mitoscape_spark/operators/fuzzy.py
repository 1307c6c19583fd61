"""Fuzzy matching / record linkage: blocked Levenshtein pairs.

All-pairs edit distance is O(n²·len²) — never viable. The standard
linkage shape: a cheap **blocking key** (here: first token; phonetic or
prefix keys slot in the same way) turns the cross product into
per-block products via an equi-join, then the JVM ``levenshtein``
filters inside the block. At 100 TB the blocks shuffle-partition
evenly and AQE splits oversized (hot) blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(col: Column | str) -> Column:
    return F.split(F.col(col) if isinstance(col, str) else col, " ")[0]


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_distance: int = 1,
    max_distance: int = 3,
    block: Column | None = None,
) -> DataFrame:
    """(id_a, id_b, dist): pairs within the same block whose edit
    distance lies in [min_distance, max_distance] (min_distance=1
    excludes exact duplicates — exact dedup is a hash groupBy, not an
    edit-distance problem)."""
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        (block if block is not None else first_token_block(text_col)).alias(
            "blk"
        ),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.txt", "b.txt").alias("dist"),
        )
        .where(F.col("dist").between(min_distance, max_distance))
    )
