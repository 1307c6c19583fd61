"""Count-Min sketch: mergeable approximate frequencies in fixed space.

The streaming/distributed counterpart of a full frequency table: a
``depth × width`` grid of counters where every key increments one
counter per row (position = seeded hash), and a key's estimate is the
MINIMUM of its ``depth`` counters. Guarantees: estimates never
UNDER-count, and over-count by at most ``e·N/width`` with probability
``1 − e^−depth`` (N = stream length). The exact-heavy-hitters operator
(operators/heavyhitters.py) answers "which keys are big" exactly;
CMS answers "how big is ANY key" in O(depth·width) space — and two
sketches over disjoint data MERGE by cell-wise addition, which is what
makes it a per-partition / per-day rollup primitive at 100 TB.

Positions come from the repo's portable md5 primitive
(``md5(d || ':' || key)`` → 13 hex digits → % width), so a DuckDB
oracle recomputes the sketch — including its collisions — exactly.

Plan shape: build is one generate (depth entries/row, a flatMap — no
shuffle) + one hash agg into ≤ depth·width rows; estimates broadcast
the KB-scale sketch and probe map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(key, d: int, width: int):
    h = F.md5(F.concat(F.lit(f"{d}:"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % width
    ).cast("int")


def countmin_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Sketch the frequency of ``key_col``: returns (d, pos, c) rows,
    at most ``depth × width`` of them, cell-wise addable with any other
    sketch built with the same (width, depth)."""
    if width < 2 or depth < 1:
        raise ValueError("countmin_build: width >= 2 and depth >= 1")
    key = F.col(key_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _position(key, d, width).alias("pos"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(key.isNotNull())
        .select(F.explode(entries).alias("e"))
        .groupBy(
            F.col("e.d").alias("d"), F.col("e.pos").alias("pos")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shape sketches — the rollup step."""
    return (
        a.unionByName(b)
        .groupBy("d", "pos")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Frequency estimate per probe key: min over the key's ``depth``
    cells (absent cell = 0). The sketch broadcasts (≤ depth·width
    rows); probes join map-side."""
    key = F.col(key_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _position(key, d, width).alias("pos"),
                )
                for d in range(depth)
            ]
        )
    ).alias("e")
    return (
        probes.where(key.isNotNull())
        .select(key_col, cells)
        .join(
            F.broadcast(sketch),
            (F.col("e.d") == sketch["d"])
            & (F.col("e.pos") == sketch["pos"]),
            "left",
        )
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(sketch["c"], F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def countmin_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimation WITHOUT executing the join: for two
    same-shape sketches over join-key streams, the AMS/CMS estimator
    |A ⋈ B| ≈ min_d Σ_pos cA[d][pos]·cB[d][pos] — an upper-biased
    estimate of Σ_v fA(v)·fB(v) that two KB-scale tables answer where
    the true number needs the full shuffle. The query-planning
    primitive (join reordering, skew pre-detection) and the capacity
    check before materializing a blowup-prone join.

    Returns one row (cms_join_size,). Cost: a ≤ depth·width equi-join.
    """
    return (
        a.select("d", "pos", F.col("c").alias("_ca"))
        .join(
            b.select("d", "pos", F.col("c").alias("_cb")),
            ["d", "pos"],
        )
        .groupBy("d")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
        .agg(F.min("_dot").cast("long").alias("cms_join_size"))
    )
