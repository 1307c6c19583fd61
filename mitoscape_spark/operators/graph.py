"""Iterative graph algorithms beyond connected components (which live
in operators/dedup.py next to their dedup use-case): PageRank over an
edge DataFrame.

Scale shape per iteration: one join (edges ⋈ ranks on src — both
hash-partitioned on the node id) + one grouped sum on dst. Rank state
is |nodes| rows; edges never materialize to the driver; per-round
lineage is truncated with localCheckpoint (same discipline as
connected_components — iterative Catalyst plans otherwise grow without
bound). Convergence is an L1 delta computed as a 1-row aggregate —
the only driver-side scalar per round.

Dangling nodes (no out-edges) donate their damped mass uniformly, the
standard stochastic-matrix correction, so ranks sum to 1 every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, rank) for every node appearing in ``edges`` (directed)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(max_iter):
        contrib = (
            e.join(ranks, e["s"] == ranks["id"])
            .join(out_deg, "s")
            .select("d", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks["id"] == out_deg["s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .head()[0]
        )
        new_ranks = (
            nodes.join(contrib, nodes["id"] == contrib["d"], "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            ranks.join(new_ranks.withColumnRenamed("rank", "r2"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("r2"))))
            .head()[0]
        )
        ranks = new_ranks
        if delta < tol:
            break
    return ranks.select("id", F.round("rank", 8).alias("rank"))
