"""Skyline (Pareto-frontier) queries, distributed.

A row is on the 2-D skyline (minimizing both ``x`` and ``y``) iff no
other row is <= on both coordinates and < on at least one. The naive
form is an O(n²) NOT-EXISTS anti-join (the oracle we check against);
the classic sweep is: sort by x, keep a row iff its y beats the
running minimum over all strictly-smaller x.

Scale shape — the sweep's running minimum is a global-ORDER-BY window
(single partition). We decompose exactly like ``ranking.global_rank``:

1. groupBy x → per-x minimum y (one shuffle, one row per distinct x);
2. ``orderstats.running_prefix(strict=True)`` gives each x the minimum
   y over all SMALLER x via range buckets + a driver-side exclusive
   scan of the tiny bucket table;
3. broadcast-join the per-x verdict back to the full table.

Ties: rows that coincide with another row on BOTH coordinates do not
dominate each other — all copies of a frontier point survive, matching
the NOT-EXISTS oracle semantics exactly.

The frontier-verdict join broadcasts: a 2-D skyline has at most one
point per distinct x and is monotone in y, so it is dimension-table
sized for any realistic distribution. Fully anti-correlated data (every
x-group on the frontier) degrades to distinct-x size — swap the
broadcast for a plain equi-join if that describes your data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.operators.orderstats import running_prefix


def skyline_2d(
    df: DataFrame, x: str, y: str, n_buckets: int = 64
) -> DataFrame:
    """Rows not dominated when minimizing ``(x, y)`` jointly.

    To maximize a coordinate, pass its negation as a column upstream.
    NULL coordinates never reach the frontier (excluded, as in the SQL
    oracle where comparisons with NULL are never true both ways).
    """
    clean = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    per_x = clean.groupBy(x).agg(F.min(y).alias("_gy"))
    swept = running_prefix(
        per_x, x, {"_pm": ("_gy", "min")}, n_buckets=n_buckets,
        strict=True,
    )
    # frontier x-groups: best y here must strictly beat every smaller
    # x's best y (a tie at smaller x dominates: <= on y, < on x)
    frontier = swept.where(
        F.col("_pm").isNull() | (F.col("_gy") < F.col("_pm"))
    ).select(x, "_gy")
    return (
        clean.join(F.broadcast(frontier), on=x, how="inner")
        .where(F.col(y) == F.col("_gy"))
        .drop("_gy")
        .select(df.columns)
    )
