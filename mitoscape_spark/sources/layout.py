"""Z-order (Morton-curve) data layout — multi-column data skipping.

Sorting a table by one column gives perfect file-level min/max pruning
on that column and none on any other. Interleaving the bits of several
columns' bucket ids into one Morton key and range-partitioning on it
gives GOOD pruning on ALL of them simultaneously — the public
Delta/Iceberg `OPTIMIZE ZORDER BY` design. At 100 TB this is a layout
(ingest/compaction-time) operator: pay one range shuffle once, then
every selective scan on any z-dimension skips most files.

Mechanics, all JVM-side column expressions (no UDFs):
1. each column is normalized to a ``2^n_bits``-bucket id from its
   global min/max (one 1-row aggregate, broadcast back). Uniform-width
   buckets, the same choice as width_bucket: heavy skew concentrates
   buckets but never breaks correctness — swap in quantile boundaries
   for pathological columns;
2. bucket bits interleave into the Morton key (static shift/mask
   expression tree, ``n_bits × n_cols`` terms, whole-stage codegen'd);
3. ``repartitionByRange`` on the key + ``sortWithinPartitions`` —
   each output file covers a compact Z-curve segment, i.e. a small
   hyper-rectangle of the column space, so its min/max stats are tight
   in EVERY dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, cmin: Column, cmax: Column, n_bits: int) -> Column:
    """Uniform bucket id in [0, 2^n_bits) from global [min, max]."""
    n = 1 << n_bits
    span = (cmax - cmin).cast("double")
    raw = F.floor(
        (col.cast("double") - cmin.cast("double"))
        / F.when(span > 0, span).otherwise(F.lit(1.0))
        * n
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def interleave_bits(bucket_cols: list[Column], n_bits: int) -> Column:
    """Morton key: bit i of column j lands at position i*k + (k-1-j)
    (first column owns the most-significant bit of each group, matching
    the usual z-order convention)."""
    k = len(bucket_cols)
    z: Column = F.lit(0).cast("long")
    for i in range(n_bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - j)))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], n_bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Append the Morton key column (global min/max via one tiny
    aggregate cross-joined back — broadcast, no per-row shuffle)."""
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = [
        bucketize(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), n_bits
        )
        for c in cols
    ]
    return with_stats.withColumn(
        out_col, interleave_bits(buckets, n_bits)
    ).drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_bits: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Rows re-clustered along the Z-curve, key dropped: write the
    result with any parquet sink and file-level stats prune on every
    ``cols`` member. One range shuffle — the layout cost."""
    keyed = zorder_key(df, cols, n_bits)
    parts = (
        keyed.repartitionByRange(n_partitions, "zval")
        if n_partitions
        else keyed.repartitionByRange("zval")
    )
    return parts.sortWithinPartitions("zval").drop("zval")
