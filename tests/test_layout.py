"""Z-order layout (sources/layout.py): Morton key correctness and
multi-dimension file-stat locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from mitoscape_spark.sources.layout import zorder_key, zorder_layout_minmax


def _morton2(x: int, y: int, n_bits: int) -> int:
    z = 0
    for i in range(n_bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    n = 1 << 4  # full 4-bit grid: 256 points, values == bucket ids
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["zval"]
        for r in zorder_key(df, ["x", "y"], n_bits=4).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton2(x, y, 4), (x, y, z)


def test_degenerate_constant_column_is_safe(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], "x int, y int")
    out = zorder_key(df, ["x", "y"], n_bits=4)
    assert out.count() == 10  # no div-by-zero on span 0
    assert out.where(F.col("zval") < 0).count() == 0


def test_zorder_files_are_tight_in_both_dimensions(spark, tmp_path):
    """Versus a single-column sort: per-partition spread of the SECOND
    column must shrink dramatically under z-order."""
    import random

    random.seed(7)
    rows = [
        (random.randrange(10_000), random.randrange(10_000))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "a int, b int")

    def avg_spread(layout_df, col):
        spread = (
            layout_df.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg((F.max(col) - F.min(col)).alias("s"))
            .agg(F.avg("s").alias("avg"))
            .head()["avg"]
        )
        return spread

    z = zorder_layout_minmax(df, ["a", "b"], n_bits=8, n_partitions=16)
    lin = df.repartitionByRange(16, "a").sortWithinPartitions("a")

    # single-column sort: b is unclustered, spread ~ full 10k range
    assert avg_spread(lin, "b") > 8_000
    # z-order: both dimensions land in compact hyper-rectangles
    assert avg_spread(z, "a") < 5_000
    assert avg_spread(z, "b") < 5_000
    # and nothing was lost or duplicated
    assert z.count() == df.count()
