"""Partitioned parquet layout — the data-layout half of the 100 TB
story (bucketing in sources.bucketed is the join half).

``write_partitioned`` lays data out hive-style (one directory per
partition value); reads that filter on the partition column never list,
open, or scan non-matching partitions (PartitionFilters in the plan,
asserted in tests/test_scale_ops.py). Choose LOW-cardinality columns
(date, lang, source) — one directory + ≥1 file per value; high-
cardinality keys belong in bucketing instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> DataFrame:
    """Z-order (Morton) layout: cluster rows so parquet row-group
    min/max stats prune on ANY of ``cols``, not just the leading sort
    key. This is what table formats call OPTIMIZE ZORDER BY, built from
    primitives: rank each column to a bounded integer, interleave bits
    JVM-side, then range-partition + sort by the z-value before write.

    A plain ``orderBy(a, b)`` gives perfect pruning on ``a`` and none
    on ``b``; the z-curve spreads locality across dimensions, so a
    filter on ``b`` alone still skips most row groups. At 100 TB this
    is the difference between scanning one dimension's slice and
    scanning everything for the second predicate.

    ``bits`` per dimension (default 16 → capped by bucket count below)
    bounds rank resolution; ties within a quantile are fine — pruning
    works at row-group granularity. Ranks come from QuantileDiscretizer
    (distributed approxQuantile + Bucketizer): a scalar agg per column,
    NO global single-partition window anywhere.
    """
    from pyspark.ml.feature import QuantileDiscretizer
    from pyspark.sql import functions as F

    bits = min(bits, 10)  # 1024 quantile buckets per dim is plenty
    zparts = [f"_rank_{i}" for i in range(len(cols))]
    # ONE multi-column fit = one quantile pass over the data; a
    # per-column loop costs k full scans (and re-executes earlier
    # Bucketizers inside later fits' lineage)
    disc = QuantileDiscretizer(
        inputCols=list(cols),
        outputCols=zparts,
        numBucketsArray=[1 << bits] * len(cols),
        relativeError=1.0 / (1 << (bits + 2)),
        handleInvalid="keep",
    )
    ranked = disc.fit(df).transform(df)
    for r in zparts:
        ranked = ranked.withColumn(r, F.col(r).cast("long"))

    # Rescale every rank to the full bit width: a low-cardinality
    # column fills fewer buckets than requested (duplicate splits
    # collapse), and unscaled its high bits would be constant zero —
    # the z-value would degenerate to highest-cardinality-column-first.
    scale = (1 << bits) - 1
    maxes = ranked.agg(*[F.max(r).alias(r) for r in zparts]).first()
    for r in zparts:
        ranked = ranked.withColumn(
            r, (F.col(r) * scale / max(1, maxes[r])).cast("long")
        )

    # interleave via the ONE shared Morton implementation (a second
    # inline copy with different bit-significance order was a
    # maintenance trap — a curve fix in one place silently skipped
    # the other)
    z = interleave_bits([F.col(r) for r in zparts], bits)
    return (
        ranked.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *zparts)
    )


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 512,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite ``path`` into files of roughly
    ``target_file_mb`` each. The 100 TB chronic disease this treats:
    streaming appends and over-parallel writes leave thousands of tiny
    files per partition; every downstream scan then pays listing +
    open + footer-parse per file, and the scheduler pays one task per
    file. Compaction is a full rewrite (no shuffle beyond a coalesce-
    style repartition), sized from the *actual on-disk bytes*.

    Returns the number of output files requested. Production notes:
    run per-partition (pass ``partition_cols`` to keep layout), write
    to a new path then swap — never in place over live readers.
    """
    import math

    sc = spark.sparkContext
    # on-disk size via Hadoop FS (works for local and HDFS-style URIs)
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    size_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if partition_cols:
        # colocate each partition value's rows: a plain round-robin
        # repartition feeding a dynamic partitionBy opens up to
        # n_files x |partition values| files — re-creating the
        # small-files disease this function treats
        df = df.repartition(n_files, *partition_cols)
        writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(out_path)
    return n_files


# --------------------------------------------------------------------
# Morton key as a reusable column expression (oracle-checkable variant)
# --------------------------------------------------------------------
# ``zorder_layout`` above ranks via distributed quantiles (skew-robust,
# ml-pipeline dependency); the functions below build the same curve
# from global min/max bucketing with PURE column expressions — cheaper
# (one 1-row agg), deterministic across engines, and exposed as a key
# column so external oracles (ext_zorder) can verify bit-for-bit.

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


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
    (first column owns the most-significant bit of each group)."""
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
        bucketize(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), n_bits)
        for c in cols
    ]
    return with_stats.withColumn(
        out_col, interleave_bits(buckets, n_bits)
    ).drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def zorder_layout_minmax(
    df: DataFrame,
    cols: list[str],
    n_bits: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Rows re-clustered along the min/max-bucketed Z-curve, key
    dropped — the expression-only twin of ``zorder_layout`` for
    uniform-ish columns where quantile ranking is overkill."""
    keyed = zorder_key(df, cols, n_bits)
    parts = (
        keyed.repartitionByRange(n_partitions, "zval")
        if n_partitions
        else keyed.repartitionByRange("zval")
    )
    return parts.sortWithinPartitions("zval").drop("zval")
