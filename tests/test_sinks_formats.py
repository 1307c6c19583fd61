"""Multi-format I/O round-trips and streaming sinks (partitioned append,
foreachBatch idempotent upsert)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table
from mitoscape_spark.sources.formats import read_table, write_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    src = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(50)
    )
    path = str(tmp_path / f"t_{fmt}")
    write_table(src, path, fmt=fmt)
    got = read_table(
        spark,
        path,
        fmt=fmt,
        schema=src.schema if fmt in ("csv", "json") else None,
    )
    assert got.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "pt")
    write_table(src, path, partition_by=["o_orderstatus"])
    # partition directories exist and a status filter prunes to one dir
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    got = read_table(spark, path).where(F.col("o_orderstatus") == "F")
    assert got.count() == src.where(F.col("o_orderstatus") == "F").count()


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
        path
    )


def test_upsert_sink_idempotent_merge(spark, tmp_path):
    from mitoscape_spark.streaming.sinks import upsert_to_parquet

    stream_dir = str(tmp_path / "in")
    _write_batch(spark, [(1, "a"), (2, "a"), (3, "a"), (4, "a")],
                 os.path.join(stream_dir, "b0"))
    _write_batch(spark, [(3, "b"), (4, "b"), (5, "b"), (6, "b")],
                 os.path.join(stream_dir, "b1"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    out = str(tmp_path / "snapshot")
    q = upsert_to_parquet(
        stream, out, str(tmp_path / "ckpt"), keys=["k"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = {r.k: r.v for r in spark.read.parquet(out).collect()}
    assert snap == {1: "a", 2: "a", 3: "b", 4: "b", 5: "b", 6: "b"}


def test_append_partitioned_sink(spark, tmp_path):
    from mitoscape_spark.streaming.sinks import append_partitioned

    stream_dir = str(tmp_path / "in")
    _write_batch(spark, [(1, "x"), (2, "y")], os.path.join(stream_dir, "b0"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    out = str(tmp_path / "landing")
    q = append_partitioned(
        stream, out, str(tmp_path / "ckpt2"), partition_cols=["v"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert any(d.startswith("v=") for d in os.listdir(out))
    assert spark.read.parquet(out).count() == 2


def test_compact_table_reduces_files(spark, tmp_path):
    from mitoscape_spark.sources.layout import compact_table

    src = load_table(spark, SF, "lineitem")
    many = str(tmp_path / "many")
    src.repartition(40).write.parquet(many)
    n_before = len([f for f in os.listdir(many) if f.endswith(".parquet")])
    assert n_before == 40
    out = str(tmp_path / "compacted")
    n_req = compact_table(spark, many, out, target_file_mb=64)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_req == 1 and n_after == 1  # tiny input -> one target file
    # content preserved
    assert spark.read.parquet(out).count() == src.count()


def test_zorder_layout_multi_dim_skipping(spark, tmp_path):
    """Z-order vs linear sort: per-file min/max spans of the SECOND
    dimension must be tighter under z-order (that's the data-skipping
    win); row content is unchanged."""
    from mitoscape_spark.sources.layout import zorder_layout

    src = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_layout(src, ["l_orderkey", "l_partkey"], n_files=8).write.parquet(
        zpath
    )
    src.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(lpath)

    # content preserved
    assert (
        sorted(map(tuple, spark.read.parquet(zpath).collect()))
        == sorted(map(tuple, src.collect()))
    )

    def file_spans(path, col):
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            r = (
                spark.read.parquet(os.path.join(path, f))
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .first()
            )
            spans.append(r.hi - r.lo)
        return spans

    domain = (
        src.agg((F.max("l_partkey") - F.min("l_partkey")).alias("d")).first().d
    )
    z_cover = sum(file_spans(zpath, "l_partkey")) / (8 * domain)
    lin_cover = sum(file_spans(lpath, "l_partkey")) / (8 * domain)
    # linear layout: every file spans ~the whole partkey domain (~1.0);
    # z-order: files cover distinctly less
    assert z_cover < lin_cover * 0.8, (z_cover, lin_cover)


def test_read_with_quarantine_splits_bad_json(spark, tmp_path):
    import os

    from mitoscape_spark.sources.formats import read_with_quarantine

    p = str(tmp_path / "land")
    os.makedirs(p)
    with open(os.path.join(p, "a.json"), "w") as f:
        f.write('{"id": 1, "v": 2.5}\n')
        f.write("this is not json at all\n")
        f.write('{"id": 2, "v": 3.5}\n')
        f.write('{"id": "NOT_A_NUMBER", "v": }\n')
    clean, quarantine = read_with_quarantine(
        spark, p, "id long, v double", fmt="json"
    )
    assert {r.id for r in clean.collect()} == {1, 2}
    bad = [r.raw for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)


def test_parquet_merge_schema_unions_columns(spark, tmp_path):
    import os

    from mitoscape_spark.sources.formats import read_parquet_merged_schema

    p = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(
        os.path.join(p, "batch=0")
    )
    spark.range(3, 6).selectExpr("id", "id * 3 AS b").write.parquet(
        os.path.join(p, "batch=1")
    )
    df = read_parquet_merged_schema(spark, p)
    assert {"id", "a", "b"}.issubset(set(df.columns))
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert rows[0] == (0, None)
    assert rows[5] == (None, 15)
