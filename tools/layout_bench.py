"""Parquet layout microbenchmark: compression codec tradeoffs and the
small-files tax, measured (not assumed) — results recorded in PERF.md.

Usage: python tools/layout_bench.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from mitoscape_spark.session import get_spark  # noqa: E402


def dir_mb(p: str) -> float:
    return sum(f.stat().st_size for f in Path(p).rglob("*") if f.is_file()) / 1e6


def timed_scan(spark, path: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/layout_bench")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = get_spark(app_name="layout-bench")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").cache()
    li.count()

    results = {}
    for codec in ["snappy", "zstd", "gzip", "none"]:
        path = str(work / f"li_{codec}")
        t0 = time.perf_counter()
        li.repartition(8).write.option("compression", codec).parquet(path)
        write_s = time.perf_counter() - t0
        results[codec] = {
            "write_s": round(write_s, 3),
            "size_mb": round(dir_mb(path), 2),
            "scan_s": round(timed_scan(spark, path), 3),
        }

    # small-files tax: 500 tiny files vs compacted
    many = str(work / "li_many")
    li.repartition(500).write.parquet(many)
    few = str(work / "li_compacted")
    from mitoscape_spark.sources.layout import compact_table

    n = compact_table(spark, many, few, target_file_mb=64)
    results["small_files"] = {
        "files_many": 500,
        "scan_many_s": round(timed_scan(spark, many), 3),
        "files_compacted": n,
        "scan_compacted_s": round(timed_scan(spark, few), 3),
    }

    # z-order vs linear sort: fraction of parquet row groups a range
    # predicate on the SECOND clustering column must scan (footer
    # min/max stats via pyarrow — deterministic, no timing noise)
    from mitoscape_spark.sources.layout import zorder_layout

    zpath = str(work / "li_zorder")
    lpath = str(work / "li_linear")
    zorder_layout(li, ["l_orderkey", "l_partkey"], n_files=8).write.option(
        "parquet.block.size", 1 << 20
    ).parquet(zpath)
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.option("parquet.block.size", 1 << 20).parquet(lpath)

    import pyarrow.parquet as pq

    lo, hi = li.selectExpr(
        "min(l_partkey)", "max(l_partkey)"
    ).first()
    qlo, qhi = lo, lo + (hi - lo) * 0.1  # 10%-of-domain predicate

    def groups_hit(path: str) -> tuple[int, int]:
        hit = total = 0
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(len(md.schema))
            }["l_partkey"]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.min <= qhi and st.max >= qlo:
                    hit += 1
        return hit, total

    zh, zt = groups_hit(zpath)
    lh, lt = groups_hit(lpath)
    results["zorder_rowgroup_pruning"] = {
        "predicate": "l_partkey in lowest 10% of domain",
        "zorder_groups_scanned": f"{zh}/{zt}",
        "linear_groups_scanned": f"{lh}/{lt}",
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
