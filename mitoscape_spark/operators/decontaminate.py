"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard defense against train/test leakage in LLM data prep: a
training document is *contaminated* if it shares at least one n-token
shingle with any benchmark document. Implemented as an inverted-index
membership test — explode training docs to shingles, join against the
(distinct, typically small) benchmark shingle set, and aggregate hits
per document.

Scale shape: the benchmark side is eval suites — MB-scale against a
100 TB corpus — so its distinct shingle set is broadcast and the join
is map-side; the only shuffle is the per-doc hit-count aggregation
(and the final anti-join semi-filter in ``decontaminate``). Shingle
generation itself is JVM higher-order functions, no Python boundary
(see operators/dedup.py::shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.operators.dedup import shingles


def contamination_report(
    train: DataFrame, benchmark: DataFrame, shingle_size: int = 3
) -> DataFrame:
    """(doc_id, n_shared): distinct shingles each training doc shares
    with the benchmark set. Docs with no overlap are absent."""
    bench_sh = shingles(benchmark, shingle_size).select("shingle").distinct()
    train_sh = shingles(train, shingle_size)  # already distinct per doc
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    train: DataFrame, benchmark: DataFrame, shingle_size: int = 3
) -> DataFrame:
    """Training rows with zero shingle overlap with the benchmark set."""
    contaminated = contamination_report(train, benchmark, shingle_size)
    return train.join(contaminated, "doc_id", "left_anti")
