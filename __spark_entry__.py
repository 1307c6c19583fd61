"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()``   — every implemented operator (SURVEY.md §2) as
                  callable(spark, sf_dir) -> DataFrame.
``oracle_sql()``— matching DuckDB SQL per query name; names omitted
                  here get a rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session conventions to a driver-owned session.

    The driver may hand us a bare SparkSession; replicate the configs
    that affect semantics (UTC timestamps, nanos-as-long parquet reads,
    Arrow) — see mitoscape_spark.session for rationale.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # bare sessions default to 200 shuffle partitions — far too many for
    # the sf0.001/sf0.01 correctness corpora; AQE coalesces either way,
    # but a right-sized initial count avoids the empty-task overhead
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # static conf on some builds; catalog handles fallback
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation.

    Scan (pruned) → filter (pushed down) → broadcast dim join →
    partial+final hash agg → order. The shape of the reference's hot
    path (filter → dim join → per-key agg; SURVEY.md §3.1) on the
    synthetic corpus.
    """
    from mitoscape_spark.catalog import load_table

    _configure(spark)
    sf_dir = "/root/testdata/sf0.001"
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.where(F.col("o_totalprice") > 50000)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("n_name")
    )


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_configure(spark), sf_dir)

    return run


def _checked_in_prior_rounds() -> set[str]:
    """Names with ANY recorded verdict in a CORRECTNESS_r*.json.

    The driver checks a capped prefix of queries(); ordering
    never-driver-checked entries first guarantees every query gets a
    driver-recorded verdict across rounds instead of re-checking the
    same 50.  A recorded rows-only verdict (``err == "no_oracle"`` with
    rows observed) counts as checked — only names the driver has never
    touched at all go to the front (round-3 verdict defect #1: counting
    only ``rows_match=true`` recycled the 9 rows-only names every round).
    """
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    errored: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                report = json.load(fh)
        except Exception:  # malformed report — ignore, order is best-effort
            continue
        for name, res in report.items():
            if not isinstance(res, dict):
                continue
            seen.add(name)
            # a hard ERROR (err set and not the documented rows-only
            # marker) is not a verdict — re-queue so the fixed query
            # gets a real driver check (round-5: ext_bpe_tokens)
            err = res.get("err")
            if err and err != "no_oracle":
                errored.add(name)
            else:
                errored.discard(name)  # later round superseded the error
    return seen - errored


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mitoscape_spark.queries import QUERIES

    prior = _checked_in_prior_rounds()
    # never-driver-checked first; within those, the MitoScape-parity
    # pipeline (mito_*) leads — 67 unchecked > the driver's 50-cap, so
    # the parity queries must not land in the spill tail
    ordered = sorted(
        QUERIES,
        key=lambda name: (
            name in prior,
            not name.startswith("mito_"),
            # within unchecked, plain TPC-H SQL shapes are lowest-risk
            # (pure declarative, locally hash-green) — let them take the
            # >50-cap spill slots over novel operators
            name.startswith("ext_sql_"),
        ),
    )
    return {name: _wrap(QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    from mitoscape_spark.queries import ORACLE

    return dict(ORACLE)
