"""Local mirror of the driver's Spark-vs-DuckDB correctness gate.

For each declared query we run the Spark plan and the DuckDB oracle on
the same parquet tables, then compare row count, column names, and an
order-insensitive value hash (columns sorted by name, every row
canonicalized to a string, row-strings sorted, sha256 over the lot).
The driver does the same; keeping this in-repo gives a fast inner loop
(`python -m mitoscape_spark.verify --sf /root/testdata/sf0.01`).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb

from mitoscape_spark.catalog import TABLES, table_path


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return str(v)


def _hash_rows(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(_canon_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    cols_match: bool
    hash_match: bool

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.cols_match
            and self.hash_match
        )


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _driver_canon_gate(columns: list[str], rows: list[tuple]) -> None:
    """Reproduce the driver harness's pandas canonicalization step.

    The driver sorts results via ``pandas.DataFrame.sort_values`` over
    every column, which raises ``TypeError: unhashable type`` on
    array-typed cells.  Round 5's ``ext_bpe_tokens`` passed this
    module's tuple-based hash while erroring in the driver — running
    the same pandas path here makes that divergence impossible to
    mask (round-5 verdict item 1)."""
    import pandas as pd

    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=columns)
    pdf.sort_values(by=sorted(columns), kind="mergesort")


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    _driver_canon_gate(s_cols, s_rows)

    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    return CompareResult(
        name=name,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        cols_match=sorted(s_cols) == sorted(o_cols),
        hash_match=_hash_rows(s_cols, s_rows) == _hash_rows(o_cols, o_rows),
    )


def _check_one(spark, con, name: str, fn, sql, sf_dir: str) -> tuple[str, bool]:
    """One query's check → (report line, ok). Thread-safe: Spark job
    submission is concurrent by design; the caller hands each thread
    its own DuckDB cursor."""
    try:
        if sql is None:
            n = fn(spark, sf_dir).count()
            return f"{name}: rows-only check, {n} rows", True
        res = compare_query(spark, con, name, fn, sql, sf_dir)
    except Exception as exc:  # noqa: BLE001
        return f"{name}: ERROR {exc}", False
    status = "OK" if res.ok else "FAIL"
    return (
        f"{name}: {status} spark={res.spark_rows} oracle={res.oracle_rows} "
        f"cols={res.cols_match} hash={res.hash_match}",
        res.ok,
    )


def main() -> int:
    import argparse
    import os
    from concurrent.futures import ThreadPoolExecutor

    from mitoscape_spark.catalog import register_views
    from mitoscape_spark.queries import ORACLE, QUERIES
    from mitoscape_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument(
        "--jobs",
        type=int,
        default=min(8, os.cpu_count() or 1),
        help="concurrent query checks (1 = sequential). Spark actions "
        "are thread-safe and local[N] has idle cores at sf0.01 — "
        "overlapping the per-query driver/analysis/DuckDB time is "
        "where the wall-clock win is.",
    )
    args = ap.parse_args()

    spark = get_spark("verify")
    con = duckdb_connection(args.sf)
    # Pre-register temp views once so concurrent SQL-frontend queries
    # only re-put identical entries instead of racing first creation.
    register_views(spark, args.sf)

    todo = [
        (name, fn)
        for name, fn in QUERIES.items()
        if not args.only or name in args.only
    ]

    def run(item):
        name, fn = item
        # cursor() duplicates the connection, sharing the catalog —
        # DuckDB connections are not safe to share across threads
        with con.cursor() as cur:
            return _check_one(spark, cur, name, fn, ORACLE.get(name), args.sf)

    if args.jobs <= 1:
        results = [run(it) for it in todo]
    else:
        with ThreadPoolExecutor(max_workers=args.jobs) as pool:
            results = list(pool.map(run, todo))

    failures = 0
    for line, ok in results:  # stable declaration order
        print(line)
        failures += 0 if ok else 1
    print(f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
