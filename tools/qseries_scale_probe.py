"""Q-series scale probe at 10x bench scale (round-9 verdict item 4).

The heavy extension operators all carry measured scaling exponents
(tools/scale_probe.py, tools/ann_scale_probe.py, PERF.md §15/§22);
the headline Q01–Q15 had only ever run up to sf0.1. This probe derives
a 10x corpus from the driver-generated sf0.1 tables (same discipline
as spill_probe/scale_probe: we must not synthesize unrelated data and
cannot write /root/testdata) and records per-query wall-clock at 1x
and 10x plus the fitted exponent log10(t10/t1).

Corpus derivation — copy k (k = 1..9) offsets every JOIN KEY by
k·10⁹ consistently across tables, so each copy is a disjoint
isomorphic slice of the original: join degrees, group sizes, and
per-key densities are all preserved (the right shape for a scaling
probe — verbatim copies without key offsets would multiply join
fan-out 10x per key and measure a different query):

* lineitem   — l_orderkey/l_partkey/l_suppkey offset
* orders     — o_orderkey/o_custkey offset
* customer   — c_custkey offset (c_nationkey kept: dims-to-nation
               degree is what actually grows with SF in TPC-H)
* supplier   — s_suppkey offset
* part       — p_partkey offset
* events     — event_id/user_id offset (q13's per-user interval
               density per copy unchanged)
* documents  — doc_id offset (q14 explodes tokens; identical text per
               copy keeps the token distribution)
* nation / region — fixed-size dimensions, copied as-is

Expectations: the bucketed/zero-exchange and scan-rooted plans should
come in at exponent ≈ 1 or below (sf0.1 timings are dominated by the
fixed per-query scheduling floor, so sub-linear readings mean
floor-amortization, not magic). An exponent > 1.2 is the signal this
probe exists to catch — an AQE plan-flip or join-strategy change at
larger inputs.

Usage:
    python tools/qseries_scale_probe.py [--factor 10] [--rounds 2]
        [--out-json /tmp/qseries_scale.json]

Prints a markdown table to stderr and ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_BASE = "/root/testdata/sf0.1"
_OUT = os.path.join(_REPO, ".scale_probe")

# join/id keys to offset per table; everything else is carried as-is
_KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
_FIXED_DIMS = ["nation", "region"]
_OFFSET = 1_000_000_000


def _synthesize(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from mitoscape_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    for table, keys in _KEY_COLS.items():
        src = load_table(spark, _BASE, table)
        parts = [src]
        for k in range(1, factor):
            copy = src
            for col in keys:
                copy = copy.withColumn(col, F.col(col) + k * _OFFSET)
            parts.append(copy)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        print(f"  {table}: x{factor} written", file=sys.stderr)
    for table in _FIXED_DIMS:
        load_table(spark, _BASE, table).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


def _time_query(fn, spark, sf_dir: str, rounds: int) -> float:
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()
    # validate BEFORE the expensive corpus synthesis: --factor 1 makes
    # the exponent denominator log(1)=0 and --rounds 0 yields None
    # timings (round-9 review finding 5)
    if args.factor < 2:
        ap.error("--factor must be >= 2 (exponent is log-ratio based)")
    if args.rounds < 1:
        ap.error("--rounds must be >= 1")

    from mitoscape_spark.queries.relational import QUERIES
    from mitoscape_spark.session import get_spark

    spark = get_spark("qseries-scale-probe")

    big_dir = os.path.join(_OUT, f"q{args.factor}x")
    if not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
        print(f"synthesizing {args.factor}x corpus ...", file=sys.stderr)
        _synthesize(spark, args.factor, big_dir)

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None

    results: dict[str, dict] = {}
    print(
        f"| query | t@1x (s) | t@{args.factor}x (s) | exponent |",
        file=sys.stderr,
    )
    print("|---|---|---|---|", file=sys.stderr)
    for name, fn in QUERIES.items():
        _time_query(fn, spark, _BASE, 1)  # warm plan shape + codegen
        t1 = _time_query(fn, spark, _BASE, args.rounds)
        t10 = _time_query(fn, spark, big_dir, args.rounds)
        exp = math.log(t10 / t1) / math.log(args.factor)
        results[name] = {
            "t1": round(t1, 3),
            f"t{args.factor}": round(t10, 3),
            "exponent": round(exp, 2),
        }
        print(
            f"| {name} | {t1:.3f} | {t10:.3f} | {exp:.2f} |",
            file=sys.stderr,
        )

    out = {
        "factor": args.factor,
        "rounds": args.rounds,
        "base": _BASE,
        "loadavg_start": load1,
        "queries": results,
        "worst_exponent": max(
            (r["exponent"], n) for n, r in results.items()
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out_json:
        with open(args.out_json, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
