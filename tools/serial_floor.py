"""Serial-mode floor decomposition (round-4 verdict item 4).

For each headline query (Q01–Q15, warmed, serial) this splits wall-clock
into:

* ``exec``  — the union of the query's Spark *job windows* (submission →
  completion from the REST status API, overlaps merged): time the DAG
  scheduler + executors are actually working.
* ``floor`` — ``wall − exec``: driver-side fixed cost outside any job —
  Py4J round-trips, Catalyst analysis/optimization, noop-writer setup,
  inter-job gaps. This is the component that is INVARIANT in data size
  and amortizes to zero at 100 TB (PERF.md §10).

It also times each query's DuckDB oracle (warm, min-of-3, serial —
DuckDB's best mode) on the same parquet so the per-query claim "no
query exceeds 2× DuckDB on execution (not floor)" is checked by data.

Usage:  python tools/serial_floor.py [sf_dir]   (default sf0.1)
Prints a per-query table and one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _rest_jobs(ui_url: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/jobs", timeout=10
    ) as r:
        return json.load(r)


def _merged_window_sec(jobs: list[dict]) -> float:
    """Union length of [submission, completion] intervals (overlapping
    jobs — e.g. concurrent file-listing jobs — must not double-count)."""
    from datetime import datetime

    def ts(s: str) -> float:
        # Spark REST format: 2026-08-14T21:00:00.123GMT
        return datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()

    spans = sorted(
        (ts(j["submissionTime"]), ts(j["completionTime"]))
        for j in jobs
        if j.get("completionTime")
    )
    total, cur_lo, cur_hi = 0.0, None, None
    for lo, hi in spans:
        if cur_hi is None or lo > cur_hi:
            if cur_hi is not None:
                total += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    if cur_hi is not None:
        total += cur_hi - cur_lo
    return total


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    sys.path.insert(0, _REPO)
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from mitoscape_spark.catalog import load_table, register_layout_override
    from mitoscape_spark.queries.relational import QUERIES
    from mitoscape_spark.session import get_spark
    from mitoscape_spark.sources.bucketed import write_bucketed

    spark = get_spark(
        "serial-floor",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.locality.wait": "0",
            # the status REST API is the measurement instrument here
            "spark.ui.enabled": "true",
        },
    )
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(li, "bench_lineitem", "l_orderkey", n_buckets=8)
    register_layout_override(spark, sf_dir, "lineitem", "bench_lineitem")

    sc = spark.sparkContext
    ui_url = sc.uiWebUrl
    app_id = sc.applicationId

    def run(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warm pass (JIT + codegen + footer cache), same as bench.py
    for fn in QUERIES.values():
        run(fn)

    # the job WINDOW of a data-free job = pure task-launch/scheduling
    # cost inside a job (serialize tasks, launch, collect statuses);
    # subtracting n_jobs × this from a query's exec window isolates
    # actual data work for the tiny queries
    empties = []
    for _ in range(5):
        group = f"floor-empty-{time.monotonic_ns()}"
        sc.setJobGroup(group, "empty")
        spark.range(1).write.format("noop").mode("overwrite").save()
        sc.setJobGroup("", "")
        jobs = [
            j
            for j in _rest_jobs(ui_url, app_id)
            if j.get("jobGroup") == group
        ]
        empties.append(_merged_window_sec(jobs))
    empty_job = sorted(empties)[len(empties) // 2]

    rows = []
    for name, fn in QUERIES.items():
        best = None
        for _ in range(3):
            group = f"floor-{name}-{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            run(fn)
            wall = time.perf_counter() - t0
            sc.setJobGroup("", "")
            jobs = [
                j
                for j in _rest_jobs(ui_url, app_id)
                if j.get("jobGroup") == group
            ]
            exec_s = _merged_window_sec(jobs)
            if best is None or wall < best[0]:
                best = (wall, exec_s, len(jobs))
        rows.append(
            {
                "q": name,
                "wall": round(best[0], 4),
                "exec": round(best[1], 4),
                "exec_adj": round(
                    max(0.0, best[1] - best[2] * empty_job), 4
                ),
                "floor": round(best[0] - best[1], 4),
                "n_jobs": best[2],
            }
        )
    spark.stop()

    # DuckDB serial per-query (warm, min-of-3 — its best mode)
    import duckdb

    import __spark_entry__ as entry

    oracle = {
        k: v for k, v in entry.oracle_sql().items() if k.startswith("q")
    }
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck = {}
    for name, sql in sorted(oracle.items()):
        con.execute(sql).fetchall()  # warm
        best = min(
            _timed(con, sql) for _ in range(3)
        )
        duck[name] = round(best, 4)

    print(f"empty-job window: {empty_job*1000:.1f} ms")
    print(f"{'query':<6} {'wall':>7} {'exec':>7} {'exec_adj':>8} "
          f"{'floor':>7} {'jobs':>4} {'duck':>7} {'adj/duck':>8}")
    for r in rows:
        d = duck.get(r["q"], float("nan"))
        ratio = r["exec_adj"] / d if d and d > 0 else float("nan")
        print(
            f"{r['q']:<6} {r['wall']:>7.3f} {r['exec']:>7.3f} "
            f"{r['exec_adj']:>8.3f} {r['floor']:>7.3f} {r['n_jobs']:>4} "
            f"{d:>7.3f} {ratio:>8.2f}"
        )
    total_wall = sum(r["wall"] for r in rows)
    total_exec = sum(r["exec"] for r in rows)
    total_adj = sum(r["exec_adj"] for r in rows)
    total_floor = sum(r["floor"] for r in rows)
    print(
        f"TOTAL  wall={total_wall:.3f} exec={total_exec:.3f} "
        f"exec_adj={total_adj:.3f} floor={total_floor:.3f} "
        f"duck={sum(duck.values()):.3f}"
    )
    print(json.dumps({
        "empty_job_sec": round(empty_job, 4), "rows": rows,
        "duckdb": duck, "sf_dir": sf_dir,
    }))
    return 0


def _timed(con, sql: str) -> float:
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
