"""Experiment harness: isolate bench regressions (not shipped in the gate).

Env toggles:
  EXP_CONCURRENT=0|1|N  serial, all-at-once, or N-thread pool
  SPARK_GRAFT_BUCKETED=0|1
  SPARK_GRAFT_AQE, SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_MAX_PARTITION_BYTES
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import threading
import time
from concurrent.futures import ThreadPoolExecutor


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    conc = os.environ.get("EXP_CONCURRENT", "1")

    from mitoscape_spark.catalog import load_table, register_layout_override
    from mitoscape_spark.queries.relational import QUERIES
    from mitoscape_spark.session import get_spark
    from mitoscape_spark.sources.bucketed import write_bucketed

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    aqe = os.environ.get("SPARK_GRAFT_AQE", "false")
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m")
    spark = get_spark(
        "exp_bench",
        extra_conf={
            "spark.sql.adaptive.enabled": aqe,
            "spark.sql.files.maxPartitionBytes": mpb,
            "spark.scheduler.mode": "FAIR",
            "spark.locality.wait": "0",
        },
    )

    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") != "0":
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed(li, "bench_lineitem", "l_orderkey", n_buckets=8)
        register_layout_override(spark, sf_dir, "lineitem", "bench_lineitem")

    def run_once(fn) -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def work(name, fn, timings):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        t0 = time.perf_counter()
        run_once(fn)
        timings[name] = time.perf_counter() - t0

    def run_round() -> tuple[float, dict]:
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        if conc == "0":
            for name, fn in QUERIES.items():
                work(name, fn, timings)
        elif conc == "1":
            ts = [
                threading.Thread(target=work, args=(n, f, timings))
                for n, f in QUERIES.items()
            ]
            [t.start() for t in ts]
            [t.join() for t in ts]
        else:
            with ThreadPoolExecutor(max_workers=int(conc)) as ex:
                futs = [
                    ex.submit(work, n, f, timings) for n, f in QUERIES.items()
                ]
                [f.result() for f in futs]
        return time.perf_counter() - t0, timings

    run_round()  # warm
    best = None
    best_t = None
    for _ in range(2):
        wall, t = run_round()
        if best is None or wall < best:
            best, best_t = wall, t
    print(
        json.dumps(
            {
                "conc": conc,
                "wall": round(best, 3),
                "sum": round(sum(best_t.values()), 3),
                "queries": {k: round(v, 3) for k, v in sorted(best_t.items())},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
