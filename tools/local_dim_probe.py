"""Serial-floor shave probe (round-6 verdict item 4).

The 2-job serial queries each pay one extra ~26 ms job launch for the
broadcast-side materialization (PERF.md §10). Two candidate levers:

* q09-class (tiny parquet dim broadcast): serve the dim as a driver-
  local relation (``catalog.register_local_override``) — the broadcast
  then collects LocalTableScan rows with NO job.
* q03/q04-class (filtered-fact broadcast): force the shuffle join
  (``autoBroadcastJoinThreshold=-1``) — one job with an extra shuffle
  stage instead of two jobs.

This probe measures both on a warmed bench-shaped session: per-variant
job count (statusTracker job groups) and serial wall (min of N).

Usage: python tools/local_dim_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from mitoscape_spark.catalog import (
        load_table,
        register_local_override,
        register_layout_override,
    )
    from mitoscape_spark.queries.relational import QUERIES
    from mitoscape_spark.session import get_spark
    from mitoscape_spark.sources.bucketed import write_bucketed

    spark = get_spark(
        "local-dim-probe",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.scheduler.mode": "FAIR",
            "spark.locality.wait": "0",
        },
    )
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(li, "bench_lineitem", "l_orderkey", n_buckets=8)
    register_layout_override(spark, sf_dir, "lineitem", "bench_lineitem")

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str) -> None:
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    def probe(name: str, tag: str) -> dict:
        run(name)  # warm: JIT + codegen + footer cache
        group = f"{tag}-{name}"
        sc.setJobGroup(group, tag)
        run(name)
        sc.setJobGroup(None, None)
        n_jobs = len(tracker.getJobIdsForGroup(group))
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(name)
            walls.append(time.perf_counter() - t0)
        return {"jobs": n_jobs, "wall_min": round(min(walls), 4)}

    out: dict[str, dict] = {}
    targets = ["q03", "q04", "q08", "q09", "q13"]
    for q in targets:
        out[f"{q}/default"] = probe(q, "default")

    # lever 1: driver-local nation dim (q09's broadcast side)
    n = register_local_override(spark, sf_dir, "nation")
    out["nation_rows"] = n
    out["q09/local-dim"] = probe("q09", "localdim")

    # lever 2: no broadcast → single job with shuffle stages
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for q in ("q03", "q04"):
        out[f"{q}/no-broadcast"] = probe(q, "nobcast")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
