"""Count the Spark JOBS a declared query runs, end to end.

Round-12 evidence tool for the action-floor work (r11 verdict items
3–4): the serial cost of an action-driven query is dominated by its
job count (driver round-trip + DAG scheduling per job), which explain
dumps cannot show — construction-time actions (stage counts, gate
probes, driver finishers) never appear in the final plan. This probe
runs each query under its own job group and reports how many jobs the
group accumulated: construction actions AND the final noop sink.

Usage:
    python tools/job_count_probe.py --queries ext_funnel,ext_multimodal_dedup \
        [--sf /root/testdata/sf0.01] [--time]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()

    m = re.search(r"sf([0-9.]+)", args.sf)
    sf = float(m.group(1)) if m else -1.0
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "8" if sf <= 0.5 else "32"
    )
    # mirror the bench session (see bench.py): AQE off at bench SFs —
    # its per-stage re-plan materializations are themselves jobs and
    # would drown the action count the probe exists to measure
    aqe = os.environ.get("SPARK_GRAFT_AQE", "false" if sf <= 0.5 else "true")

    from mitoscape_spark.queries import QUERIES as ALL_QUERIES
    from mitoscape_spark.session import get_spark

    spark = get_spark(
        "job_count_probe",
        extra_conf={
            "spark.sql.adaptive.enabled": aqe,
            "spark.locality.wait": "0",
        },
    )
    sc = spark.sparkContext
    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    for name in names:
        fn = ALL_QUERIES[name]
        # warm pass (JIT/codegen/possible lazy inits) outside the group
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        line = f"{name}: jobs={len(jobs)}"
        if args.time:
            line += f" warm_noop={dt:.3f}s"
        print(line, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
