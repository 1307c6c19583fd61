"""Session-3 scale-headroom probe: the heaviest NEW queries at 1x/2x/5x
the bench scale, same derived-input methodology as tools/scale_probe.py
(its _synthesize is imported and reused). Prints one JSON line for
PERF.md."""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BASE = "/root/testdata/sf0.1"
_OUT = os.path.join(_REPO, ".scale_probe")


def _time_query(fn, spark, sf_dir: str, n_rounds: int = 2) -> float:
    best = None
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    sys.path.insert(0, _REPO)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_probe import _synthesize

    from mitoscape_spark.queries.extensions import (
        ext_association_rules,
        ext_dedup_threshold_sweep,
        ext_distance_histogram,
        ext_minhash_accuracy,
        ext_negative_sampling,
    )
    from mitoscape_spark.session import get_spark

    spark = get_spark("scale-probe-s3")
    dirs = {1: _BASE}
    for mult in (2, 5):
        d = os.path.join(_OUT, f"x{mult}")
        if not os.path.exists(f"{d}/lineitem.parquet"):
            print(f"synthesizing x{mult} ...", file=sys.stderr)
            _synthesize(spark, mult, d)
        dirs[mult] = d

    queries = {
        "ext_distance_histogram": ext_distance_histogram,
        "ext_dedup_threshold_sweep": ext_dedup_threshold_sweep,
        "ext_minhash_accuracy": ext_minhash_accuracy,
        "ext_association_rules": ext_association_rules,
        "ext_negative_sampling": ext_negative_sampling,
    }
    results = {}
    for name, fn in queries.items():
        _time_query(fn, spark, dirs[1], n_rounds=1)  # warm
        t = {m: round(_time_query(fn, spark, d), 3) for m, d in dirs.items()}
        exp = math.log(t[5] / t[1]) / math.log(5)
        results[name] = {"t": t, "exponent": round(exp, 2)}
        print(f"{name}: {t}  exponent={exp:.2f}", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
