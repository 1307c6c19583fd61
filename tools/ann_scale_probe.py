"""Scale-headroom probe for the literal-quantizer ANN paths
(round-6 verdict item 6).

``ext_ann_pq_literal`` / ``ext_ann_ivfpq_literal`` are oracle-pinned at
sf0.01 only; this probe measures the SAME encode → ADC-table → (cell
prune) → top-k operator path at 1×/5×/10× the sf0.1 embeddings table
and fits the wall-clock exponent, so the ANN family has measured
scaling evidence like the rest of the heavy operators (PERF.md
headroom table). Expected shape: encode is one linear mapInPandas
pass, the ADC scan is linear in (pruned) rows, top-k is a per-partition
partial + tiny global — exponent ≈ 1.

Embeddings are derived exactly like tools/scale_probe.py: copy k
perturbs each coordinate with deterministic hash-seeded noise
(±0.35·span), killing copy↔source similarity while keeping the
dimension/scale profile. Only the embeddings table is synthesized —
these queries read nothing else.

Usage: python tools/ann_scale_probe.py
Writes parquet under <repo>/.scale_probe/emb_x{5,10}/ (gitignored) and
prints one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BASE = "/root/testdata/sf0.1"
_OUT = os.path.join(_REPO, ".scale_probe")

sys.path.insert(0, _REPO)


def _synthesize_embeddings(spark, mult: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from mitoscape_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    emb = load_table(spark, _BASE, "embeddings")
    eparts = [emb]
    for k in range(1, mult):
        noisy = F.expr(
            f"transform(embedding, (x, i) -> CAST(x + 0.35 * "
            f"((pmod(hash(vec_id, i, {k}), 2000) - 1000) / 1000.0) "
            f"AS FLOAT))"
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                noisy.alias("embedding"),
                "label",
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def _time_query(fn, spark, sf_dir: str, n_rounds: int = 2) -> float:
    best = None
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    from mitoscape_spark.queries.extensions import (
        ext_ann_ivfpq_literal,
        ext_ann_pq_literal,
    )
    from mitoscape_spark.session import get_spark

    spark = get_spark("ann-scale-probe")

    dirs = {1: _BASE}
    for mult in (5, 10):
        d = os.path.join(_OUT, f"emb_x{mult}")
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"synthesizing emb x{mult} ...", file=sys.stderr)
            _synthesize_embeddings(spark, mult, d)
        dirs[mult] = d

    results = {}
    for name, fn in (
        ("ext_ann_pq_literal", ext_ann_pq_literal),
        ("ext_ann_ivfpq_literal", ext_ann_ivfpq_literal),
    ):
        _time_query(fn, spark, dirs[1], n_rounds=1)  # warm plan shape
        t = {m: round(_time_query(fn, spark, d), 3) for m, d in dirs.items()}
        exp = math.log(t[10] / t[1]) / math.log(10)
        results[name] = {"t": t, "exponent": round(exp, 2)}
        print(f"{name}: {t}  exponent={exp:.2f}", file=sys.stderr)

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
