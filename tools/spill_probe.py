"""Spill / memory-pressure validation (round-7 verdict item 3).

Everything else in PERF.md is measured on a 128 GiB JVM where sf0.1
fits in memory many times over; the 100-TB reality is partitions that
do NOT fit and must spill. This probe runs the heaviest declared
queries on a FACTOR-x derived corpus inside a deliberately small JVM
(default: 4g driver — in local mode the driver heap IS the executor
heap) and records completion + spill/shuffle metrics from the Spark
status REST API.

Derived corpus: FACTOR perturbed copies of sf0.1 documents/embeddings
with shifted ids — copy k appends a per-copy token to each text (the
copies become a planted near-duplicate k-clique per source doc, which
is the WORST case for the pair/CC path: edge count scales k^2 per
clique, bounded by the minhash hot-bucket star guard) and offsets the
first embedding dim by k*1e-3 (keeps kNN candidates dense). Built
driver-side with pyarrow: this is test-data tooling, not an engine
surface.

Usage:
    python tools/spill_probe.py [--factor 10] [--memory 4g]
        [--out /tmp/spill_sf1] [--queries a,b,c]

Prints one markdown table row per query plus a final JSON line for
PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "ext_multimodal_dedup",
    "ext_knn_join",
    "ext_tfidf_pairs",
    "ext_dedup_near",
    "ext_leakage_safe_split",
]


def build_corpus(src: str, out: str, factor: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    d = docs.to_pydict()
    big = {k: [] for k in d}
    for k in range(factor):
        off = k * 10_000_000
        big["doc_id"].extend(x + off for x in d["doc_id"])
        if k == 0:
            big["text"].extend(d["text"])
        else:
            suffix = f" rev{k}"
            big["text"].extend(
                (t + suffix) if t is not None else None for t in d["text"]
            )
        big["lang"].extend(d["lang"])
        big["source"].extend(d["source"])
        big["n_chars"].extend(d["n_chars"])
    pq.write_table(
        pa.table(big, schema=docs.schema), os.path.join(out, "documents.parquet")
    )

    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    e = emb.to_pydict()
    bige = {k: [] for k in e}
    for k in range(factor):
        off = k * 10_000_000
        bige["vec_id"].extend(x + off for x in e["vec_id"])
        if k == 0:
            bige["embedding"].extend(e["embedding"])
        else:
            delta = k * 1e-3
            bige["embedding"].extend(
                ([v[0] + delta] + list(v[1:])) if v else v
                for v in e["embedding"]
            )
        bige["label"].extend(e["label"])
    pq.write_table(
        pa.table(bige, schema=emb.schema),
        os.path.join(out, "embeddings.parquet"),
    )
    # relational tables some query preambles touch: link unchanged
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        srcf = os.path.join(src, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(srcf) and not os.path.exists(dst):
            os.symlink(srcf, dst)


def stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )
    out = {"memSpill": 0, "diskSpill": 0, "shuffleWrite": 0, "input": 0}
    for s in stages:
        out["memSpill"] += s.get("memoryBytesSpilled", 0)
        out["diskSpill"] += s.get("diskBytesSpilled", 0)
        out["shuffleWrite"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spill_probe_sf1")
    ap.add_argument("--memory", default="4g")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--shuffle-partitions", default="64")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.out, "documents.parquet")):
        t0 = time.time()
        build_corpus(args.sf_src, args.out, args.factor)
        print(f"corpus built in {time.time() - t0:.1f}s -> {args.out}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("spill-probe")
        .config("spark.driver.memory", args.memory)
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    ui = spark.sparkContext.uiWebUrl
    heap = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    print(f"JVM max heap: {heap / 2**30:.2f} GiB (asked {args.memory}); ui={ui}")

    from mitoscape_spark.queries import QUERIES

    rows = []
    print("| query | completed | wall (s) | mem spill | disk spill | shuffle write |")
    print("|---|---|---|---|---|---|")
    for name in args.queries.split(","):
        name = name.strip()
        before = stage_totals(ui)
        t0 = time.time()
        ok, err = True, None
        try:
            QUERIES[name](spark, args.out).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 — record, don't crash probe
            ok, err = False, f"{type(exc).__name__}: {exc}"[:200]
        wall = time.time() - t0
        after = stage_totals(ui)
        d = {k: after[k] - before[k] for k in after}
        rows.append(
            {
                "query": name, "completed": ok, "wall_s": round(wall, 1),
                "mem_spill_bytes": d["memSpill"],
                "disk_spill_bytes": d["diskSpill"],
                "shuffle_write_bytes": d["shuffleWrite"],
                "error": err,
            }
        )
        gib = lambda b: f"{b / 2**30:.2f} GiB" if b else "0"
        print(
            f"| {name} | {'yes' if ok else 'NO: ' + str(err)} | {wall:.1f} "
            f"| {gib(d['memSpill'])} | {gib(d['diskSpill'])} "
            f"| {gib(d['shuffleWrite'])} |",
            flush=True,
        )
    print(
        json.dumps(
            {
                "probe": "spill",
                "factor": args.factor,
                "driver_memory": args.memory,
                "heap_gib": round(heap / 2**30, 2),
                "results": rows,
            }
        )
    )
    spark.stop()
    return 0 if all(r["completed"] for r in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
