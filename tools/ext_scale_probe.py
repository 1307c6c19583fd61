"""Extension-family scale probe at 10x bench scale (round-9 verdict
item 2 for round 10).

The Q-series has measured 10x/100x exponents
(tools/qseries_scale_probe.py, PERF.md §24); the heavy EXTENSION
queries had spill validation at 10x (PERF.md §22) but no recorded
exponents. This probe derives a 10x corpus from the driver-generated
sf0.1 tables (same discipline as qseries/spill probes: never
synthesize unrelated data, never write /root/testdata) and records
per-query wall-clock at 1x and 10x plus the fitted exponent
log_factor(t_10x / t_1x) for the 10 heaviest extension queries named
in the round-9 verdict.

Corpus derivation — copy k (k = 1..factor-1) must be an ISOMORPHIC
disjoint slice of the original, per table family:

* documents — ``doc_id`` offset by k·10⁹ AND every whitespace token
  suffixed with ``_<k>`` (``regexp_replace(text, '(\\S+)', '$1_k')``).
  The suffix keeps intra-copy token/shingle structure byte-identical
  in SHAPE (same token count, same equality classes, near-same
  lengths) while making cross-copy token and shingle spaces DISJOINT
  — verbatim text copies would turn every doc into a 10-member exact
  near-dup cluster and measure quadratic pair explosion instead of
  engine scaling (the same reasoning as the qseries probe's join-key
  offsets). ``n_chars`` is recomputed to stay consistent with the
  rewritten text.
* embeddings — ``vec_id`` offset, and each copy's vectors pass
  through a per-copy DETERMINISTIC SIGN FLIP per dimension (flip dim
  j in copy k iff xxhash64(k, j) is odd). A coordinate reflection is
  an orthogonal transform: every intra-copy cosine/dot/L2 relation is
  EXACTLY preserved, while cross-copy similarities decorrelate — so
  kNN/semantic-dedup neighborhoods stay inside each copy instead of
  collapsing onto 10 identical twins per point. (ext_knn_join's
  brute-force GEMM is still quadratic BY CONTRACT: 10x rows on both
  sides is ~100x flops; the probe documents that expectation rather
  than hiding it.)

  Decorrelation protects TOP-K neighborhoods, not THRESHOLD-pair
  mass: cross-copy cosines center on 0 with std ≈ 1/√dim (≈0.125 at
  dim 64), so a fixed threshold like dedup's τ=0.35 still admits the
  ~0.22% tail — and cross pairs grow with factor², so at ``--factor
  100`` the 2·10¹⁰ cross pairs contribute ~43M TRUE above-threshold
  edges (vs ~414k intra; measured, PERF.md §26). That is the real
  geometry of exact threshold near-dup in 64-d at this scale, not a
  corpus artifact — which is why ext_dedup_embedding is excluded at
  two decades the same way the flop-quadratic queries are.
* lineitem — join keys offset exactly as in qseries
  (``l_orderkey/l_partkey/l_suppkey``), reusing its corpus directory
  when present so ext_triangle_count sees the same 10x graph.

Copies are synthesized with a FLAT plan (``base CROSS JOIN
range(factor)``, per-copy transforms as functions of the copy-index
column) — plan size is O(1) in the factor, so three-decade corpora
(``--factor 1000``) analyze and write fine where a factor-branch
union would choke the analyzer. Values are identical to the branch
derivation (test-pinned).

Usage:
    python tools/ext_scale_probe.py [--factor 10] [--rounds 2]
        [--queries name1,name2,...] [--out-json /tmp/ext_scale.json]

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

# the 10 heaviest extension queries (round-9 verdict item 2), with the
# tables each one reads (static: queries/extensions.py load_table calls)
# + the embeddings-family two-decade additions (round-10 verdict item 4:
# ext_dedup_embedding end-to-end and the IVF-pruned route)
_PROBE_QUERIES = {
    "ext_dedup_near": ["documents"],
    "ext_substring_dedup": ["documents"],
    "ext_winnow_fingerprint": ["documents"],
    "ext_semantic_dedup": ["embeddings"],
    "ext_tfidf_pairs_hashed": ["documents"],
    "ext_triangle_count": ["lineitem"],
    "ext_leakage_safe_split": ["documents"],
    "ext_knn_join": ["embeddings"],
    "ext_knn_join_ivf": ["embeddings"],
    "ext_dedup_embedding": ["embeddings"],
    "ext_boilerplate": ["documents"],
    "ext_containment": ["documents"],
    "ivf_scaled": ["embeddings"],
}


def _ivf_scaled(spark, sf_dir: str):
    """Probe-LOCAL variant (not a registry query): knn_join_ivf with
    the quantizer sized by the operator's own documented scale rule —
    ``n_centroids ∝ √n``, constant ``n_probe`` — instead of the
    registry entry's literal ``n_centroids=8`` (sized for the 2k-row
    sf corpora). The registry entry measures the CONSTANT-C contract
    (per-cell work grows linearly → total quadratic); this variant
    measures the operator as it is meant to be deployed: cells ~√n →
    total ~n^1.5·p/√n̄... i.e. the n^1.5 IVF-flat contract, the
    subquadratic scale path §26 documents next to it."""
    import math as _math

    from pyspark.sql import functions as F

    from mitoscape_spark.catalog import load_table
    from mitoscape_spark.operators.similarity import (
        IVFFlatIndex,
        knn_join_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    idx = IVFFlatIndex(
        n_centroids=max(8, _math.isqrt(n)), n_probe=4
    ).fit(emb)
    return knn_join_ivf(emb, k=5, index=idx).orderBy(
        "id", F.col("cos").desc(), "nbr"
    )


# names resolved probe-locally instead of through the registry
_LOCAL_QUERIES = {"ivf_scaled": _ivf_scaled}

_LINEITEM_KEYS = ["l_orderkey", "l_partkey", "l_suppkey"]
_OFFSET = 1_000_000_000


def _synthesize(spark, factor: int, out_dir: str, tables: set[str]) -> None:
    from pyspark.sql import functions as F

    from mitoscape_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)

    # FLAT-PLAN copy derivation (round 11): the per-copy transforms are
    # expressed as functions of a copy-index COLUMN over
    # ``base CROSS JOIN range(factor)`` instead of a ``factor``-branch
    # unionByName — a 1000-branch union chokes the analyzer (plan size
    # grows with factor), the flat plan is O(1) regardless of factor,
    # which is what unlocks the three-decade (1000x) probe. Copy values
    # are IDENTICAL to the old branch derivation: the same per-(k, j)
    # xxhash64 sign bits, the same ``_<k>`` token suffixes, the same
    # k*_OFFSET id shifts — the isomorphism test pins the output, not
    # the plan shape.
    def copy_index(n_parts: int = 64):
        # streamed side of a BroadcastNestedLoopJoin against the
        # (small, broadcast) base table: n_parts tasks synthesize the
        # corpus in parallel even though the base parquet is a single
        # row group. Cast to int so xxhash64(k, j) hashes the same
        # bytes the old branch path hashed with F.lit(int).
        return (
            spark.range(factor)
            .repartition(min(n_parts, factor))
            .select(F.col("id").cast("int").alias("__k"))
        )

    if "documents" in tables:
        docs = load_table(spark, _BASE, "documents")

        # cross-copy token disjointness must be PROVABLE, not assumed
        # (round-10 advice item 2): a base token already ending in
        # ``_<digits>`` collides with a lower copy's suffixed form
        # (base ``foo_1`` == copy-1's ``foo`` + ``_1``), creating
        # cross-copy shingle overlap the isomorphism test can't see.
        # The corpus generator never emits such tokens today — fail
        # loudly if that ever changes rather than silently measuring
        # pair explosion.
        n_bad = docs.where(F.col("text").rlike(r"_\d+(\s|$)")).count()
        if n_bad:
            raise ValueError(
                f"{n_bad} base documents contain tokens ending in "
                "'_<digits>' — the per-copy suffix scheme would alias "
                "them across copies; pick a delimiter outside the base "
                "alphabet before probing"
            )

        k = F.col("__k")
        suffixed = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1_"), k.cast("string")),
        )
        text = F.when(k == 0, F.col("text")).otherwise(suffixed)
        (
            copy_index()
            .crossJoin(F.broadcast(docs))
            .select(
                (F.col("doc_id") + k.cast("long") * _OFFSET).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.when(k == 0, F.col("n_chars"))
                .otherwise(F.length(text).cast("long"))
                .alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "documents.parquet"))
        )
        print(f"  documents: x{factor} written", file=sys.stderr)

    if "embeddings" in tables:
        emb = load_table(spark, _BASE, "embeddings")

        k = F.col("__k")
        flipped = F.transform(
            "embedding",
            lambda v, j: (
                v
                * F.when(
                    F.pmod(F.xxhash64(k, j), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).cast("float"),
        )
        (
            copy_index()
            .crossJoin(F.broadcast(emb))
            .select(
                (F.col("vec_id") + k.cast("long") * _OFFSET).alias("vec_id"),
                F.when(k == 0, F.col("embedding"))
                .otherwise(flipped)
                .alias("embedding"),
                "label",
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "embeddings.parquet"))
        )
        print(f"  embeddings: x{factor} written", file=sys.stderr)

    if "lineitem" in tables:
        # reuse the qseries corpus when it exists (same derivation)
        q_dir = os.path.join(_OUT, f"q{factor}x", "lineitem.parquet")
        dst = os.path.join(out_dir, "lineitem.parquet")
        if os.path.islink(dst) and not os.path.exists(dst):
            os.unlink(dst)  # dangling link from a deleted qseries run
        if os.path.exists(q_dir) and not os.path.exists(dst):
            os.symlink(q_dir, dst)
            print("  lineitem: reusing qseries corpus", file=sys.stderr)
        elif not os.path.exists(dst):
            li = load_table(spark, _BASE, "lineitem")
            # lineitem is the FACT side — stream it, broadcast the copy
            # index (inverse of the docs/embeddings shape above)
            out = li.crossJoin(
                F.broadcast(
                    spark.range(factor).select(
                        F.col("id").cast("int").alias("__k")
                    )
                )
            )
            for col in _LINEITEM_KEYS:
                out = out.withColumn(
                    col, F.col(col) + F.col("__k").cast("long") * _OFFSET
                )
            out.drop("__k").write.mode("overwrite").parquet(dst)
            print(f"  lineitem: x{factor} written", file=sys.stderr)


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
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of the probe set")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()
    if args.factor < 2:
        ap.error("--factor must be >= 2 (exponent is log-ratio based)")
    if args.rounds < 1:
        ap.error("--rounds must be >= 1")

    names = list(_PROBE_QUERIES)
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        if not names:
            ap.error("--queries named no queries")
        unknown = set(names) - set(_PROBE_QUERIES)
        if unknown:
            ap.error(f"not in the probe set: {sorted(unknown)}")

    from mitoscape_spark.queries import QUERIES
    from mitoscape_spark.session import get_spark

    spark = get_spark("ext-scale-probe")

    tables = {t for n in names for t in _PROBE_QUERIES[n]}
    big_dir = os.path.join(_OUT, f"ext{args.factor}x")
    missing = [
        t for t in tables
        if not os.path.exists(os.path.join(big_dir, f"{t}.parquet"))
    ]
    if missing:
        print(
            f"synthesizing {args.factor}x corpus ({', '.join(sorted(missing))}) ...",
            file=sys.stderr,
        )
        _synthesize(spark, args.factor, big_dir, set(missing))

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
    for name in names:
        fn = _LOCAL_QUERIES.get(name) or QUERIES[name]
        _time_query(fn, spark, _BASE, 1)  # warm plan shape + codegen
        t1 = _time_query(fn, spark, _BASE, args.rounds)
        # symmetric warm at the big scale (round-10 advice item 3):
        # without it the t10 timing's first round carries first-touch
        # costs (file listing, plan compile against the bigger corpus)
        # that bias exponents upward when --rounds is small
        _time_query(fn, spark, big_dir, 1)
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
