"""Exact frequency heavy hitters without a full distinct-key shuffle.

The naive plan — ``groupBy(key).count().filter(count >= T)`` — shuffles
one row per *distinct key* even though the answer has a handful of rows.
At 100 TB with billions of distinct keys the shuffle of the long tail IS
the job. This operator uses the classic two-pass candidate/recount plan:

1. **Candidate generation (one scan, no shuffle).** Pigeonhole bound: a
   key with global count >= T must have local count >= T/P in at least
   one of the P input partitions. Each partition counts its own keys
   (Arrow-batched, vectorized ``value_counts`` — never per-row Python)
   and emits only keys meeting the local bound. Output is tiny: at most
   ``n_p / (T/P)`` keys per partition.
2. **Exact recount (one scan, shuffle over candidate rows only).** The
   candidate set broadcast-semi-joins back onto the input; the final
   ``groupBy`` shuffles only rows whose key is a candidate, with partial
   aggregation collapsing them map-side first.

The result is EXACT (candidates are a superset of the true heavy
hitters; the recount filters), which is why the driver can hash-match it
against DuckDB's ``GROUP BY ... HAVING count >= T``.

Memory bound, stated honestly: pass 1 holds exact per-partition counts,
i.e. O(distinct keys per partition). Input-split sizing
(``spark.sql.files.maxPartitionBytes``) bounds partition row count, and
the per-entry cost is one pandas index entry + int64 — ~50 bytes. A
128 MB split of 8-byte keys worst-cases at ~16M entries ≈ 1 GB; callers
with pathological key widths should shrink split size or raise T. A
SpaceSaving summary (capacity m, guarantee holds when T/P > n_p/m) would
cap this at O(m) — not implemented because its per-row eviction loop
de-vectorizes the scan for a bound the split size already enforces.

No counterpart in the reference (its aggregations are per-read-name,
`BamReader.scala:69-76`); this is a training-data-pipeline primitive
(e.g. hot-URL / boilerplate detection before dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_candidates(
    df: DataFrame, key_cols: list[str], local_threshold: int
) -> DataFrame:
    """Keys whose count within any single input partition reaches
    ``local_threshold``. One partition-parallel scan, no shuffle; output
    schema = the key columns."""
    keyed = df.select(*key_cols)
    schema = keyed.schema

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # exact, vectorized accumulation across this partition's batches;
        # dropna=False keeps NULL keys countable (they are legal keys)
        acc: pd.Series | None = None
        for batch in batches:
            counts = batch.groupby(key_cols, dropna=False, sort=False).size()
            acc = counts if acc is None else acc.add(counts, fill_value=0)
        if acc is None:
            return
        hits = acc[acc >= local_threshold]
        if len(hits):
            yield hits.index.to_frame(index=False).reset_index(drop=True)

    return keyed.mapInPandas(emit, schema=schema)


def exact_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    threshold: int,
    count_name: str = "n",
) -> DataFrame:
    """All key tuples occurring at least ``threshold`` times, with exact
    counts. Two scans, one candidate-only shuffle — never a distinct-key
    shuffle. NULL-safe on every key column (NULL is a key like any
    other; the recount join uses ``eqNullSafe``)."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    # The pigeonhole bound needs the *actual* partition count of the
    # candidate-generation job, but df.rdd.getNumPartitions() is a
    # separate plan evaluation — input re-splitting or a changed file
    # listing between the two evaluations could give the real job MORE
    # partitions, making a ceil(T/P_est) bound too high and silently
    # dropping true heavy hitters (round-3 advice). Derive the bound
    # from a deliberate OVER-estimate instead: overestimating P only
    # LOWERS the local threshold, which grows the (tiny) candidate set
    # but keeps it a superset — exactness is preserved for any actual
    # partition count up to 2× the larger of the plan estimate and the
    # cluster's default parallelism. ceil division is still safe under
    # that over-estimate (ceil(T/2P) <= ceil(T/P_actual) whenever
    # 2P >= P_actual — ceil is monotone in the denominator) and avoids
    # degenerating to local_threshold=1 a full factor-of-2 early, which
    # would turn the recount join into a full distinct+recount pass on
    # high-cardinality inputs (round-4 advice).
    n_parts = max(
        1,
        df.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    local_threshold = max(1, -(-threshold // (2 * n_parts)))
    if local_threshold == 1 and threshold > 1:
        import warnings

        warnings.warn(
            f"exact_heavy_hitters: threshold={threshold} <= "
            f"2*partitions={2 * n_parts}; every distinct key becomes a "
            "candidate (full distinct+recount). Exact, but consider a "
            "larger threshold or fewer partitions on high-cardinality "
            "inputs.",
            stacklevel=2,
        )
    candidates = local_candidates(df, key_cols, local_threshold).distinct()
    cond = None
    for k in key_cols:
        clause = df[k].eqNullSafe(candidates[k])
        cond = clause if cond is None else cond & clause
    return (
        df.join(F.broadcast(candidates), cond, "left_semi")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(count_name))
        .where(F.col(count_name) >= threshold)
    )
