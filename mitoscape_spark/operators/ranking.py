"""Distributed exact ranking + cross-group quantile normalization.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans a
SINGLE-partition window — one task owns the whole table. ``global_rank``
is the scalable exact replacement for non-unique sort keys (the
unique-numeric case is ``operators/packing.py::global_row_number``):
range-bucket the rows on approximate score boundaries, rank inside each
bucket in parallel, and add the tiny exclusive per-bucket prefix counts.
Bucket boundaries only steer balance — the final rank is exact for ANY
boundary choice, so approx quantiles are safe here.

``quantile_normalize`` is the batch-effect corrector every mixed-source
corpus needs before a global score threshold: each group's score
distribution maps onto the POOLED distribution (replace a score by the
pooled order statistic at the score's within-group percent_rank) — a
quality cutoff then means the same thing for every source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
    out_col: str = "rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact 1-based global rank under ``(score, id)`` order (dense in
    rows, not values — every row gets a distinct rank; ``id_col`` is
    the deterministic tiebreak and must be unique).

    Two-phase: ``n_buckets`` range buckets from approx score quantiles
    (ties share a bucket — the composite order resolves them inside
    one window partition), per-bucket counts collect to the driver
    (n_buckets rows), and rank = exclusive bucket prefix + in-bucket
    ``row_number``. The only serialized state is the boundary list; at
    100 TB raise ``n_buckets`` ∝ cluster width.
    """
    from pyspark.sql import Window

    # NOTE deliberately NOT checkpointed, unlike running_prefix (§20):
    # three actions do touch `df`, but global_rank's contract is RAW
    # rows (no one-row-per-key reduction), so pinning materializes the
    # full projected input — measured a wash at sf0.1 (gini -0.4 s,
    # quantile_norm +0.2 s) and at 100 TB the materialization can cost
    # more than the re-executed pruned scans. Callers with an EXPENSIVE
    # derived lineage should pin before calling.
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # NULL-score guard on the quantile probe's existing action (no
    # extra job) — bucket_expr maps NULL to bucket 0, which would
    # silently rank NULL scores first (round-6 advice item 3)
    probe = df.agg(
        F.percentile_approx(score_col, fracs, 10_000).alias("_b"),
        F.sum(F.col(score_col).isNull().cast("long")).alias("_nulls"),
    ).first()
    if probe["_nulls"]:
        raise ValueError(
            f"global_rank: {probe['_nulls']} NULL value(s) in score "
            f"column {score_col!r} — rank over a NULL score is "
            "undefined; filter or coalesce upstream"
        )
    bounds = probe["_b"] or []
    # dedupe boundaries (heavy ties collapse buckets — harmless)
    bounds = sorted({float(b) for b in bounds if b is not None})
    # one HOF expression, not a chained-add ladder — codegen size must
    # stay independent of n_buckets (see orderstats.bucket_expr)
    from mitoscape_spark.operators.orderstats import bucket_expr

    bucketed = df.withColumn("_bk", bucket_expr(score_col, bounds))
    counts = {
        r["_bk"]: r["_n"]
        for r in bucketed.groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(bk), int(off)) for bk, off in offsets.items()],
        "_bk int, _off long",
    )
    w = Window.partitionBy("_bk").orderBy(score_col, id_col)
    return (
        bucketed.join(F.broadcast(off_df), "_bk")
        .withColumn(out_col, F.col("_off") + F.row_number().over(w))
        .drop("_bk", "_off")
    )


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    out_col: str = "norm_score",
) -> DataFrame:
    """Map each group's score distribution onto the pooled distribution:
    a row at within-group percent_rank ``pr`` receives the pooled order
    statistic at rank ``floor(pr·(N−1)) + 1`` (lower interpolation —
    exactly restatable in SQL, hence oracle-checkable). Ties and the
    single-row-group edge follow the engines' shared percent_rank
    definition ((rank−1)/(n−1), 0 for n=1 — deterministic under the
    (score, id) tiebreak).

    Plan: one pooled ``global_rank`` (bucketed, parallel) builds the
    rank→value lookup; one per-group window computes pr (groups
    partition the shuffle); one equi-join on the computed rank fetches
    the normalized value. Nothing global ever sits in one task.
    """
    from pyspark.sql import Window

    n_total = df.count()
    lookup = global_rank(df, score_col, id_col, out_col="_r").select(
        "_r", F.col(score_col).cast("double").alias(out_col)
    )
    wg = Window.partitionBy(group_col).orderBy(score_col, id_col)
    target = df.withColumn(
        "_r",
        (
            F.floor(F.percent_rank().over(wg) * F.lit(n_total - 1)) + 1
        ).cast("long"),
    )
    return target.join(lookup, "_r").drop("_r")


def global_ntile(
    df: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    out_col: str = "bucket",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact k-quantile bucket (1..k) under global ``(score, id)``
    ascending order — the scalable stand-in for the single-partition
    ``NTILE(k) OVER (ORDER BY ...)``. Bucket boundary contract is
    ``floor((rank-1)·k/n) + 1`` (even spread; differs from SQL NTILE's
    big-buckets-first fill when n % k != 0 — deterministic and stated
    so oracles restate it verbatim). One-dimension form of
    ``global_ntile_multi`` (single source)."""
    return global_ntile_multi(
        df, {out_col: F.col(score_col)}, id_col, k, n_buckets=n_buckets
    )


def global_ntile_multi(
    df: DataFrame,
    scores: dict,
    id_col: str,
    k: int,
    n_buckets: int = 64,
) -> DataFrame:
    """All-dimensions-at-once ``global_ntile`` (round 12 — VERDICT r11
    item 5): every ``out_col: score expression`` in ``scores`` gets its
    exact k-quantile bucket under (score, id) order, with ONE
    quantile-probe action and ONE bucket-count action for ALL
    dimensions — the chained per-dimension form fired two driver
    actions per dimension and re-joined each scored branch back on the
    key. Boundaries only steer bucket balance, never the rank, so
    sharing one probe pass is results-identical to the chained form
    (the per-dimension rank/bucket arithmetic is unchanged:
    rank = exclusive bucket prefix + in-bucket row_number, bucket =
    floor((rank-1)·k/n) + 1).
    """
    from pyspark.sql import Window

    from mitoscape_spark.operators.orderstats import bucket_expr

    if k < 1:
        raise ValueError("global_ntile: k >= 1")
    if not scores:
        raise ValueError("global_ntile_multi: at least one dimension")
    names = list(scores)
    d = df
    for out, sc in scores.items():
        col = F.col(sc) if isinstance(sc, str) else sc
        d = d.withColumn(f"_s_{out}", col)
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # one probe action: every dimension's approx boundaries + NULL
    # guard ride a single aggregate (same guard as global_rank —
    # bucket_expr maps NULL to bucket 0, which would silently rank
    # NULL scores first)
    aggs = []
    for out in names:
        aggs.append(
            F.percentile_approx(f"_s_{out}", fracs, 10_000).alias(
                f"_b_{out}"
            )
        )
        aggs.append(
            F.sum(F.col(f"_s_{out}").isNull().cast("long")).alias(
                f"_nulls_{out}"
            )
        )
    probe = d.agg(*aggs).first()
    for out in names:
        if probe[f"_nulls_{out}"]:
            raise ValueError(
                f"global_ntile: {probe[f'_nulls_{out}']} NULL value(s) "
                f"in score column for {out!r} — rank over a NULL score "
                "is undefined; filter or coalesce upstream"
            )
    bounds_by: dict = {}
    for out in names:
        bounds_by[out] = sorted(
            {float(b) for b in (probe[f"_b_{out}"] or []) if b is not None}
        )
        d = d.withColumn(
            f"_bk_{out}", bucket_expr(f"_s_{out}", bounds_by[out])
        )
    # one bucket-count action across all dimensions: explode the
    # (dimension, bucket) pairs — output is n_dims × n_buckets tiny
    # rows, the same driver-sized state the chained form collected
    # once per dimension
    cnt_rows = (
        d.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(out).alias("_dim"),
                            F.col(f"_bk_{out}").alias("_bk"),
                        )
                        for out in names
                    ]
                )
            ).alias("_e")
        )
        .groupBy("_e._dim", "_e._bk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    counts: dict = {out: {} for out in names}
    for r in cnt_rows:
        counts[r["_dim"]][r["_bk"]] = r["_n"]
    n_total = sum(counts[names[0]].values())
    for out in names:
        # exclusive cumulative prefix per POSSIBLE bucket (0..len
        # bounds), inlined as one tiny array literal indexed by the
        # bucket column — no broadcast join, no extra plan nodes (the
        # driver-side state is the same ≤ n_buckets counts the chained
        # form collected per dimension)
        offs, acc = [], 0
        for bk in range(len(bounds_by[out]) + 1):
            offs.append(acc)
            acc += counts[out].get(bk, 0)
        off_arr = F.expr(
            "array(" + ",".join(f"{o}L" for o in offs) + ")"
        )
        w = Window.partitionBy(f"_bk_{out}").orderBy(f"_s_{out}", id_col)
        d = (
            d.withColumn(
                out,
                (
                    F.floor(
                        (
                            off_arr.getItem(F.col(f"_bk_{out}"))
                            + F.row_number().over(w)
                            - 1
                        )
                        * F.lit(float(k))
                        / F.lit(n_total)
                    )
                    + 1
                ).cast("int"),
            )
            .drop(f"_bk_{out}", f"_s_{out}")
        )
    return d
