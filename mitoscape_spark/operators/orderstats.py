"""Two-phase running aggregates over a GLOBAL order, without the
single-partition window.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY plans one window
partition — a single task owns the whole table, the classic 100 TB
bottleneck (same failure mode as ``packing.py``'s prefix sum, which
handles the integral-unique-key special case). ``running_prefix`` is
the general form for ANY ordering key with one row per distinct key:

1. range-bucket the keys on approximate quantile boundaries (boundary
   quality only steers balance — correctness holds for any split);
2. combine each bucket to one row (sum / min per tracked column);
3. exclusive-scan the tiny bucket table on the driver (n_buckets
   values — the only serialized state, exactly like
   ``ranking.py::global_rank``);
4. broadcast the per-bucket base back and finish with a within-bucket
   window — bounded partitions, full parallelism.

Callers pre-aggregate to one row per key (a groupBy they need anyway);
``skyline_2d`` and ``drift.ks_statistic`` both ride on this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin

_KINDS = ("sum", "min")


def bucket_expr(col: str, bounds: list[float]):
    """Range-bucket index for ``col`` against sorted ``bounds``:
    count of boundaries <= value, as ONE higher-order-function
    expression over an array literal.

    The obvious alternative — a chain of ``(col >= b).cast(int)``
    additions — embeds every data-dependent boundary as its own
    codegen branch: measured 4.1 s of Janino compilation at 64 buckets
    (vs 0.8 s for this form, sf0.1 cold), and a deep enough chain
    (n_buckets ≳ 256) risks the 64 KB generated-method limit, which
    silently drops the whole stage to interpreted row-at-a-time
    evaluation. One array constant + one lambda keeps the generated
    code size independent of n_buckets."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda x: F.col(col) >= x))


def running_prefix(
    df: DataFrame,
    order_col: str,
    specs: dict[str, tuple[str, str]],
    n_buckets: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Add running-aggregate columns over the global ascending order of
    ``order_col``. ``specs`` maps each output column to
    ``(input_col, kind)`` with kind in {"sum", "min"}.

    Contract: ``df`` has ONE row per distinct ``order_col`` value
    (pre-aggregate first) — within-key order would otherwise be
    ambiguous, and keys must be NON-NULL (a NULL has no place in a
    global order: Spark windows sort it first, DuckDB last — filter or
    coalesce upstream, as every in-repo caller does). ``strict=True``
    aggregates strictly-preceding keys only (current row excluded); a
    strict prefix with no preceding rows is NULL for both kinds (sum of
    nothing stays NULL here on purpose — callers distinguish "empty
    prefix" from "prefix sums to 0").
    """
    for out, (_, kind) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"running_prefix: kind {kind!r} for {out!r}")

    # three actions touch `df` (quantile probe, bucket combine, final
    # plan); pin it so they don't re-run the caller's upstream lineage
    # three times — by contract it is already reduced to one row per
    # distinct key, so the materialization is key-cardinality-sized
    df = df.transform(pin)
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # NULL-key guard rides the quantile probe's existing action (no
    # extra job): bucket_expr would silently map NULL to bucket 0 and
    # rank NULL keys first — enforce the docstring contract loudly
    # instead (round-6 advice item 3)
    probe = df.agg(
        F.percentile_approx(order_col, fracs, 10_000).alias("_b"),
        F.sum(F.col(order_col).isNull().cast("long")).alias("_nulls"),
    ).first()
    if probe["_nulls"]:
        raise ValueError(
            f"running_prefix: {probe['_nulls']} NULL value(s) in order "
            f"key {order_col!r} — a NULL has no place in a global order "
            "(Spark windows sort it first, DuckDB last); filter or "
            "coalesce upstream"
        )
    bounds = probe["_b"] or []
    bounds = sorted({float(b) for b in bounds if b is not None})
    bucketed = df.withColumn("_bk", bucket_expr(order_col, bounds))

    combined = bucketed.groupBy("_bk").agg(
        *[
            (F.sum(src) if kind == "sum" else F.min(src)).alias(out)
            for out, (src, kind) in specs.items()
        ]
    )
    # n_buckets rows — the deliberate, bounded driver state
    rows = {r["_bk"]: r for r in combined.collect()}
    base_rows, acc = [], {out: None for out in specs}
    for bk in sorted(rows):
        base_rows.append((int(bk),) + tuple(acc[out] for out in specs))
        r = rows[bk]
        for out, (_, kind) in specs.items():
            v = r[out]
            if v is None:
                continue
            if acc[out] is None:
                acc[out] = v
            elif kind == "sum":
                acc[out] = acc[out] + v
            else:
                acc[out] = min(acc[out], v)

    spark = df.sparkSession
    base_schema = ", ".join(
        ["_bk int"] + [f"_base_{out} double" for out in specs]
    )
    base_df = spark.createDataFrame(
        [
            (bk,) + tuple(None if v is None else float(v) for v in vals)
            for bk, *vals in base_rows
        ],
        base_schema,
    )

    end = -1 if strict else 0
    w = (
        Window.partitionBy("_bk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out_df = bucketed.join(F.broadcast(base_df), "_bk")
    for out, (src, kind) in specs.items():
        local = (F.sum(src) if kind == "sum" else F.min(src)).over(w)
        base = F.col(f"_base_{out}")
        if kind == "sum":
            merged = (
                F.when(local.isNull() & base.isNull(), F.lit(None))
                .otherwise(
                    F.coalesce(local, F.lit(0.0))
                    + F.coalesce(base, F.lit(0.0))
                )
            )
        else:
            merged = F.least(local, base)  # least skips NULLs
        out_df = out_df.withColumn(out, merged)
    return out_df.drop("_bk", *[f"_base_{out}" for out in specs])
