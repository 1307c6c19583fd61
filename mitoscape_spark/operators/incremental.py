"""Incremental aggregate maintenance — update a materialized
aggregate from a CDC delta without rescanning the base facts.

The materialized-view primitive every 100 TB deployment ends up
needing: a grouped (count, sum) table is self-maintainable — inserts
add, deletes subtract — so refreshing it costs O(|delta|) + one small
join instead of an O(|facts|) rescan. avg/ratio metrics derive from the
maintained (sum, count) pair. min/max are deliberately NOT offered:
they are not delta-maintainable under deletes (a deleted row that held
the min forces a rescan of its group) — callers needing them refresh
those groups explicitly.

Plan shape: the delta aggregates FIRST (map-side partial agg over the
small batch), then full-outer-joins the base aggregate on the group
key. The base table has one row per group — orders of magnitude
smaller than the facts — and never re-shuffles its source data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_signed(
    delta: DataFrame,
    value_col: str,
    op_col: str = "op",
    insert_op: str = "insert",
    delete_op: str = "delete",
):
    """Signed (value, weight) expressions for a CDC batch: inserts
    contribute (+value, +1), deletes (-value, -1). An UPDATE arrives as
    delete-of-old + insert-of-new — the standard CDC decomposition."""
    sign = (
        F.when(F.col(op_col) == insert_op, F.lit(1))
        .when(F.col(op_col) == delete_op, F.lit(-1))
        .otherwise(F.raise_error(F.concat(F.lit("unknown CDC op: "), F.col(op_col))))
    )
    return sign * F.col(value_col), sign


def maintain_sum_count(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sum_col: str = "sum_value",
    count_col: str = "n",
    op_col: str = "op",
) -> DataFrame:
    """New aggregate state = base ⊕ delta.

    ``base_agg``: one row per key with ``sum_col``/``count_col`` (the
    previously materialized state). ``delta``: raw CDC rows with
    ``op_col`` ∈ {insert, delete} and ``value_col``. Groups whose
    maintained count reaches zero disappear (exactly what a direct
    re-aggregation would produce); groups seen only in the delta are
    born with their delta totals.
    """
    signed_value, signed_weight = delta_signed(delta, value_col, op_col)
    delta_agg = delta.groupBy(*keys).agg(
        F.sum(signed_value).alias("_d_sum"),
        F.sum(signed_weight).alias("_d_n"),
    )
    merged = _merge_on_keys_nullsafe(base_agg, delta_agg, keys).select(
        *keys,
        (
            F.coalesce(F.col(sum_col), F.lit(0))
            + F.coalesce(F.col("_d_sum"), F.lit(0))
        ).alias(sum_col),
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias(count_col),
    )
    return merged.where(F.col(count_col) > 0)


def _merge_on_keys_nullsafe(
    base: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """full_outer join on group keys with NULL-SAFE equality: groupBy
    treats NULL as one real group, so the maintainer's join must match
    it too — plain `=` would never merge NULL-keyed state and the
    duplicate rows would compound every refresh. Output carries ONE
    coalesced copy of each key plus both sides' value columns."""
    import functools

    b, d = base.alias("_b"), delta.alias("_d")
    cond = functools.reduce(
        lambda a, c: a & c,
        [
            F.col(f"_b.{k}").eqNullSafe(F.col(f"_d.{k}"))
            for k in keys
        ],
    )
    joined = b.join(d, cond, "full_outer")
    keep = [
        F.coalesce(F.col(f"_b.{k}"), F.col(f"_d.{k}")).alias(k)
        for k in keys
    ]
    others = [
        F.col(f"_b.{c}") for c in base.columns if c not in keys
    ] + [F.col(f"_d.{c}") for c in delta.columns if c not in keys]
    return joined.select(*keep, *others)


def refresh_snapshot_aggregate(
    spark,
    table_dir: str,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sum_col: str = "sum_value",
    count_col: str = "n",
    op_col: str = "op",
    meta: dict | None = None,
) -> int:
    """Materialized view end-to-end: the aggregate STATE lives in a
    snapshot table (sources/snapshots.py), each refresh folds a CDC
    delta into it and commits a new version — so the view is
    refreshable in O(|delta|), atomically visible to readers, and
    every historical state remains time-travelable for audit
    ("what did the dashboard say yesterday" is a version read).

    First refresh bootstraps from an empty state with the delta's
    grouped schema. Returns the committed version. ``meta`` augments
    the manifest record (e.g. a streaming batch_id ledger entry).
    """
    from mitoscape_spark.sources import snapshots as snap

    try:
        base = snap.read(spark, table_dir)
    except ValueError:  # no commits yet — empty state, correct schema
        base = (
            delta.limit(0)
            .groupBy(*keys)
            .agg(
                F.sum(value_col).alias(sum_col),
                F.count(F.lit(1)).alias(count_col),
            )
        )
    state = maintain_sum_count(
        base, delta, keys, value_col, sum_col, count_col, op_col
    )
    return snap.commit(
        state,
        table_dir,
        mode="overwrite",
        meta={"refresh": True, **(meta or {})},
    )


def maintain_distinct_sketch(
    base_state: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sketch_col: str = "nd_sketch",
) -> DataFrame:
    """Incrementally-maintained DISTINCT counts via mergeable HLL
    sketches (Spark's DataSketches surface: ``hll_sketch_agg`` /
    ``hll_union_agg``).

    COUNT(DISTINCT x) is the aggregate naive delta maintenance cannot
    touch — a new row may or may not be a new distinct value, and only
    the full history knows. The sketch solves it: per-key HLL state is
    a few KB, unions are associative/commutative, so refresh cost is
    O(|delta|) + a small-state merge, at ~2% standard error regardless
    of cardinality. Insert-only by construction (HLL cannot unvote a
    value); workloads with deletes re-sketch the affected keys.

    ``base_state``: (keys..., sketch binary) or None to bootstrap.
    """
    delta_state = delta.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col).alias(sketch_col)
    )
    if base_state is None:
        return delta_state
    return (
        base_state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(F.hll_union_agg(sketch_col).alias(sketch_col))
    )


def estimate_distinct(
    state: DataFrame, keys: list[str], sketch_col: str = "nd_sketch"
) -> DataFrame:
    """(keys..., n_distinct) estimates from maintained sketch state."""
    return state.select(
        *keys,
        F.hll_sketch_estimate(F.col(sketch_col)).alias("n_distinct"),
    )


def refresh_snapshot_distinct(
    spark,
    table_dir: str,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sketch_col: str = "nd_sketch",
    meta: dict | None = None,
) -> int:
    """Distinct-count materialized view: HLL state persisted in a
    snapshot table (binary sketch column in parquet), each refresh
    union-merges the delta's sketches and commits a new version."""
    from mitoscape_spark.sources import snapshots as snap

    try:
        base = snap.read(spark, table_dir)
    except ValueError:
        base = None
    state = maintain_distinct_sketch(base, delta, keys, value_col, sketch_col)
    return snap.commit(
        state,
        table_dir,
        mode="overwrite",
        meta={"refresh": "distinct-sketch", **(meta or {})},
    )


def maintain_min_max_insert_only(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    min_col: str = "min_value",
    max_col: str = "max_value",
    op_col: str = "op",
    insert_op: str = "insert",
) -> DataFrame:
    """min/max maintenance for the INSERT-ONLY case (append streams,
    immutable event logs — most fact tables): new_min = least(old,
    delta_min), symmetric for max. This is exactly the case the module
    docstring carves out: min/max are monotone under inserts, so the
    delta folds in O(|delta|) like sum/count; a single delete would
    break the invariant, so any non-insert op in the batch raises
    instead of silently corrupting the view (re-aggregate those groups
    explicitly, or keep deletes out of this view's feed).
    """
    # null-safe inequality: a NULL op must count as "not an insert"
    # (plain != evaluates to NULL and slips past the guard)
    bad = (
        delta.where(~F.col(op_col).eqNullSafe(insert_op))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "maintain_min_max_insert_only: delta contains non-insert "
            "ops; min/max are not delta-maintainable under deletes"
        )
    delta_agg = delta.groupBy(*keys).agg(
        F.min(value_col).alias("_d_min"),
        F.max(value_col).alias("_d_max"),
    )
    return _merge_on_keys_nullsafe(base_agg, delta_agg, keys).select(
        *keys,
        F.least(
            F.coalesce(F.col(min_col), F.col("_d_min")),
            F.coalesce(F.col("_d_min"), F.col(min_col)),
        ).alias(min_col),
        F.greatest(
            F.coalesce(F.col(max_col), F.col("_d_max")),
            F.coalesce(F.col("_d_max"), F.col(max_col)),
        ).alias(max_col),
    )
