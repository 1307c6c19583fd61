"""Table profiling and data-quality validation.

A 100 TB ingest needs an ANALYZE-style profile (null fractions, distinct
cardinalities, value ranges) and constraint checks (key uniqueness,
referential integrity) *before* anything downstream trusts the data.

Scale shape:
- ``profile_columns`` is ONE aggregation job over the table regardless
  of how many columns are profiled — all per-column aggregates ride the
  same partial+final hash agg (multiple COUNT DISTINCTs go through
  Catalyst's Expand rewrite: one extra map-side row replication, still
  a single shuffle, no per-column table rescans). The wide 1-row agg
  result is then unpivoted driver-free with ``stack``.
- ``check_unique`` is a key-hash aggregation (one shuffle) that returns
  offending keys, not a boolean — at scale you want the violation set.
- ``orphan_rows`` is a left-anti join; the parent side's key projection
  is broadcast when small, else sort-merge — Catalyst/AQE choose.

Min/max are cast to string so one tall schema fits every column type;
distinct counts are exact (use ext sketches for approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Tall per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val) — one aggregation job for all columns."""
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key combinations appearing more than once, with their counts.
    Empty result == uniqueness holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def orphan_rows(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no match in the parent table
    (referential-integrity violations), via left-anti join."""
    return child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )


def quality_summary(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    references: list[tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """One-row violation-count summary across all declared constraints.
    Each constraint contributes one count row; 0 everywhere == clean.
    Counts run as independent jobs unioned into a single tall result:
    (check_name, n_violations)."""
    spark = df.sparkSession
    rows: list[DataFrame] = []

    def one(name: str, n_df: DataFrame) -> DataFrame:
        return n_df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    for c in not_null or []:
        rows.append(one(f"not_null:{c}", df.where(F.col(c).isNull())))
    for keys in unique or []:
        rows.append(one(f"unique:{','.join(keys)}", check_unique(df, keys)))
    for parent, fk, pk in references or []:
        rows.append(one(f"fk:{fk}->{pk}", orphan_rows(df, parent, fk, pk)))
    if not rows:
        return spark.createDataFrame([], "check_name string, n_violations long")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def observed_metrics(
    df: DataFrame, name: str = "quality", exprs: dict[str, "F.Column"] | None = None
):
    """Attach one-pass observable metrics (Spark ``Observation``) to a
    plan: counters ride the existing job as accumulator-backed
    AggregatingAccumulator — NO extra pass over the data, unlike
    ``quality_summary`` which launches one job per constraint.

    The 100 TB shape: a pipeline stage that already writes its output
    gets row counts / null counts / sum checks for free; alerting reads
    the observation after the action completes.

    Returns ``(observed_df, observation)``; run any action on
    ``observed_df``, then read ``observation.get``.
    """
    from pyspark.sql import Observation

    exprs = exprs or {"n_rows": F.count(F.lit(1))}
    obs = Observation(name)
    observed = df.observe(obs, *[e.alias(k) for k, e in exprs.items()])
    return observed, obs


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Privacy audit: quasi-identifier combinations appearing in fewer
    than ``k`` rows (the re-identifiable tail). One hash aggregation
    over the quasi-identifier tuple; at 100 TB this is the same
    partial+final agg shape as any GROUP BY — no per-row Python, no
    driver state. Columns: the quasi-identifiers + group_size."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def suppress_rare_combinations(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity enforcement by suppression: drop every row whose
    quasi-identifier combination has fewer than ``k`` occurrences.
    Anti-join against the (small) below-k group list — the surviving
    corpus streams through; only the rare-combination keys shuffle.

    The anti-join is NULL-SAFE: a NULL quasi-identifier is a real
    (and often highly identifying) group — a plain equi-join would
    never match it and the supposedly-suppressed rows would survive
    the privacy filter."""
    import functools

    rare = (
        k_anonymity_report(df, quasi_cols, k)
        .select(*quasi_cols)
        .select(
            *[F.col(c).alias(f"_rare_{c}") for c in quasi_cols]
        )
    )
    cond = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(c).eqNullSafe(F.col(f"_rare_{c}"))
            for c in quasi_cols
        ],
    )
    return df.join(rare, cond, "left_anti")


def correlation_matrix(
    df: DataFrame, cols: list[str], digits: int = 6
) -> DataFrame:
    """Tall Pearson sample-correlation matrix (col_a, col_b, corr) for
    every unordered column pair — ONE aggregation job for all pairs
    (n·(n-1)/2 corr aggregates ride a single partial+final hash agg; no
    per-pair rescans, no driver-side math). NULL-containing rows drop
    per-pair (corr's own semantics), constant columns yield NULL corr.
    Rounded for cross-engine hash stability.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if not pairs:
        raise ValueError("need at least two columns")
    one = df.agg(
        *[
            F.round(F.corr(a, b), digits).alias(f"_c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', _c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
        )
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized summary: clamp values into the group's
    [p_lo, p_hi] percentile band, then report (n, lo, hi, mean_raw,
    mean_winsorized) — the robust mean a heavy-tailed quality/score
    column needs before thresholding (one 10^6-token outlier document
    should not drag its source's average).

    Plan: one exact-percentile hash agg per group (Spark's
    ``percentile`` — same linear interpolation as DuckDB's
    ``quantile_cont``), broadcast the small per-group band table back,
    clamp map-side, one final agg. Two shuffles total, both on the
    group key. The band edges round to 4 dp BEFORE clamping so both
    engines clamp against identical thresholds (the interpolation can
    differ in the last ulp; a raw-threshold clamp would then flip
    boundary values).
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("winsorized_stats: 0 <= lo < hi <= 1")
    clean = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    bands = clean.groupBy("_g").agg(
        F.round(F.expr(f"percentile(_v, {lo})"), 4).alias("_lo"),
        F.round(F.expr(f"percentile(_v, {hi})"), 4).alias("_hi"),
    )
    clamped = clean.join(F.broadcast(bands), "_g").select(
        "_g",
        "_v",
        "_lo",
        "_hi",
        F.least(F.greatest(F.col("_v"), F.col("_lo")), F.col("_hi"))
        .alias("_w"),
    )
    return clamped.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("_lo").alias("p_lo"),
        F.min("_hi").alias("p_hi"),
        F.round(F.avg("_v"), 4).alias("mean_raw"),
        F.round(F.avg("_w"), 4).alias("mean_winsorized"),
    )
