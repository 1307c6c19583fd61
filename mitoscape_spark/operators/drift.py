"""Distribution-drift detection between two table versions: per-column
PSI (population stability index) over equi-width histograms.

The monitoring primitive for a 100 TB ingest: "did this week's data
shift against the reference snapshot" must be answerable WITHOUT
eyeballing dashboards. PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref);
the industry folklore thresholds (≈0.1 watch, ≈0.25 act) make it a
gateable number.

Plan shape: ONE scan per side regardless of column count — columns melt
to tall (col_name, value) rows via ``stack`` (a projection, no
shuffle), bin edges come from a 1-row aggregate over the REFERENCE side
(broadcast back), and each side reduces to ≤ |cols|·bins rows with one
partial+final hash agg. The PSI math then runs on that tiny table.
Zero-count bins are clamped to a shared epsilon (the standard PSI
regularization — identical in the DuckDB oracle, so results hash-match
cross-engine).

Binning contract: edges are the reference's [min, max] split
equi-width; current-side values OUTSIDE the reference range clip into
the edge bins (drift beyond the seen range lands in bins 0/bins-1 —
visible, not dropped). A constant reference column (min == max) puts
everything in bin 0 and PSI degenerates to out-of-range mass, which is
exactly what you want flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin

from mitoscape_spark.operators.orderstats import running_prefix

EPS = 1e-6


def _melt(df: DataFrame, cols: list[str]) -> DataFrame:
    args = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
    return df.select(
        F.expr(f"stack({len(cols)}, {args}) AS (col_name, value)")
    ).where(F.col("value").isNotNull())


def _bin_counts(
    tall: DataFrame, edges: DataFrame, bins: int, n_name: str
) -> DataFrame:
    width = (F.col("_hi") - F.col("_lo")) / bins
    bin_expr = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("value") - F.col("_lo")) / width), F.lit(0)
            ),
            F.lit(bins - 1),
        )
    )
    return (
        tall.join(F.broadcast(edges), "col_name")
        .select("col_name", bin_expr.cast("int").alias("bin"))
        .groupBy("col_name", "bin")
        .agg(F.count(F.lit(1)).alias(n_name))
    )


def drift_report(
    reference: DataFrame,
    current: DataFrame,
    cols: list[str],
    bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """(col_name, psi): one row per column, higher = more drift.

    Columns dispatch by dtype: NUMERIC → equi-width histogram PSI
    (below); everything else (string, date, timestamp, boolean, …) →
    categorical PSI over per-value frequencies — any non-numeric cast
    to DOUBLE would abort the whole report under ANSI mode, and
    casting to STRING is total. Results union into one
    (col_name, psi) table.
    """
    from pyspark.sql import types as T

    num_cols = [
        c
        for c in cols
        if isinstance(reference.schema[c].dataType, T.NumericType)
    ]
    str_cols = [c for c in cols if c not in num_cols]
    parts = []
    if num_cols:
        parts.append(
            _drift_report_numeric(reference, current, num_cols, bins, digits)
        )
    if str_cols:
        parts.append(
            drift_report_categorical(reference, current, str_cols, digits)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _drift_report_numeric(
    reference: DataFrame,
    current: DataFrame,
    cols: list[str],
    bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """(col_name, psi): one row per numeric column, higher = more drift."""
    ref_tall = _melt(reference, cols)
    cur_tall = _melt(current, cols)
    edges = ref_tall.groupBy("col_name").agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    # the |cols|-row edges table feeds BOTH bin passes; a lazy local
    # checkpoint computes it once and reuses the materialized rows
    # (without it each pass re-runs the reference scan + agg subtree)
    edges = edges.transform(pin)
    from pyspark.sql import Window as W

    # per-column totals ride a window over the ALREADY-AGGREGATED
    # counts (≤ |cols|·bins rows) instead of a separate aggregate
    # joined back: a totals-join formulation makes Catalyst evaluate
    # the whole scan subtree twice (no exchange reuse across differing
    # aggregates) — measured as 16 parquet scans where 3 are inherent
    # (one edges pass + one bin pass per side)
    w = W.partitionBy("col_name")
    ref_counts = _bin_counts(ref_tall, edges, bins, "n_ref").withColumn(
        "_tr", F.sum("n_ref").over(w)
    )
    cur_counts = _bin_counts(cur_tall, edges, bins, "n_cur").withColumn(
        "_tc", F.sum("n_cur").over(w)
    )
    joined = ref_counts.join(cur_counts, ["col_name", "bin"], "full_outer")
    # a bin missing on one side carries that side's total via the other
    # rows of its column — recover it with a max window over the join
    tr = F.max("_tr").over(w)
    tc = F.max("_tc").over(w)
    p_ref = F.greatest(F.coalesce("n_ref", F.lit(0)) / tr, F.lit(EPS))
    p_cur = F.greatest(F.coalesce("n_cur", F.lit(0)) / tc, F.lit(EPS))
    return (
        joined.select(
            "col_name",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("_term"),
        )
        .groupBy("col_name")
        .agg(F.round(F.sum("_term"), digits).alias("psi"))
    )


def drift_report_categorical(
    reference: DataFrame,
    current: DataFrame,
    cols: list[str],
    digits: int = 6,
) -> DataFrame:
    """(col_name, psi) for STRING columns: PSI over per-value category
    frequencies instead of histogram bins — the standard categorical
    variant. Categories present on only one side hit the epsilon clamp
    (their mass shows as drift, exactly like out-of-range numeric
    values clip into edge bins). NULL is its own category (the melt
    keeps it as the sentinel below) — a surge of NULLs IS drift.

    Same plan shape as the numeric path: one scan per side, melt to
    (col_name, value), one partial+final hash agg per side to
    ≤ |cols|·|categories| rows, PSI math on the tiny table. Category
    cardinality is the scale knob: lang/source-like columns (dozens to
    thousands of values) stay trivially small; for genuinely
    high-cardinality keys use exact_heavy_hitters first and PSI the
    top-k + "other" rollup.
    """
    from pyspark.sql import Window as W

    # leading space keeps the sentinel out of the normal-identifier
    # value space; it must match the DuckDB oracle's literal exactly
    null_sentinel = " __null__"

    def _melt_s(df: DataFrame) -> DataFrame:
        args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
        return df.select(
            F.expr(f"stack({len(cols)}, {args}) AS (col_name, value)")
        ).withColumn("value", F.coalesce("value", F.lit(null_sentinel)))

    w = W.partitionBy("col_name")
    ref_counts = (
        _melt_s(reference)
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("n_ref"))
        .withColumn("_tr", F.sum("n_ref").over(w))
    )
    cur_counts = (
        _melt_s(current)
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .withColumn("_tc", F.sum("n_cur").over(w))
    )
    joined = ref_counts.join(cur_counts, ["col_name", "value"], "full_outer")
    tr = F.max("_tr").over(w)
    tc = F.max("_tc").over(w)
    p_ref = F.greatest(F.coalesce("n_ref", F.lit(0)) / tr, F.lit(EPS))
    p_cur = F.greatest(F.coalesce("n_cur", F.lit(0)) / tc, F.lit(EPS))
    return (
        joined.select(
            "col_name",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("_term"),
        )
        .groupBy("col_name")
        .agg(F.round(F.sum("_term"), digits).alias("psi"))
    )


def drift_report_grouped(
    reference: DataFrame,
    current: DataFrame,
    group_col: str,
    cols: list[str],
    bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """(group, col_name, psi): PSI per stratum — "which SOURCE drifted"
    rather than "did the corpus drift". Same one-scan-per-side shape;
    bin edges derive from the reference PER (group, column), so each
    stratum is judged against its own baseline (a global-edge variant
    would report mixture shift as drift in every stratum). Groups
    present on only one side are skipped (no baseline / no signal) —
    detect those with a plain anti-join on distinct groups first.

    Measure columns dispatch by dtype like :func:`drift_report`:
    numeric → per-stratum histogram PSI, everything else → per-stratum
    categorical PSI (value frequencies, NULL as its own category).
    """
    from pyspark.sql import types as T

    num_cols = [
        c
        for c in cols
        if isinstance(reference.schema[c].dataType, T.NumericType)
    ]
    str_cols = [c for c in cols if c not in num_cols]
    parts = []
    if num_cols:
        parts.append(
            _drift_report_grouped_numeric(
                reference, current, group_col, num_cols, bins, digits
            )
        )
    if str_cols:
        parts.append(
            _drift_report_grouped_categorical(
                reference, current, group_col, str_cols, digits
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _drift_report_grouped_categorical(
    reference: DataFrame,
    current: DataFrame,
    group_col: str,
    cols: list[str],
    digits: int = 6,
) -> DataFrame:
    """Per-stratum categorical PSI: the grouped twin of
    :func:`drift_report_categorical` — counts per (group, column,
    value), totals by window, epsilon clamp, groups present on only
    one side skipped (same contract as the numeric grouped path)."""
    from pyspark.sql import Window as W

    null_sentinel = " __null__"

    def _melt_s(df: DataFrame) -> DataFrame:
        args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
        return df.select(
            F.col(group_col).alias("grp"),
            F.expr(f"stack({len(cols)}, {args}) AS (col_name, value)"),
        ).withColumn("value", F.coalesce("value", F.lit(null_sentinel)))

    w = W.partitionBy("grp", "col_name")
    ref_counts = (
        _melt_s(reference)
        .groupBy("grp", "col_name", "value")
        .agg(F.count(F.lit(1)).alias("n_ref"))
        .withColumn("_tr", F.sum("n_ref").over(w))
    )
    cur_counts = (
        _melt_s(current)
        .groupBy("grp", "col_name", "value")
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .withColumn("_tc", F.sum("n_cur").over(w))
    )
    joined = ref_counts.join(
        cur_counts, ["grp", "col_name", "value"], "full_outer"
    )
    tr, tc = F.max("_tr").over(w), F.max("_tc").over(w)
    p_ref = F.greatest(F.coalesce("n_ref", F.lit(0)) / tr, F.lit(EPS))
    p_cur = F.greatest(F.coalesce("n_cur", F.lit(0)) / tc, F.lit(EPS))
    return (
        joined.select(
            F.col("grp").alias(group_col),
            "col_name",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("_term"),
            tr.alias("_tr2"),
            tc.alias("_tc2"),
        )
        .where(F.col("_tr2").isNotNull() & F.col("_tc2").isNotNull())
        .groupBy(group_col, "col_name")
        .agg(F.round(F.sum("_term"), digits).alias("psi"))
    )


def _drift_report_grouped_numeric(
    reference: DataFrame,
    current: DataFrame,
    group_col: str,
    cols: list[str],
    bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    from pyspark.sql import Window as W

    def _melt_g(df: DataFrame) -> DataFrame:
        args = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
        return df.select(
            F.col(group_col).alias("grp"),
            F.expr(f"stack({len(cols)}, {args}) AS (col_name, value)"),
        ).where(F.col("value").isNotNull())

    ref_tall, cur_tall = _melt_g(reference), _melt_g(current)
    edges = (
        ref_tall.groupBy("grp", "col_name")
        .agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
        .transform(pin)
    )

    def _counts(tall: DataFrame, n_name: str) -> DataFrame:
        width = (F.col("_hi") - F.col("_lo")) / bins
        bin_expr = F.when(width <= 0, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((F.col("value") - F.col("_lo")) / width),
                    F.lit(0),
                ),
                F.lit(bins - 1),
            )
        )
        # no broadcast hint: the edges table is |groups|·|cols| rows —
        # unbounded in group cardinality; AQE broadcasts when it fits
        return (
            tall.join(edges, ["grp", "col_name"])
            .select("grp", "col_name", bin_expr.cast("int").alias("bin"))
            .groupBy("grp", "col_name", "bin")
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    w = W.partitionBy("grp", "col_name")
    ref_counts = _counts(ref_tall, "n_ref").withColumn(
        "_tr", F.sum("n_ref").over(w)
    )
    cur_counts = _counts(cur_tall, "n_cur").withColumn(
        "_tc", F.sum("n_cur").over(w)
    )
    joined = ref_counts.join(
        cur_counts, ["grp", "col_name", "bin"], "full_outer"
    )
    tr, tc = F.max("_tr").over(w), F.max("_tc").over(w)
    p_ref = F.greatest(F.coalesce("n_ref", F.lit(0)) / tr, F.lit(EPS))
    p_cur = F.greatest(F.coalesce("n_cur", F.lit(0)) / tc, F.lit(EPS))
    return (
        joined.select(
            F.col("grp").alias(group_col),
            "col_name",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("_term"),
            tr.alias("_tr2"),
            tc.alias("_tc2"),
        )
        .where(F.col("_tr2").isNotNull() & F.col("_tc2").isNotNull())
        .groupBy(group_col, "col_name")
        .agg(F.round(F.sum("_term"), digits).alias("psi"))
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the ``value_col``
    distributions of rows where ``side_col`` equals ``side_a`` vs
    ``side_b``: D = sup_v |F_a(v) − F_b(v)|, evaluated exactly at every
    observed value. PSI (above) needs binning and an epsilon; KS is the
    binning-free companion — exact, threshold-free, and sensitive to
    shape changes PSI's coarse histogram can smear out.

    Plan shape: one scan reduces both sides to per-distinct-value
    counts (one hash agg), the two empirical CDFs come from
    ``orderstats.running_prefix`` (two-phase — NO single-partition
    global window), and the sup is a 1-row final agg. Scales with
    distinct-value cardinality, not row count.

    Returns one row: (ks_d, n_a, n_b), ks_d rounded to 6 dp — the CDF
    divisions are exact-integer / exact-integer in IEEE doubles, so
    both engines compute identical values and the hash matches.
    """
    sides = df.where(
        F.col(side_col).isin(side_a, side_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("_v"),
        (F.col(side_col) == side_a).cast("long").alias("_a"),
        (F.col(side_col) == side_b).cast("long").alias("_b"),
    )
    per_value = sides.groupBy("_v").agg(
        F.sum("_a").alias("_ca"), F.sum("_b").alias("_cb")
    )
    cdf = running_prefix(
        per_value,
        "_v",
        {"_fa": ("_ca", "sum"), "_fb": ("_cb", "sum")},
        n_buckets=n_buckets,
    )
    totals = sides.agg(
        F.sum("_a").alias("_na"), F.sum("_b").alias("_nb")
    )
    return (
        cdf.crossJoin(F.broadcast(totals))  # 1-row stats join
        .select(
            (F.col("_fa") / F.col("_na"))
            .alias("_Fa"),
            (F.col("_fb") / F.col("_nb")).alias("_Fb"),
            "_na",
            "_nb",
        )
        .agg(
            F.round(F.max(F.abs(F.col("_Fa") - F.col("_Fb"))), 6).alias(
                "ks_d"
            ),
            F.max("_na").cast("long").alias("n_a"),
            F.max("_nb").cast("long").alias("n_b"),
        )
    )


def wasserstein_distance(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between the two sides'
    ``value_col`` distributions: W1 = ∫ |F_a(v) − F_b(v)| dv — the
    integral companion of ``ks_statistic``'s sup. KS answers "how far
    apart at the worst point"; W1 answers "how much probability mass
    must move, and how far" in the VALUE's units — the drift number you
    can compare against a business tolerance (e.g. "mean shift worth
    $3.20 per event").

    Same plan as KS (per-distinct-value counts → two-phase prefix
    CDFs); the integral adds one lead() window *within the already
    materialized distinct-value table* for the gap to the next value,
    partitioned by the same range buckets — still no global window.
    Exactness note: W1 over an empirical distribution is a finite sum
    of |F_a−F_b|·gap terms; both factors are exact-integer ratios and
    value differences, so cross-engine agreement is at double
    precision and the 6 dp rounding is cosmetic.
    """
    sides = df.where(
        F.col(side_col).isin(side_a, side_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).cast("double").alias("_v"),
        (F.col(side_col) == side_a).cast("long").alias("_a"),
        (F.col(side_col) == side_b).cast("long").alias("_b"),
    )
    per_value = sides.groupBy("_v").agg(
        F.sum("_a").alias("_ca"), F.sum("_b").alias("_cb")
    )
    cdf = running_prefix(
        per_value,
        "_v",
        {"_fa": ("_ca", "sum"), "_fb": ("_cb", "sum")},
        n_buckets=n_buckets,
    )
    totals = sides.agg(
        F.sum("_a").alias("_na"), F.sum("_b").alias("_nb")
    )
    # the integral needs each value's gap to the NEXT distinct value —
    # a global-order lead(). Expressed without a global window: the
    # strict prefix-min of _v over DESCENDING value order (= ascending
    # -_v) is exactly "smallest value strictly greater than mine",
    # which is one more running_prefix pass over the same tiny table.
    # the reverse pass fires its own quantile/bucket actions — pin the
    # (distinct-value-sized) CDF table so those don't re-run the whole
    # per-value aggregation lineage (same trick as ext_rfm_segments)
    cdf = cdf.transform(pin)
    rev = running_prefix(
        cdf.withColumn("_nv", -F.col("_v")),
        "_nv",
        {"_pm": ("_v", "min")},
        n_buckets=n_buckets,
        strict=True,
    )
    return (
        rev.crossJoin(F.broadcast(totals))  # 1-row stats join
        .where(F.col("_pm").isNotNull())  # last value: no gap term
        .select(
            (
                F.abs(
                    F.col("_fa") / F.col("_na")
                    - F.col("_fb") / F.col("_nb")
                )
                * (F.col("_pm") - F.col("_v"))
            ).alias("_term")
        )
        .agg(F.round(F.sum("_term"), 6).alias("w1"))
    )
