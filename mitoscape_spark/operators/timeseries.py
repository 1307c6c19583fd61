"""Time-series regularization: gap-filling and forward-fill — the
hypertable rollup primitives (time_bucket + gapfill + locf in the
TimescaleDB vocabulary), built as pure relational compositions.

Scale shape: the date spine is |keys| × |days| rows built from one
1-row min/max aggregate (broadcast) — never a per-row explosion of the
facts; the fill join keys on (key, day) and shuffles the DAILY rollup
(already reduced), not the raw events. Forward-fill is one window over
the spine, partitioned by key — bounded by days-per-key, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin


def daily_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, total): per-key daily sums (one partial+final agg)."""
    return (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .agg(F.round(F.sum(value_col), 4).alias("total"))
    )


def ewma_daily(
    events: DataFrame,
    decay: float = 0.9,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, total, ewma): exponentially-weighted moving average
    of the daily totals, EXPRESSED AS A WINDOW (no recursion):

        ewma_t = Σ_i d^(t-t_i)·x_i / Σ_i d^(t-t_i)
               = (Σ_i x_i·d^(-t_i)) · d^t / ((Σ_i d^(-t_i)) · d^t)

    — two cumulative sums over the per-key day order, rescaled per
    row. Weights are renormalized (so the first day's ewma equals its
    total). Day offsets are computed from each key's FIRST day, so the
    validity horizon depends on HISTORY LENGTH, not absolute dates.

    Numeric validity horizon (checked, not hoped): d^(-t) overflows
    double once a key's day span exceeds ~308/log10(1/d) days (~6.5k
    days at d=0.9, ~1k at d=0.5). Histories past the horizon would
    yield Inf/NaN silently; this raises instead — truncate the input
    window (contributions older than ~40 half-lives are below double
    precision anyway) or chunk by era.
    """
    import math

    from pyspark.sql import Window

    daily = daily_rollup(events, key_col, ts_col, value_col)
    max_span = int(250.0 / max(math.log10(1.0 / decay), 1e-12))
    w_all = Window.partitionBy("key")
    w_cum = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_t = daily.withColumn(
        "_t", F.datediff("day", F.min("day").over(w_all)).cast("double")
    )
    worst = with_t.agg(F.max("_t")).head()[0] or 0.0
    if worst > max_span:
        raise ValueError(
            f"ewma_daily: a key spans {int(worst)} days; decay={decay} "
            f"is numerically valid to ~{max_span} days (d^-t overflows "
            "double past that). Truncate history or chunk by era."
        )
    inv = F.pow(F.lit(decay), -F.col("_t"))
    num = F.sum(F.col("total") * inv).over(w_cum) * F.pow(
        F.lit(decay), F.col("_t")
    )
    den = F.sum(inv).over(w_cum) * F.pow(F.lit(decay), F.col("_t"))
    return with_t.select(
        "key", "day", "total", F.round(num / den, 6).alias("ewma")
    )


def seasonal_decompose_dow(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    sigma: float = 3.0,
) -> DataFrame:
    """Day-of-week seasonal decomposition + anomaly flags on the global
    daily total: ``total = seasonal (dow mean) + residual``; a day is
    anomalous when |residual| > sigma·stddev(residual).

    Everything is partial+final hash aggregation and two 1-row/7-row
    broadcasts back onto the (tiny) daily series — the raw events are
    scanned once for the rollup and never again, so the plan's cost is
    the rollup's at any scale. Additive decomposition by calendar
    circle is the STL-lite every metrics pipeline wants before alerting;
    fully SQL-expressible, so the driver hash-matches it against DuckDB.

    Day-of-week numbering is pinned to ISO (1=Mon..7=Sun) explicitly in
    both engines — Spark's ``dayofweek`` is 1=Sun, DuckDB's ``dow`` is
    0=Sun; silent off-by-one here would "pass" on symmetric corpora and
    corrupt real ones.
    """
    daily = (
        events.groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.sum(value_col).alias("total"))
    )
    # ISO weekday: Spark weekday() is 0=Mon..6=Sun
    # §20 pin: daily feeds the seasonal agg AND the decomposition join
    daily = daily.withColumn(
        "dow", (F.weekday("day") + F.lit(1)).cast("int")
    ).transform(pin)
    seasonal = daily.groupBy("dow").agg(F.avg("total").alias("dow_avg"))
    # (round-11 A/B: ALSO pinning with_season LOST badly, 0.41→2.0 s —
    # two chained materialization barriers serialize what was one
    # pipelined plan. Only daily, the fact-scan consumer, is pinned.)
    with_season = daily.join(F.broadcast(seasonal), "dow").withColumn(
        "resid", F.col("total") - F.col("dow_avg")
    )
    spread = with_season.agg(
        F.stddev_samp("resid").alias("_sd")
    )
    return (
        with_season.crossJoin(F.broadcast(spread))
        .select(
            "day",
            "dow",
            F.round("total", 4).alias("total"),
            F.round("dow_avg", 4).alias("dow_avg"),
            F.round("resid", 4).alias("resid"),
            (F.abs("resid") > F.lit(sigma) * F.col("_sd"))
            .cast("int")
            .alias("is_anomaly"),
        )
    )


def daily_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    fill: str = "zero",
) -> DataFrame:
    """(key, day, total) over the FULL global date span per key —
    missing days appear with ``fill='zero'`` → 0.0,
    ``fill='ffill'`` → the last observed day's total (locf; null until
    a key's first observation), or ``fill='linear'`` → linear
    interpolation between the surrounding observed days (the
    TimescaleDB ``interpolate()`` semantics: null outside a key's
    observed range, exact day-weighted blend inside — two window
    passes over the tiny spine, no extra shuffle beyond the ffill
    plan)."""
    if fill not in ("zero", "ffill", "linear"):
        raise ValueError(f"fill must be zero|ffill|linear, got {fill!r}")
    daily = daily_rollup(events, key_col, ts_col, value_col)
    bounds = events.agg(
        F.to_date(F.min(ts_col)).alias("_lo"),
        F.to_date(F.max(ts_col)).alias("_hi"),
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["key", "day"], "left")
    if fill == "zero":
        return joined.select(
            "key", "day", F.coalesce("total", F.lit(0.0)).alias("total")
        )
    from pyspark.sql import Window

    wp = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if fill == "ffill":
        return joined.select(
            "key",
            "day",
            F.last("total", ignorenulls=True).over(wp).alias("total"),
        )
    wn = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("total").isNotNull(), F.col("day"))
    pv = F.last("total", ignorenulls=True).over(wp)
    pd_ = F.last(obs_day, ignorenulls=True).over(wp)
    nv = F.first("total", ignorenulls=True).over(wn)
    nd = F.first(obs_day, ignorenulls=True).over(wn)
    # missing day ⇒ strictly between two observations (or off an end,
    # where a null endpoint nulls the whole expression — intended)
    interp = pv + (nv - pv) * F.datediff(F.col("day"), pd_) / F.datediff(
        nd, pd_
    )
    return joined.select(
        "key",
        "day",
        F.when(F.col("total").isNotNull(), F.col("total"))
        .otherwise(F.round(interp, 4))
        .alias("total"),
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    n_buckets: int = 64,
) -> DataFrame:
    """Kaplan–Meier survival estimator with right-censoring:
    S(t) = Π_{t_i ≤ t, event} (1 − d_i / n_i), the time-to-event curve
    (churn, time-to-repurchase, failure analysis) that naive
    "average duration" metrics get WRONG the moment observations are
    censored — dropping censored rows biases short, counting them as
    events biases long; KM uses them correctly as at-risk mass.

    Input: one row per subject — (duration, event) with event=1 for an
    observed event and 0 for censoring at that duration.

    Scale shape: subjects reduce to one row per distinct duration (d_i
    events, c_i censored — one hash agg); the at-risk count
    n_i = N − Σ_{t < t_i}(d + c) and the cumulative log-survival both
    ride ONE inclusive two-phase prefix pass (strict values recovered
    by subtracting the row's own contribution) — no global window.
    Survival = exp(Σ ln(1 − d/n)) — a running product expressed as a
    prefix sum. Output rows at event times only (the standard KM
    support), survival rounded to 6 dp.
    """
    from mitoscape_spark.operators.orderstats import running_prefix

    per_t = (
        durations.where(
            F.col(duration_col).isNotNull()
            & F.col(event_col).isNotNull()
        )
        .groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("d"),
            F.sum((F.col(event_col) == 0).cast("long")).alias("c"),
        )
    )
    total = durations.where(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).count()
    # inclusive prefix of (d + c) and of the per-time log factor; the
    # log factor needs n_t, which itself needs the strict prefix —
    # recovered as inclusive − own, so ONE pass still suffices for
    # (d+c); the log-survival then takes a second pass over the same
    # (already pinned) per-time table
    stage1 = running_prefix(
        per_t.withColumn("_dc", F.col("d") + F.col("c")),
        "t",
        {"_s1": ("_dc", "sum")},
        n_buckets=n_buckets,
    ).withColumn(
        "n_at_risk",
        (F.lit(total) - (F.col("_s1") - F.col("_dc"))).cast("long"),
    )
    # the last event time can have d == n_at_risk (factor 0) —
    # ln(0) errors in DuckDB and NULLs in Spark; floor the factor at
    # 1e-12 so exp(Σ) underflows to a value that ROUNDs to exactly 0.0
    # in both engines (the curve correctly terminates at 0)
    stage1 = stage1.withColumn(
        "_term",
        F.when(
            F.col("d") > 0,
            F.log(
                F.greatest(
                    F.lit(1.0) - F.col("d") / F.col("n_at_risk"),
                    F.lit(1e-12),
                )
            ),
        ).otherwise(F.lit(0.0)),
    )
    out = running_prefix(
        stage1, "t", {"_ls": ("_term", "sum")}, n_buckets=n_buckets
    )
    return (
        out.where(F.col("d") > 0)
        .select(
            F.col("t").alias(duration_col),
            "n_at_risk",
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.round(F.exp("_ls"), 6).alias("survival"),
        )
    )
