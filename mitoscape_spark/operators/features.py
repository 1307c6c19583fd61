"""Feature-preparation operators: imputation, target encoding,
discretization — the tabular-ML prep layer next to the corpus ops.

All three follow the same scale doctrine: per-group/per-column
statistics reduce to a tiny table in one hash agg, broadcast back, and
apply map-side — the row stream is never shuffled for the transform
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_numeric(
    df: DataFrame, cols: list[str], strategy: str = "mean"
) -> DataFrame:
    """Fill NULLs in numeric ``cols`` with the column mean or median
    (one 1-row aggregate for ALL columns, broadcast back — never a
    pass per column), and append a per-column ``<col>__was_null`` flag
    so downstream models can SEE the missingness instead of mistaking
    the fill value for signal (the standard indicator-variable
    practice). Median uses exact ``percentile`` (matches DuckDB
    ``quantile_cont``); values round to 6 dp so both engines fill the
    identical number."""
    if strategy not in ("mean", "median"):
        raise ValueError("impute_numeric: strategy mean|median")
    agg = (
        F.avg if strategy == "mean"
        else (lambda c: F.expr(f"percentile({c}, 0.5)"))
    )
    stats = df.agg(
        *[
            F.round(agg(c), 6).alias(f"_fill_{c}")
            for c in cols
        ]
    )
    out = df.crossJoin(F.broadcast(stats))  # 1-row stats join
    for c in cols:
        out = out.withColumn(
            f"{c}__was_null", F.col(c).isNull().cast("int")
        ).withColumn(c, F.coalesce(F.col(c), F.col(f"_fill_{c}")))
    return out.drop(*[f"_fill_{c}" for c in cols])


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    out_col: str | None = None,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing:
    enc(row) = (Σ_group y − y_row + m·ȳ) / (n_group − 1 + m) — the
    high-cardinality categorical encoder that one-hot can't scale to.
    Leave-one-out (excluding the row's OWN target) plus the prior
    pull-back ``m`` is what keeps the encoding from leaking the row's
    label into its own feature; singleton categories degenerate to the
    prior exactly (0/(0+m) path). One group agg + a 1-row global agg,
    both broadcast back; encode is a scalar projection, rounded 6 dp.
    """
    out_col = out_col or f"{cat_col}__te"
    grp = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_sy"),
        F.count(target_col).alias("_ny"),
    )
    overall = df.agg(F.avg(target_col).alias("_gm"))
    enc = (
        F.col("_sy")
        - F.coalesce(F.col(target_col), F.lit(0.0))
        + F.lit(float(smoothing)) * F.col("_gm")
    ) / (
        F.col("_ny")
        - F.when(F.col(target_col).isNotNull(), 1).otherwise(0)
        + F.lit(float(smoothing))
    )
    return (
        df.join(F.broadcast(grp), cat_col)
        .crossJoin(F.broadcast(overall))  # 1-row stats join
        .withColumn(out_col, F.round(enc, 6))
        .drop("_sy", "_ny", "_gm")
    )


def discretize_equal_frequency(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) binning via the two-phase
    ``global_ntile`` — every bin gets n/k rows regardless of the value
    distribution (equal-WIDTH bins starve under skew). Deterministic
    (value, id) tie-break; the supervised-learning discretizer and the
    histogram-equalization primitive."""
    from mitoscape_spark.operators.ranking import global_ntile

    return global_ntile(
        df.where(F.col(value_col).isNotNull()),
        score_col=value_col,
        id_col=id_col,
        k=n_bins,
        out_col=out_col,
    )
