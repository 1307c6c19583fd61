"""Grouped-map custom transforms via ``applyInPandas`` — the surface
for per-group logic that column expressions genuinely can't express
(here: a robust z-score needing two dependent medians per group).

Scale: one shuffle on the group key; each group materializes as a
pandas frame in one task, so this is for *many medium groups* (users,
documents), never for one giant group — memory per task is bounded by
the largest group. For algebraic stats use plain groupBy; for running
state use streaming.stateful.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401 (doc parity)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_robust_zscore(
    df: DataFrame,
    key: str,
    value_col: str,
    out_col: str = "robust_z",
    ndigits: int = 4,
) -> DataFrame:
    """Per-group robust z-score: (x − median) / (1.4826 · MAD), where
    MAD = median(|x − median|). Null when MAD is 0 (constant group).

    Median-of-medians needs two dependent passes over the group — not
    expressible as a single Catalyst aggregate, hence the grouped map.
    Arrow-native (``applyInArrow``, round 8): the kernel is numpy over
    the group's value buffer, so the pandas block-manager round-trip —
    measured at ~7 ms/group of pure conversion constant on 1 500-group
    sf0.1 events, 10 s of the query's wall — is skipped on both sides
    of the boundary. Math is unchanged to the bit: same np.median /
    np.round as the pandas formulation. Rounded for cross-engine
    comparison (the DuckDB oracle computes the same with
    ``median``/``quantile_cont``).
    """
    import pyarrow as pa

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def transform(tbl: pa.Table) -> pa.Table:
        x = (
            tbl.column(value_col)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        if mad == 0.0:
            z = pa.nulls(len(tbl), pa.float64())
        else:
            vals = np.round((x - med) / (1.4826 * mad), ndigits)
            # NaN -> NULL, matching the pandas formulation (Series→Arrow
            # converts NaN to null; pa.array from a numpy float array
            # would keep a literal NaN — a silent oracle divergence on
            # inputs with NULL values)
            z = pa.array(vals, mask=np.isnan(vals))
        return tbl.append_column(out_col, z)

    return df.groupBy(key).applyInArrow(transform, schema=schema)


def grouped_minmax_scale_arrow(
    df: DataFrame,
    key: str,
    value_col: str,
    out_col: str = "scaled",
    ndigits: int = 4,
) -> DataFrame:
    """Per-group min-max scaling via ``applyInArrow`` — the Arrow-native
    grouped map (Spark 4): each group arrives as a ``pyarrow.Table``,
    compute runs on Arrow buffers directly, and NO pandas conversion
    happens on either side of the boundary. For numeric kernels this
    skips the pandas block-manager materialization that
    ``applyInPandas`` pays per group — same shuffle shape, cheaper
    per-group constant.

    (Min-max per group IS expressible with window functions; this
    operator exists as the Arrow-path template for kernels that aren't
    — rounded for the window-function-equivalence test.)
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def transform(tbl: pa.Table) -> pa.Table:
        x = tbl.column(value_col).cast(pa.float64())
        mm = pc.min_max(x).as_py()
        lo, hi = mm["min"], mm["max"]
        if lo is None or hi == lo:
            scaled = pa.nulls(len(tbl), pa.float64())
        else:
            scaled = pc.round(
                pc.divide(pc.subtract(x, lo), hi - lo), ndigits=ndigits
            )
        return tbl.append_column(out_col, scaled)

    return df.groupBy(key).applyInArrow(transform, schema=schema)
