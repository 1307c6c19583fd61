"""Custom aggregates as grouped-agg pandas UDFs — the UDAF surface.

Spark's Python UDAF story is the GROUPED_AGG pandas UDF: the group's
column arrives as one Arrow-backed pandas Series, the UDF returns one
scalar. Catalyst treats it as a complete aggregate — NO partial/merge
phase exists for Python aggregates, so every group's raw values shuffle
to one task (unlike built-in sum/avg which combine map-side). That
makes these the right tool for *small-group* custom math only; for
hot-key or algebraic cases, decompose into built-ins instead (the
geometric mean below has exactly such a decomposition, used by its
DuckDB oracle: exp(avg(ln(x))) — kept as a UDF here to exercise and
document the surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def geometric_mean_1p(v: pd.Series) -> float:
    """Geometric mean of (1 + v): exp(mean(log1p(v))). Shifted by 1 so
    zero values don't collapse the product."""
    return float(np.exp(np.log1p(v.astype("float64")).mean()))
