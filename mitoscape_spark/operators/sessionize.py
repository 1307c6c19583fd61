"""Sessionization over event streams (batch form).

``F.session_window`` works in batch groupBy too — same gap-merge
semantics Structured Streaming uses (streaming.windows wires the
streaming variant with watermarks). A session spans events of one user
with inter-event gaps < gap; window end = last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value)."""
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
