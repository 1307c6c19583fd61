"""Custom stateful streaming operators via ``applyInPandasWithState``
(extension beyond the reference, which is strictly batch — SURVEY.md
§2.7; the Spark surface the task-side guide recommends for custom
stateful ops).

``running_user_stats`` keeps per-user running (count, sum, last-seen)
across micro-batches — the canonical "custom stateful operator" shape:
grouped keyed state, Arrow-batched updates, an explicit state schema.

Scale: state lives in the state store keyed by user — memory scales
with distinct active keys, not event history; at 100 TB of events the
key space is what you budget (use timeouts to evict idle keys — wired
here via ``GroupStateTimeout.NoTimeout`` by default, processing-time
timeout optional).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, s double, last long"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, s, last) = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last, unit="ns")],
        }
    )


def running_user_stats(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Per-user running stats, one updated row per user per micro-batch.

    Works on a streaming DataFrame (update output mode); the grouping
    shuffle keys state by user so each task owns a key range.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
