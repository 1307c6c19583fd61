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
from pyspark.sql import functions as F
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


HOT_OUTPUT_SCHEMA = "key string, n long"
HOT_STATE_SCHEMA = "n long"


def _make_hot_key_updater(threshold: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        n += seen
        state.update((n,))
        # emit ONLY once a key is hot — downstream sees the heavy-hitter
        # set grow live, never the long tail (update-mode output stays
        # proportional to hot keys, not distinct keys)
        if n >= threshold and seen:
            yield pd.DataFrame({"key": [key[0]], "n": [n]})

    return update


def streaming_hot_keys(
    keyed: DataFrame,
    threshold: int,
    key_col: str = "key",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Streaming heavy hitters: per-key running counts in keyed state;
    a key surfaces (and keeps updating) once its lifetime count reaches
    ``threshold`` — the live analog of
    operators/heavyhitters.exact_heavy_hitters, with the same contract
    (exact lifetime counts) but micro-batch latency.

    State is one long per distinct key — the state-store budget is the
    key space, same as every keyed stateful op; pair with a state
    timeout when keys churn (an evicted key restarts its count, the
    documented trade)."""
    return (
        keyed.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            _make_hot_key_updater(threshold),
            outputStructType=HOT_OUTPUT_SCHEMA,
            stateStructType=HOT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API — typed state
# variables (value/list/map) with per-state TTL, timers, and initial
# state. Same state-store scaling story as above; richer surface.
# Runtime deps: the RocksDB state store provider, and google.protobuf
# in the Python env (the TWS driver worker imports it) — the test is
# skipped where protobuf is absent.
# ------------------------------------------------------------------
try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-key running (count, sum) plus a bounded recent-values
        list — exercises both ValueState and ListState. ``ttl_ms``
        evicts state for keys idle longer than the TTL (the 100 TB
        key-space budget knob)."""

        def __init__(self, recent_keep: int = 3, ttl_ms: int | None = None):
            self._keep = recent_keep
            self._ttl = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n long, s double", ttlDurationMs=self._ttl
            )
            self._recent = handle.getListState("recent", "v double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._agg.get() if self._agg.exists() else (0, 0.0)
            tail: list[float] = []
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                tail += [float(v) for v in pdf["value"].tail(self._keep)]
            self._agg.update((n, s))
            prev = [r[0] for r in self._recent.get()] if self._recent.exists() else []
            window = (prev + tail)[-self._keep:]
            self._recent.put([(v,) for v in window])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "recent": [window],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(
        events: DataFrame, recent_keep: int = 3, ttl_ms: int | None = None
    ) -> DataFrame:
        """``running_user_stats`` on the transformWithStateInPandas API:
        per-user running count/sum (ValueState) + last-N values
        (ListState), optional state TTL."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(recent_keep, ttl_ms),
            outputStructType=(
                "user_id long, n_events long, sum_value double,"
                " recent array<double>"
            ),
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - older Spark
    pass
