"""Bounded concurrent query execution under FAIR scheduler pools —
the multi-tenant submission pattern as an engine surface.

A workload is a MIX of independent queries; running them serially
leaves cores idle during each query's scheduling gaps, and flooding
them all at once thrashes the task slots (measured in PERF.md §18:
15-at-once ran 5.6× slower than 6-in-flight on 32 cores). This module
packages the measured sweet spot: a bounded thread pool, one FAIR
scheduler pool per query (so no query starves), per-query wall-clock
timing, and failures isolated per query instead of failing the batch.

Used by bench.py for the gated number and available to any caller
with a dict of DataFrame-producing thunks.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession


def run_concurrent(
    spark: SparkSession,
    queries: dict[str, Callable[[], DataFrame]],
    max_inflight: int = 6,
    action: Callable[[DataFrame], None] | None = None,
    on_error: Callable[[str, Exception], None] | None = None,
) -> dict[str, float]:
    """Execute every query thunk through a bounded pool; returns
    name → seconds (-1.0 for failures, which are reported through
    ``on_error`` instead of failing the batch). ``action`` forces
    execution (default: a noop sink — full plan runs, nothing returns
    to the driver).

    Requires ``spark.scheduler.mode=FAIR`` for the per-query pools to
    matter; under FIFO the bound still prevents task-slot thrash.
    """
    run = action or (
        lambda df: df.write.format("noop").mode("overwrite").save()
    )
    timings: dict[str, float] = {}

    def work(name: str, thunk: Callable[[], DataFrame]) -> None:
        # pinned-thread mode: this Python thread maps to its own JVM
        # thread, so the pool property is per-query, not global
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        t0 = time.perf_counter()
        try:
            run(thunk())
            timings[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 — isolate per query
            if on_error is not None:
                on_error(name, exc)
            timings[name] = -1.0

    with ThreadPoolExecutor(max_workers=max_inflight) as ex:
        futures = [
            ex.submit(work, name, thunk) for name, thunk in queries.items()
        ]
        for f in futures:
            f.result()
    return timings
