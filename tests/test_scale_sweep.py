"""Scale-regression sweep: every declared query must complete at sf0.1
within a per-query wall-clock budget.

This is the audit that caught three quadratic blowups (PERF.md §12–14):
operators can be correct at the sf0.01 oracle gate and still carry an
O(n²)-rows join or an AQE-coalesced serial stage that only shows one
scale factor up. Opt-in (SPARK_GRAFT_SCALE_SWEEP=1) because the full
sweep costs minutes — run it before claiming any operator scales.
"""

from __future__ import annotations

import os
import time

import pytest

from mitoscape_spark.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.1")
BUDGET_S = float(os.environ.get("SPARK_GRAFT_SWEEP_BUDGET", "60"))

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_SWEEP"),
    reason="scale sweep is opt-in: SPARK_GRAFT_SCALE_SWEEP=1",
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_completes_within_budget_at_sf01(spark, name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    assert elapsed < BUDGET_S, (
        f"{name} took {elapsed:.1f}s at {SF} (budget {BUDGET_S:.0f}s) — "
        "check for quadratic row amplification, a serialized stage, or "
        "an AQE-coalesced exchange ahead of a row explosion (PERF.md §13)"
    )
