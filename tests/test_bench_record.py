"""bench.py's self-adjudicating record (round-10 verdict items 2–3).

Pins (a) the quiet-window gate: the default threshold must flag the
exact load level (3.3) that round 10 stamped ``contended: false`` while
the figures were measurably off; (b) the paired DuckDB control: the
in-process oracle timing that makes the record load-invariant.
No SparkSession needed — both pieces are Spark-free by design.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_default_threshold_flags_the_r10_load(monkeypatch):
    """loadavg 3.3 slipped under the old <4 gate in round 10 and
    manufactured an apparent 1.6x regression; the tightened default
    must flag it (round-10 verdict item 3)."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LOAD_THRESHOLD", raising=False)
    thr = bench.quiet_threshold()
    assert thr == 2.0
    assert bench.is_contended(3.3, thr) is True
    # genuinely idle readings stay uncontended
    assert bench.is_contended(0.15, thr) is False
    assert bench.is_contended(2.0, thr) is False  # boundary: not above
    # platforms without getloadavg never flag
    assert bench.is_contended(None, thr) is False


def test_threshold_env_override_still_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_THRESHOLD", "7.5")
    assert bench.quiet_threshold() == 7.5


def test_duckdb_control_times_the_full_oracle_set():
    """The control must execute every Q-series oracle on the same
    parquet and return a positive wall-clock — this is the denominator
    of the gate's paired_ratio (round-10 verdict item 2)."""
    from mitoscape_spark.queries.relational import ORACLE, QUERIES

    # the control covers exactly the bench query set
    assert set(ORACLE) == set(QUERIES)
    dt = bench.duckdb_control_seconds("/root/testdata/sf0.001", rounds=1)
    assert dt > 0


def test_paired_ratio_is_load_invariant_algebra():
    """paired_ratio = spark / control by construction: scaling both by
    a box-slowdown factor leaves it unchanged — the property the round
    10 forensics lacked."""
    spark_s, control_s, slow = 1.2, 1.5, 2.7
    base = spark_s / control_s
    paired = (spark_s * slow) / (control_s * slow)
    assert abs(paired - base) < 1e-12
