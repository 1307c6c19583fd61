"""Pure-Python pieces of the measurement tools (tools/serial_floor.py):
the interval-union helper IS the instrument behind PERF.md's serial
floor decomposition — pin its merge semantics so a regression can't
silently skew the exec/floor split.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from serial_floor import _merged_window_sec  # noqa: E402


def _job(sub: str, comp: str) -> dict:
    return {"submissionTime": sub, "completionTime": comp}


def _ts(sec: float) -> str:
    # Spark REST format: 2026-08-14T21:00:SS.mmmGMT
    whole = int(sec)
    frac = int(round((sec - whole) * 1000))
    return f"2026-08-14T21:00:{whole:02d}.{frac:03d}GMT"


def test_merged_window_disjoint_sums():
    jobs = [_job(_ts(1), _ts(2)), _job(_ts(5), _ts(7))]
    assert abs(_merged_window_sec(jobs) - 3.0) < 1e-6


def test_merged_window_overlap_not_double_counted():
    # [1,4] and [2,6] overlap: union = 5, naive sum = 7
    jobs = [_job(_ts(1), _ts(4)), _job(_ts(2), _ts(6))]
    assert abs(_merged_window_sec(jobs) - 5.0) < 1e-6


def test_merged_window_contained_interval():
    jobs = [_job(_ts(1), _ts(10)), _job(_ts(3), _ts(4))]
    assert abs(_merged_window_sec(jobs) - 9.0) < 1e-6


def test_merged_window_skips_incomplete_jobs():
    jobs = [_job(_ts(1), _ts(2)), {"submissionTime": _ts(5)}]
    assert abs(_merged_window_sec(jobs) - 1.0) < 1e-6


def test_merged_window_empty():
    assert _merged_window_sec([]) == 0.0
