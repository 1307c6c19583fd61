"""Unit tests for the verify module itself — the local mirror of the
driver's correctness gate. The gate caught nothing for four rounds and
then round 5 showed it could MASK a failure class (array-typed outputs
pass the tuple hash but crash the driver's pandas canonicalizer), so
its behavior is now contract, not implementation detail.
"""

from __future__ import annotations

import datetime
import math

import pytest

from mitoscape_spark.verify import (
    _canon_value,
    _driver_canon_gate,
    _hash_rows,
)


# ------------------------------------------------------- value canon
def test_canon_value_floats():
    assert _canon_value(None) == "NULL"
    assert _canon_value(float("nan")) == "NaN"
    assert _canon_value(3.0) == "3"  # integral floats fold to ints
    assert _canon_value(-0.0) == "0"
    # sub-ulp noise beyond 9 decimals is rounded away
    assert _canon_value(0.1234567891) == _canon_value(0.12345678911)
    assert _canon_value(1.5) == "1.5"


def test_canon_value_non_floats():
    assert _canon_value([1, 2.0, None]) == "[1,2,NULL]"
    assert _canon_value((1, "a")) == "[1,a]"
    assert _canon_value(b"\x00\xff") == "00ff"
    assert _canon_value(datetime.date(2026, 1, 2)) == "2026-01-02"
    assert _canon_value("x|y") == "x|y"
    assert _canon_value(7) == "7"


# --------------------------------------------------------- row hash
def test_hash_rows_is_order_insensitive():
    cols = ["b", "a"]
    rows = [(1, "x"), (2, "y")]
    assert _hash_rows(cols, rows) == _hash_rows(cols, list(reversed(rows)))


def test_hash_rows_sorts_columns_by_name():
    # same logical table, different column order → same hash
    h1 = _hash_rows(["a", "b"], [(1, 2), (3, 4)])
    h2 = _hash_rows(["b", "a"], [(2, 1), (4, 3)])
    assert h1 == h2


def test_hash_rows_distinguishes_values():
    assert _hash_rows(["a"], [(1,)]) != _hash_rows(["a"], [(2,)])
    assert _hash_rows(["a"], [(1,), (1,)]) != _hash_rows(["a"], [(1,)])


def test_hash_rows_float_int_equivalence():
    # Spark often returns 3.0 where DuckDB returns 3 — must hash equal
    assert _hash_rows(["a"], [(3.0,)]) == _hash_rows(["a"], [(3,)])
    assert not math.isnan(1.0)  # silence "unused import" linters


# ------------------------------------------------ driver pandas gate
def test_driver_gate_passes_scalar_rows():
    _driver_canon_gate(["a", "b"], [(1, "x"), (2, None)])  # no raise


def test_driver_gate_rejects_array_cells():
    """The round-5 failure class: list/ndarray cells crash the
    driver's pandas sort_values — the local gate must reproduce it."""
    with pytest.raises(TypeError, match="unhashable"):
        _driver_canon_gate(
            ["doc_id", "tokens"], [(1, ["a", "b"]), (2, ["c"])]
        )


def test_driver_gate_rejects_ndarray_cells():
    import numpy as np

    with pytest.raises(TypeError, match="unhashable"):
        _driver_canon_gate(
            ["doc_id", "tokens"],
            [(1, np.array(["a"])), (2, np.array(["b"]))],
        )


def test_driver_gate_empty_result_ok():
    _driver_canon_gate(["a"], [])  # empty frames skip the sort
