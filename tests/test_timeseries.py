"""Gap-filling / forward-fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from mitoscape_spark.operators.timeseries import daily_gapfill, daily_rollup


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, 12), v) for u, d, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_zero_fill_covers_global_span(spark):
    ev = _ev(spark, [(1, 1, 5.0), (1, 3, 7.0), (2, 2, 1.0)])
    out = {
        (r["key"], str(r["day"])): r["total"]
        for r in daily_gapfill(ev, fill="zero").collect()
    }
    # span Jan 1..3 for EVERY key, missing days zero
    assert out == {
        (1, "2024-01-01"): 5.0,
        (1, "2024-01-02"): 0.0,
        (1, "2024-01-03"): 7.0,
        (2, "2024-01-01"): 0.0,
        (2, "2024-01-02"): 1.0,
        (2, "2024-01-03"): 0.0,
    }


def test_ffill_carries_last_observation(spark):
    ev = _ev(spark, [(1, 1, 5.0), (1, 4, 2.0), (2, 3, 9.0)])
    out = {
        (r["key"], str(r["day"])): r["total"]
        for r in daily_gapfill(ev, fill="ffill").collect()
    }
    assert out[(1, "2024-01-02")] == 5.0  # carried
    assert out[(1, "2024-01-03")] == 5.0  # still carried
    assert out[(1, "2024-01-04")] == 2.0  # new observation
    assert out[(2, "2024-01-01")] is None  # before first obs: null
    assert out[(2, "2024-01-04")] == 9.0


def test_daily_rollup_sums_within_day(spark):
    ev = _ev(spark, [(1, 1, 1.5), (1, 1, 2.5)])
    (row,) = daily_rollup(ev).collect()
    assert row["total"] == 4.0


def test_invalid_fill_raises(spark):
    with pytest.raises(ValueError, match="zero|ffill"):
        daily_gapfill(_ev(spark, [(1, 1, 1.0)]), fill="interpolate")


def test_ewma_matches_recursive_definition(spark):
    """Window-factored EWMA must equal the recursive definition
    ewma_t = (x_t + d*w_{t-1}*ewma_{t-1}) / (1 + d*w_{t-1}) computed in
    plain Python (renormalized weights)."""
    from mitoscape_spark.operators.timeseries import ewma_daily

    ev = _ev(spark, [(1, d, float(v)) for d, v in
                     [(1, 10), (2, 20), (3, 0), (5, 40)]])
    got = {
        str(r["day"]): r["ewma"]
        for r in ewma_daily(ev, decay=0.9).collect()
    }
    # reference: weights d^(t-ti) over observed days, renormalized
    obs = [(0, 10.0), (1, 20.0), (2, 0.0), (4, 40.0)]
    import math

    for i in range(len(obs)):
        t = obs[i][0]
        num = sum(x * 0.9 ** (t - ti) for ti, x in obs[: i + 1])
        den = sum(0.9 ** (t - ti) for ti, _ in obs[: i + 1])
        day = f"2024-01-0{obs[i][0] + 1}"
        assert math.isclose(got[day], round(num / den, 6), abs_tol=1e-6), day


def test_ewma_first_day_equals_total(spark):
    from mitoscape_spark.operators.timeseries import ewma_daily

    ev = _ev(spark, [(1, 1, 7.5), (2, 3, 2.5)])
    rows = {r["key"]: r for r in ewma_daily(ev).collect()}
    assert rows[1]["ewma"] == rows[1]["total"]
    assert rows[2]["ewma"] == rows[2]["total"]


def test_ewma_raises_past_numeric_horizon(spark):
    """A key whose history exceeds the float validity horizon must
    fail loudly, not return Inf/NaN ewma values."""
    import datetime as dt

    import pytest as _pytest

    from mitoscape_spark.operators.timeseries import ewma_daily

    rows = [
        (1, dt.datetime(2000, 1, 1), 1.0),
        (1, dt.datetime(2006, 1, 1), 2.0),  # ~2200-day span
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    with _pytest.raises(ValueError, match="numerically valid"):
        ewma_daily(df, decay=0.5)
    # same span is fine at a slower decay (horizon ~6500 days)
    out = ewma_daily(df, decay=0.9).collect()
    assert all(r.ewma == r.ewma for r in out)  # no NaN


def test_linear_interpolates_between_observations(spark):
    """fill='linear': missing days blend the surrounding observations
    day-weighted; outside a key's observed range stays null (the
    TimescaleDB interpolate() contract)."""
    ev = _ev(spark, [(1, 1, 10.0), (1, 4, 40.0), (2, 2, 8.0), (2, 3, 6.0)])
    out = {
        (r["key"], str(r["day"])): r["total"]
        for r in daily_gapfill(ev, fill="linear").collect()
    }
    assert out[(1, "2024-01-01")] == 10.0
    assert out[(1, "2024-01-02")] == 20.0  # 10 + (40-10)*1/3
    assert out[(1, "2024-01-03")] == 30.0
    assert out[(1, "2024-01-04")] == 40.0
    assert out[(2, "2024-01-01")] is None  # before first obs
    assert out[(2, "2024-01-04")] is None  # after last obs
    assert out[(2, "2024-01-02")] == 8.0
    assert out[(2, "2024-01-03")] == 6.0


def test_gapfill_rejects_unknown_fill(spark):
    ev = _ev(spark, [(1, 1, 1.0)])
    with pytest.raises(ValueError, match="zero|ffill|linear"):
        daily_gapfill(ev, fill="nearest")
