"""kaplan_meier vs hand-computed survival on textbook fixtures."""

import pytest

from mitoscape_spark.operators.timeseries import kaplan_meier


def test_km_textbook_example(spark):
    # classic: events at t=1 (n=5), t=3 (n=3, after censor at 2);
    # S(1) = 4/5, S(3) = 4/5 * 2/3
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "duration long, event int")
    got = {
        r["duration"]: (
            r["n_at_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in kaplan_meier(df).collect()
    }
    assert got[1] == (5, 1, 0, pytest.approx(0.8, abs=1e-6))
    assert got[3] == (3, 1, 0, pytest.approx(0.8 * 2 / 3, abs=1e-6))
    assert set(got) == {1, 3}  # event times only


def test_km_no_censoring_matches_ecdf(spark):
    # all events: S(t) = fraction with duration > t
    rows = [(d, 1) for d in [1, 1, 2, 3, 3, 3, 5, 8, 8, 10]]
    df = spark.createDataFrame(rows, "duration long, event int")
    got = {r["duration"]: r["survival"] for r in kaplan_meier(df).collect()}
    durs = [d for d, _ in rows]
    for t in sorted(set(durs)):
        want = sum(1 for d in durs if d > t) / len(durs)
        assert got[t] == pytest.approx(want, abs=1e-6)
    assert got[10] == 0.0  # curve terminates exactly at zero


def test_km_all_censored_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(3, 0), (7, 0)], "duration long, event int"
    )
    assert kaplan_meier(df).count() == 0
