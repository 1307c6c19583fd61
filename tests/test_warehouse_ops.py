"""Heavy hitters (exact two-pass), SCD Type-2, seasonal decomposition."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mitoscape_spark.operators.heavyhitters import (
    exact_heavy_hitters,
    local_candidates,
)
from mitoscape_spark.operators.scd import scd2_apply, scd2_init
from mitoscape_spark.operators.timeseries import seasonal_decompose_dow


# ---------------------------------------------------------------- heavy hitters


def test_heavy_hitters_matches_naive_groupby(spark, sf_t2):
    events = spark.read.parquet(f"{sf_t2}/events.parquet")
    got = {
        (r.user_id, r.n)
        for r in exact_heavy_hitters(events, ["user_id"], 80).collect()
    }
    want = {
        (r.user_id, r.n)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 80)
        .collect()
    }
    assert got == want and got  # non-vacuous at sf0.01


def test_heavy_hitters_exact_across_many_partitions(spark):
    # key 7 appears 40x scattered over 16 partitions — per-partition
    # counts are small, the pigeonhole bound (ceil(40/16)=3) must still
    # surface it; keys under threshold must drop even if locally dense
    rows = [(7,)] * 40 + [(i,) for i in range(100, 130)] * 1 + [(8,)] * 9
    df = spark.createDataFrame(rows, "k long").repartition(16)
    out = exact_heavy_hitters(df, ["k"], 10).collect()
    assert {(r.k, r.n) for r in out} == {(7, 40)}


def test_heavy_hitters_null_key_counted(spark):
    df = spark.createDataFrame(
        [(None,)] * 5 + [(1,)] * 5 + [(2,)], "k long"
    ).repartition(3)
    out = {(r.k, r.n) for r in exact_heavy_hitters(df, ["k"], 5).collect()}
    assert out == {(None, 5), (1, 5)}


def test_heavy_hitters_multi_column_key(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 6 + [("a", 2)] * 4 + [("b", 1)] * 6, "s string, k long"
    ).repartition(4)
    out = {
        (r.s, r.k, r.n)
        for r in exact_heavy_hitters(df, ["s", "k"], 5).collect()
    }
    assert out == {("a", 1, 6), ("b", 1, 6)}


def test_local_candidates_superset_never_misses(spark):
    # adversarial spread: a true heavy hitter split as thinly as
    # possible across partitions is still locally >= ceil(T/P) somewhere
    df = spark.createDataFrame([(1,)] * 17 + [(2,)] * 3, "k long").repartition(8)
    cands = {r.k for r in local_candidates(df, ["k"], 3).collect()}
    assert 1 in cands


# ------------------------------------------------------------------------ SCD2


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "addr-a", "gold"), (2, "addr-b", "silver"), (3, None, "gold")],
        "id long, addr string, tier string",
    )
    return scd2_init(snap, batch_id=0)


def test_scd2_noop_change_mints_no_version(spark):
    dim = _dim(spark)
    changes = spark.createDataFrame(
        [(2, "addr-b", "silver")], "id long, addr string, tier string"
    )
    out = scd2_apply(dim, changes, ["id"], ["addr", "tier"], batch_id=1)
    assert out.count() == 3
    assert out.where(F.col("is_current") == 1).count() == 3


def test_scd2_change_closes_and_opens(spark):
    dim = _dim(spark)
    changes = spark.createDataFrame(
        [(1, "addr-z", "gold"), (9, "addr-n", "bronze")],
        "id long, addr string, tier string",
    )
    out = scd2_apply(dim, changes, ["id"], ["addr", "tier"], batch_id=1)
    rows = {
        (r.id, r.addr, r.effective_from, r.effective_to, r.is_current)
        for r in out.collect()
    }
    assert (1, "addr-a", 0, 1, 0) in rows  # closed old version
    assert (1, "addr-z", 1, None, 1) in rows  # opened new version
    assert (9, "addr-n", 1, None, 1) in rows  # brand-new key
    assert (2, "addr-b", 0, None, 1) in rows  # untouched passes through
    assert len(rows) == 5


def test_scd2_null_tracked_value_transitions(spark):
    # NULL -> value and value -> NULL are real changes (null-safe diff);
    # NULL == NULL is a no-op
    dim = _dim(spark)
    changes = spark.createDataFrame(
        [(3, None, "gold"), (2, None, "silver")],
        "id long, addr string, tier string",
    )
    out = scd2_apply(dim, changes, ["id"], ["addr", "tier"], batch_id=1)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[3]) == 1 and by_id[3][0].is_current == 1  # no-op
    assert {(r.addr, r.is_current) for r in by_id[2]} == {
        ("addr-b", 0),
        (None, 1),
    }  # value -> NULL closed + reopened


def test_scd2_second_batch_stacks_history(spark):
    dim = _dim(spark)
    c1 = spark.createDataFrame(
        [(1, "addr-z", "gold")], "id long, addr string, tier string"
    )
    v1 = scd2_apply(dim, c1, ["id"], ["addr", "tier"], batch_id=1)
    c2 = spark.createDataFrame(
        [(1, "addr-q", "gold")], "id long, addr string, tier string"
    )
    v2 = scd2_apply(v1, c2, ["id"], ["addr", "tier"], batch_id=2)
    hist = sorted(
        (r.effective_from, r.effective_to, r.addr, r.is_current)
        for r in v2.where(F.col("id") == 1).collect()
    )
    assert hist == [
        (0, 1, "addr-a", 0),
        (1, 2, "addr-z", 0),
        (2, None, "addr-q", 1),
    ]


# ---------------------------------------------------------------- seasonal/dow


def test_seasonal_decompose_dow_math(spark):
    # 3 weeks of synthetic dailies: value = 100 + 10*iso_dow, except one
    # spiked Wednesday — seasonal mean absorbs the weekly ramp, the
    # spike alone crosses the 3-sigma fence
    rows = []
    base = datetime.datetime(2024, 1, 1)  # a Monday
    for d in range(21):
        day = base + datetime.timedelta(days=d)
        iso = day.isoweekday()
        v = 100.0 + 10 * iso + (500.0 if d == 9 else 0.0)  # d=9: Wed wk2
        rows.append((d, day, v))
    df = spark.createDataFrame(rows, "id long, ts timestamp, value double")
    out = seasonal_decompose_dow(df, sigma=3.0)
    assert out.count() == 21
    flagged = [r for r in out.collect() if r.is_anomaly]
    assert [str(r.day) for r in flagged] == ["2024-01-10"]
    # unspiked dows decompose exactly: residual 0
    clean = {r.resid for r in out.collect() if r.dow != 3}
    assert clean == {0.0}


def test_seasonal_decompose_iso_dow_labels(spark):
    df = spark.createDataFrame(
        [(0, datetime.datetime(2024, 1, 7), 1.0)],  # a Sunday
        "id long, ts timestamp, value double",
    )
    assert seasonal_decompose_dow(df).head().dow == 7


# ------------------------------------------------------------------ corr matrix


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from mitoscape_spark.operators.profile import correlation_matrix

    rng = np.random.RandomState(3)
    x = rng.randn(200)
    y = 2 * x + rng.randn(200) * 0.1
    z = rng.randn(200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert abs(got[("x", "y")] - np.corrcoef(x, y)[0, 1]) < 1e-6
    assert abs(got[("y", "z")] - np.corrcoef(y, z)[0, 1]) < 1e-6


def test_correlation_matrix_is_one_job(spark):
    from mitoscape_spark.operators.profile import correlation_matrix

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = correlation_matrix(li, ["l_quantity", "l_extendedprice", "l_tax"])
    # single aggregation: exactly one Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


# ------------------------------------------------------------------- PSI drift


def test_drift_psi_zero_for_identical_distributions(spark):
    from mitoscape_spark.operators.drift import drift_report

    df = spark.range(1000).select(
        (F.col("id") % 10).cast("double").alias("x")
    )
    psi = {
        r.col_name: r.psi for r in drift_report(df, df, ["x"]).collect()
    }
    assert psi["x"] == 0.0


def test_drift_psi_detects_shift_and_clips_out_of_range(spark):
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    # current: shifted well past the reference max — all mass clips into
    # the top bin, PSI must be large
    cur = spark.range(1000).select(
        (F.col("id") % 100 + 500).cast("double").alias("x")
    )
    psi = {r.col_name: r.psi for r in drift_report(ref, cur, ["x"]).collect()}
    assert psi["x"] > 1.0


def test_drift_psi_moderate_shift_ranks_between(spark):
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(2000).select((F.col("id") % 100).cast("double").alias("x"))
    mild = spark.range(2000).select(
        ((F.col("id") * 7) % 110).cast("double").alias("x")  # 10% spill
    )
    psi = {r.col_name: r.psi for r in drift_report(ref, mild, ["x"]).collect()}
    assert 0.0 < psi["x"] < 1.0


def test_drift_psi_constant_reference_column(spark):
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(100).select(F.lit(5.0).alias("x"))
    cur = spark.range(100).select(
        (F.lit(5.0) + (F.col("id") % 2)).alias("x")
    )
    # degenerate edges: everything lands in bin 0 on both sides → PSI 0
    # (drift invisible to a constant-reference histogram is a documented
    # limitation, not a crash)
    psi = {r.col_name: r.psi for r in drift_report(ref, cur, ["x"]).collect()}
    assert psi["x"] == 0.0


def test_drift_categorical_known_psi_and_null_category(spark):
    """Categorical PSI against a hand-computed value, with NULL as its
    own category. ref: a=0.5, b=0.5; cur: a=0.25, b=0.25, NULL=0.5 →
    PSI = Σ (p_c−p_r)·ln(p_c/p_r) with the NULL category's ref side
    epsilon-clamped."""
    import math

    from mitoscape_spark.operators.drift import drift_report_categorical

    ref = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",)], "v string"
    )
    cur = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "v string"
    )
    psi = {
        r.col_name: r.psi
        for r in drift_report_categorical(ref, cur, ["v"]).collect()
    }
    eps = 1e-6
    want = (
        2 * (0.25 - 0.5) * math.log(0.25 / 0.5)
        + (0.5 - eps) * math.log(0.5 / eps)
    )
    assert abs(psi["v"] - round(want, 6)) < 1e-6


def test_drift_report_dispatches_mixed_column_types(spark):
    """drift_report with one numeric + one string column: the string
    column must route to categorical PSI (it used to abort the whole
    report with an ANSI CAST error), numeric to histogram PSI, both
    landing in one (col_name, psi) table."""
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(200).select(
        (F.col("id") % 10).cast("double").alias("x"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    cur = spark.range(200).select(
        (F.col("id") % 10).cast("double").alias("x"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("fr").alias("lang"),
    )
    psi = {
        r.col_name: r.psi
        for r in drift_report(ref, cur, ["x", "lang"]).collect()
    }
    assert set(psi) == {"x", "lang"}
    assert psi["x"] == 0.0  # identical numeric distribution
    assert psi["lang"] > 0.05  # 50/50 → 25/75 mix shift


def test_drift_report_date_column_routes_to_categorical(spark):
    """Non-numeric, non-string dtypes (date here) must route to the
    categorical path too — CAST(DATE AS DOUBLE) aborts under ANSI
    mode, so a snapshot-date partition column used to kill the whole
    report."""
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(100).select(
        F.date_add(F.lit("2026-01-01"), (F.col("id") % 3).cast("int")).alias("d")
    )
    cur = spark.range(100).select(
        F.date_add(F.lit("2026-01-01"), (F.col("id") % 5).cast("int")).alias("d")
    )
    psi = {
        r.col_name: r.psi for r in drift_report(ref, cur, ["d"]).collect()
    }
    assert psi["d"] > 0.0  # 3 categories → 5 categories is drift
    same = {
        r.col_name: r.psi for r in drift_report(ref, ref, ["d"]).collect()
    }
    assert same["d"] == 0.0


def test_drift_report_grouped_dispatches_string_columns(spark):
    """Grouped drift with a string measure column routes to the
    per-stratum categorical path (same ANSI CAST hazard as the
    ungrouped report); numeric columns keep the histogram path, both
    in one output."""
    from mitoscape_spark.operators.drift import drift_report_grouped

    ref = spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") % 10).cast("double").alias("x"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    cur = spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") % 10).cast("double").alias("x"),
        # group 0 keeps its mix, group 1 flips entirely to "de"
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    psi = {
        (r.grp, r.col_name): r.psi
        for r in drift_report_grouped(
            ref, cur, "grp", ["x", "lang"]
        ).collect()
    }
    assert set(psi) == {("0", "x"), ("0", "lang"), ("1", "x"), ("1", "lang")}
    assert psi[("0", "lang")] == 0.0  # unchanged stratum
    assert psi[("1", "lang")] > 1.0  # full category replacement
    assert psi[("0", "x")] == 0.0 and psi[("1", "x")] == 0.0


# ------------------------------------------------------------------- FFD packs


def test_bin_pack_ffd_respects_budget_and_covers_all_rows(spark):
    from mitoscape_spark.operators.packing import bin_pack_ffd

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 900 + 50).alias("n_tokens"),
    )
    out = bin_pack_ffd(df, budget=1000, n_groups=8)
    rows = out.collect()
    assert len(rows) == 500
    fills = {}
    for r in rows:
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
    assert all(f <= 1000 for f in fills.values())
    # FFD quality: total waste bounded (every pack but the last per
    # group is > half full under FFD)
    total = sum(r.n_tokens for r in rows)
    assert len(fills) <= (total // 1000 + 1) * 2


def test_bin_pack_ffd_oversized_row_fails_loudly(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from mitoscape_spark.operators.packing import bin_pack_ffd

    df = spark.createDataFrame(
        [(1, 100), (2, 5000)], "doc_id long, n_tokens long"
    )
    with _pytest.raises(Exception) as ei:
        bin_pack_ffd(df, budget=1000).collect()
    assert "outside [0," in str(ei.value)


def test_bin_pack_ffd_deterministic(spark):
    from mitoscape_spark.operators.packing import bin_pack_ffd

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 13) % 500 + 1).alias("n_tokens"),
    )
    a = {(r.doc_id, r.pack_id) for r in bin_pack_ffd(df, budget=600).collect()}
    b = {(r.doc_id, r.pack_id) for r in bin_pack_ffd(df, budget=600).collect()}
    assert a == b


# ------------------------------------------------------------ incremental LSH


def test_incremental_minhash_pairs_equals_from_scratch_delta(spark, sf_t2):
    from mitoscape_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_bands,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_t2}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)

    old_bands = minhash_bands(minhash_signatures(old))
    incr, new_bands = incremental_minhash_pairs(old_bands, new)

    all_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(minhash_signatures(docs)).collect()
    }
    old_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(minhash_signatures(old)).collect()
    }
    got = {(r.doc_a, r.doc_b) for r in incr.collect()}
    assert got == all_pairs - old_pairs
    # updated index equals the from-scratch index
    merged = {
        (r.doc_id, r.band, r.band_key)
        for r in old_bands.unionByName(new_bands).collect()
    }
    scratch = {
        (r.doc_id, r.band, r.band_key)
        for r in minhash_bands(minhash_signatures(docs)).collect()
    }
    assert merged == scratch


def test_incremental_minhash_reingested_doc_no_self_pair(spark):
    from mitoscape_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_bands,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    bands = minhash_bands(minhash_signatures(docs))
    incr, _ = incremental_minhash_pairs(bands, docs)  # same doc re-fed
    assert incr.count() == 0  # identical id never pairs with itself


def test_incremental_minhash_hot_bucket_cap_preserves_connectivity(spark):
    import time as _time

    from mitoscape_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_bands,
        minhash_signatures,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(500)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10_000 + i, text) for i in range(50)], "doc_id long, text string"
    )
    bands = minhash_bands(minhash_signatures(corpus))
    t0 = _time.perf_counter()
    pairs, _ = incremental_minhash_pairs(bands, batch, max_bucket_size=16)
    rows = pairs.collect()
    elapsed = _time.perf_counter() - t0
    # capped: output is linear (stars), not 500x50 cross + 50^2 within
    assert len(rows) < 2000
    # connectivity: every batch doc links into the corpus cluster
    linked = {r.doc_b for r in rows} | {r.doc_a for r in rows}
    assert all(10_000 + i in linked for i in range(50))
    assert 0 in linked  # the corpus representative (min doc_id)
    assert elapsed < 60


def test_drift_grouped_isolates_shifted_stratum(spark):
    from mitoscape_spark.operators.drift import drift_report_grouped

    ref = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
        (F.col("id") % 100).cast("double").alias("x"),
    )
    # stratum b shifts far out of its baseline; a unchanged
    cur = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
        F.when(
            F.col("id") % 2 == 0, (F.col("id") % 100).cast("double")
        ).otherwise((F.col("id") % 100 + 500).cast("double")).alias("x"),
    )
    psi = {
        (r.src, r.col_name): r.psi
        for r in drift_report_grouped(ref, cur, "src", ["x"]).collect()
    }
    assert psi[("a", "x")] == 0.0
    assert psi[("b", "x")] > 1.0


def test_drift_grouped_one_sided_group_skipped(spark):
    from mitoscape_spark.operators.drift import drift_report_grouped

    ref = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "src string, x double")
    cur = spark.createDataFrame(
        [("a", 1.5), ("c", 9.0)], "src string, x double"
    )
    rows = drift_report_grouped(ref, cur, "src", ["x"]).collect()
    assert {r.src for r in rows} == {"a"}  # c has no baseline: skipped


def test_heavy_hitters_threshold_one_degenerates_to_group_count(spark):
    from mitoscape_spark.operators.heavyhitters import exact_heavy_hitters

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long").repartition(2)
    got = {(r.k, r.n) for r in exact_heavy_hitters(df, ["k"], 1).collect()}
    assert got == {(1, 2), (2, 1)}


def test_heavy_hitters_empty_input(spark):
    from mitoscape_spark.operators.heavyhitters import exact_heavy_hitters

    df = spark.createDataFrame([], "k long")
    assert exact_heavy_hitters(df, ["k"], 5).count() == 0


def test_drift_psi_empty_current_reports_total_drift(spark):
    from mitoscape_spark.operators.drift import drift_report

    ref = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    cur = ref.where(F.lit(False))
    psi = {r.col_name: r.psi for r in drift_report(ref, cur, ["x"]).collect()}
    # every current bin collapses to epsilon: PSI blows up — absence of
    # data is maximal drift, not a silent zero
    assert psi["x"] > 5.0


def test_scd2_empty_change_batch_is_identity(spark):
    from mitoscape_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(
        spark.createDataFrame([(1, "a")], "id long, v string"), 0
    )
    empty = spark.createDataFrame([], "id long, v string")
    out = scd2_apply(dim, empty, ["id"], ["v"], batch_id=1)
    rows = [(r.id, r.v, r.effective_from, r.effective_to, r.is_current)
            for r in out.collect()]
    assert rows == [(1, "a", 0, None, 1)]


def test_bin_pack_ffd_negative_weight_fails_loudly(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.packing import bin_pack_ffd

    df = spark.createDataFrame([(1, -5)], "doc_id long, n_tokens long")
    with _pytest.raises(Exception) as ei:
        bin_pack_ffd(df, budget=100).collect()
    assert "outside [0," in str(ei.value)
