"""Training-data prep operators: deterministic sampling / mixing,
sequence packing (distributed prefix sum), benchmark decontamination.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table
from mitoscape_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)
from mitoscape_spark.operators.packing import pack_sequences
from mitoscape_spark.operators.sampling import (
    deterministic_sample,
    hex_threshold,
    weighted_mix,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ sampling
def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "0000"
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.5) == "8000"
    assert hex_threshold(0.25) == "4000"


def test_deterministic_sample_layout_independent(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.3).collect()
    )
    b = sorted(
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(13), "doc_id", 0.3
        ).collect()
    )
    assert a == b and a  # same decision under any partition layout


def test_deterministic_sample_fraction_and_edges(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    kept = deterministic_sample(docs, "doc_id", 0.5).count()
    assert abs(kept / n - 0.5) < 0.25  # md5 is uniform-ish on small n
    assert deterministic_sample(docs, "doc_id", 1.0).count() == n
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0


def test_deterministic_sample_nested_subsets(spark):
    # thresholds nest: the 20% sample is a subset of the 60% sample
    docs = load_table(spark, SF, "documents")
    small = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.2).collect()
    }
    big = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.6).collect()
    }
    assert small <= big


def test_deterministic_sample_salt_gives_different_sample(spark):
    docs = load_table(spark, SF, "documents")
    a = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.5, salt="a").collect()
    }
    b = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.5, salt="b").collect()
    }
    assert a != b


def test_weighted_mix_equals_per_stratum_samples(spark):
    docs = load_table(spark, SF, "documents")
    mixed = {
        r.doc_id
        for r in weighted_mix(
            docs, "lang", {"en": 0.25, "de": 0.5}, key_col="doc_id"
        ).collect()
    }
    expected = set()
    for lang, frac in [("en", 0.25), ("de", 0.5)]:
        expected |= {
            r.doc_id
            for r in deterministic_sample(
                docs.where(F.col("lang") == lang), "doc_id", frac
            ).collect()
        }
    expected |= {
        r.doc_id
        for r in docs.where(~F.col("lang").isin("en", "de")).collect()
    }
    assert mixed == expected


# ------------------------------------------------------------- packing
def _naive_pack(df, order_col, tokens_col, budget):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return df.select(
        order_col,
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.coalesce(F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0))
        .alias("start_offset"),
    ).withColumn("pack_id", F.expr(f"start_offset DIV {budget}"))


@pytest.mark.parametrize("bucket_width", [1, 7, 64, 10_000])
def test_pack_sequences_matches_global_window(spark, bucket_width):
    # sparse, non-contiguous order keys; bucket widths from degenerate
    # (one row per bucket) to degenerate (everything in one bucket)
    rows = [(i * 3 + (i % 5), (i * 37) % 211 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = pack_sequences(
        df, "doc_id", "n_tokens", budget=256, bucket_width=bucket_width
    )
    want = _naive_pack(df, "doc_id", "n_tokens", 256)
    assert sorted(got.collect()) == sorted(want.collect())


def test_pack_sequences_window_is_bucket_partitioned(spark):
    # the per-row window must hash-partition on the bucket key — the
    # only SinglePartition exchange allowed is the tiny bucket-totals
    # side, never the full table
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tokens int"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_sequences(df, "doc_id", "n_tokens").explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning(_bkt" in plan


# ----------------------------------------------------- decontamination
def test_decontaminate_drops_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "entirely unrelated training text here"),
            (3, "quick brown fox somewhere else"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appears")], "doc_id long, text string"
    )
    report = {
        r.doc_id: r.n_shared
        for r in contamination_report(train, bench, shingle_size=3).collect()
    }
    # docs 1 and 3 share the 3-shingle "quick brown fox"
    assert report == {1: 1, 3: 1}
    clean = {r.doc_id for r in decontaminate(train, bench, 3).collect()}
    assert clean == {2}


def test_decontaminate_counts_distinct_shared_shingles(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "a b c d")], "doc_id long, text string"
    )
    # shared 3-shingles: "a b c", "b c d"
    rows = contamination_report(train, bench, 3).collect()
    assert [(r.doc_id, r.n_shared) for r in rows] == [(1, 2)]


def test_global_row_number_matches_window_and_avoids_single_partition(
    spark,
):
    from mitoscape_spark.operators.packing import global_row_number

    df = spark.range(0, 5000).selectExpr(
        "id * 7 % 5003 AS k", "id AS payload"
    )  # unique, scattered order column
    got = global_row_number(df, "k")
    rows = {r.k: r.row_id for r in got.collect()}
    expect = {
        k: i for i, k in enumerate(sorted(rows))
    }
    assert rows == expect
    # schema keeps original columns
    assert set(got.columns) == {"k", "payload", "row_id"}
    # plan never materializes a global single-partition window over
    # the full data: the only global Sort is over the bucket table
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "row_number" not in plan.lower().replace("global_row", "")


def test_assign_splits_full_fractions_leave_no_null(spark):
    from mitoscape_spark.operators.sampling import assign_splits

    df = spark.range(200000).withColumnRenamed("id", "k")
    out = assign_splits(df, "k", {"a": 0.2, "b": 0.7, "c": 0.1})
    # 0.2+0.7+0.1 accumulates to 0.999...9 in floats: without the
    # final-band snap, prefix 'ffff' keys (~3 in 200k) went NULL
    assert out.where("split IS NULL").count() == 0


def test_sampling_null_keys_not_dropped(spark):
    from mitoscape_spark.operators.sampling import (
        deterministic_sample,
        temperature_mix,
    )

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, None)],
        "doc_id long, lang string",
    )
    # fraction=1.0 must keep EVERYTHING, null keys included
    assert deterministic_sample(
        df.withColumn("k", F.col("lang")), "k", 1.0
    ).count() == 4
    # null stratum participates in the mix (budget row exists for it)
    mixed = temperature_mix(df, "lang", "doc_id", total=4, alpha=1.0)
    langs = sorted(
        (r.lang if r.lang is not None else "<null>")
        for r in mixed.collect()
    )
    assert "<null>" in langs and "en" in langs


def test_top_fraction_zero_keeps_nothing(spark):
    from mitoscape_spark.operators.sampling import top_fraction_per_key

    df = spark.createDataFrame(
        [("s", 1.0, 1), ("s", 2.0, 2)], "src string, score double, id long"
    )
    assert top_fraction_per_key(df, "src", "score", 0.0, "id").count() == 0


def test_pack_sequences_rejects_double_order_col(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1.5, 3)], "k double, n_tokens long"
    )
    with _pytest.raises(TypeError, match="integral"):
        pack_sequences(df, order_col="k")


def test_apply_changes_unknown_op_raises_not_deletes(spark):
    from mitoscape_spark.operators.merge import apply_changes

    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    bad = spark.createDataFrame(
        [(1, "x", None), (2, "y", "Z")], "k long, v string, op string"
    )
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        apply_changes(target, bad, ["k"]).collect()
    assert "unknown CDC op" in str(ei.value)


def test_apply_changes_valid_ops_still_work(spark):
    from mitoscape_spark.operators.merge import apply_changes

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(1, "a2", "U"), (2, None, "D"), (4, "d", "I")],
        "k long, v string, op string",
    )
    got = {
        (r.k, r.v) for r in apply_changes(target, changes, ["k"]).collect()
    }
    assert got == {(1, "a2"), (3, "c"), (4, "d")}


# ------------------------------------------- stratified exact split
def test_stratified_exact_split_matches_window_ranking(spark):
    """The filter-and-refine order-statistics path must equal the naive
    per-stratum window ranking row-for-row (same hash, same
    floor(n·cum+0.5) boundary rule) — the exactness claim the oracle
    also pins at the aggregate level."""
    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = load_table(spark, SF, "documents")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in stratified_exact_split(
            docs, "lang", "doc_id", fr
        ).collect()
    }
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h)
    ref = (
        docs.withColumn("r", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
        )
        .withColumn(
            "want",
            F.when(
                F.col("r") <= F.floor(F.col("n") * 0.8 + 0.5), "train"
            )
            .when(F.col("r") <= F.floor(F.col("n") * 0.9 + 0.5), "val")
            .otherwise("test"),
        )
        .collect()
    )
    assert len(got) == len(ref)
    for r in ref:
        assert got[r["doc_id"]] == r["want"], r["doc_id"]


def test_stratified_exact_split_exact_quotas_and_holdout(spark):
    """Every (stratum, split) cell gets exactly floor(n·cum+0.5) −
    floor(n·prev_cum+0.5) rows; fractions summing below 1 leave a NULL
    holdout of exactly the remainder."""
    import math

    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = load_table(spark, SF, "documents")
    out = stratified_exact_split(
        docs, ["lang", "source"], "doc_id", {"a": 0.5, "b": 0.25}
    )
    cells: dict = {}
    for r in out.groupBy("lang", "source", "split").count().collect():
        cells.setdefault((r["lang"], r["source"]), {})[r["split"]] = r[
            "count"
        ]
    assert cells  # multi-column strata resolved
    for key, per in cells.items():
        n = sum(per.values())
        ka = int(math.floor(n * 0.5 + 0.5))
        kb = int(math.floor(n * 0.75 + 0.5)) - ka
        assert per.get("a", 0) == ka, (key, per)
        assert per.get("b", 0) == kb, (key, per)
        assert per.get(None, 0) == n - ka - kb, (key, per)


def test_stratified_exact_split_null_stratum_assigned(spark):
    """A NULL stratum is a real group: quotas/thresholds are computed
    for it (band predicates are eqNullSafe), so the final threshold
    join must be null-safe too — a plain equi-join left every
    NULL-stratum row with split=NULL even at fractions summing to 1.0
    (round-5 advice, medium)."""
    import math

    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = load_table(spark, SF, "documents").limit(120)
    docs = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 6 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    n_null = docs.where(F.col("lang").isNull()).count()
    assert n_null >= 10  # the regression needs a populated NULL group
    out = stratified_exact_split(
        docs, "lang", "doc_id", {"train": 0.8, "test": 0.2}
    )
    per = {
        r["split"]: r["count"]
        for r in out.where(F.col("lang").isNull())
        .groupBy("split")
        .count()
        .collect()
    }
    k_train = int(math.floor(n_null * 0.8 + 0.5))
    assert per.get("train", 0) == k_train
    assert per.get("test", 0) == n_null - k_train
    assert None not in per  # fractions sum to 1.0 → no holdout


def test_stratified_exact_split_null_in_multi_column_strata(spark):
    """NULL in ONE of several strata columns: the renamed null-safe
    join condition must key each column independently (a (NULL, 'web')
    stratum is distinct from ('en', 'web') and from (NULL, NULL))."""
    import math

    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = load_table(spark, SF, "documents").limit(120)
    docs = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 4 == 0, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    out = stratified_exact_split(
        docs, ["lang", "source"], "doc_id", {"a": 0.5, "b": 0.5}
    )
    cells: dict = {}
    for r in (
        out.groupBy("lang", "source", "split").count().collect()
    ):
        cells.setdefault((r["lang"], r["source"]), {})[r["split"]] = r[
            "count"
        ]
    null_keys = [k for k in cells if k[0] is None]
    assert null_keys  # planted NULL strata exist
    for key, per in cells.items():
        n = sum(per.values())
        ka = int(math.floor(n * 0.5 + 0.5))
        assert per.get("a", 0) == ka, (key, per)
        assert per.get("b", 0) == n - ka, (key, per)
        assert None not in per, (key, per)


def test_stratified_exact_split_validates_fractions(spark):
    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="sum to > 1"):
        stratified_exact_split(docs, "lang", "doc_id", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError, match="must be > 0"):
        stratified_exact_split(docs, "lang", "doc_id", {"a": 0.5, "b": 0.0})
    with pytest.raises(ValueError, match="empty"):
        stratified_exact_split(docs, "lang", "doc_id", {})


# ------------------------------------- weighted sampling (ES scheme)
def test_weighted_sample_biased_deterministic_no_replacement(spark):
    from mitoscape_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    # 50 heavy rows (w=200) vs 150 light rows (w=1)
    rows = [(i, 200.0 if i < 50 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [
        r["id"]
        for r in weighted_sample_without_replacement(
            df, "w", k=40, id_col="id"
        ).collect()
    ]
    assert len(got) == len(set(got)) == 40  # without replacement
    heavy = sum(1 for i in got if i < 50)
    # heavy rows are 25% of the population but ~99% of the mass;
    # any sane draw puts well over half the sample on them
    assert heavy > 25, heavy
    again = [
        r["id"]
        for r in weighted_sample_without_replacement(
            df, "w", k=40, id_col="id"
        ).collect()
    ]
    assert got == again  # deterministic


def test_weighted_sample_grouped_and_excludes_nonpositive(spark):
    import pytest

    from mitoscape_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [("a", i, float(i % 5)) for i in range(20)] + [
        ("b", 100 + i, 1.0) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    out = weighted_sample_without_replacement(
        df, "w", k=5, id_col="id", group_col="g"
    ).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["a"]) == 5
    assert sorted(by_g["b"]) == [100, 101, 102]  # fewer rows than k
    # w=0 rows (i % 5 == 0) can never be sampled
    assert all(i % 5 != 0 for i in by_g["a"])
    with pytest.raises(ValueError, match="k >= 1"):
        weighted_sample_without_replacement(df, "w", k=0, id_col="id")


def test_stratified_exact_split_caller_temp_name_collision(spark):
    """A caller column literally named `_s_0` or `_t_0` must not make
    the null-safe threshold join ambiguous or get eaten by the temp-
    column drop (round-6 advice item 2)."""
    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = (
        load_table(spark, SF, "documents")
        .limit(60)
        .withColumn("_s_0", F.lit("keep-s"))
        .withColumn("_t_0", F.lit("keep-t"))
    )
    out = stratified_exact_split(
        docs, "lang", "doc_id", {"train": 0.5, "test": 0.5}
    )
    assert "_s_0" in out.columns and "_t_0" in out.columns
    rows = out.select("_s_0", "_t_0", "split").collect()
    assert all(r["_s_0"] == "keep-s" and r["_t_0"] == "keep-t" for r in rows)
    assert all(r["split"] in ("train", "test") for r in rows)


def test_stratified_exact_split_caller_hash_name_collision(spark):
    """A caller column literally named `_h` or `_hd` must survive: the
    internal md5-hash temp columns deepen their prefix past the caller's
    schema instead of clobbering-then-dropping them (round-7 advice
    item 1 — the same defect class as the `_t_0`/`_s_0` fix)."""
    from mitoscape_spark.operators.sampling import stratified_exact_split

    docs = (
        load_table(spark, SF, "documents")
        .limit(60)
        .withColumn("_h", F.lit("keep-h"))
        .withColumn("_hd", F.lit(7).cast("double"))
    )
    out = stratified_exact_split(
        docs, "lang", "doc_id", {"train": 0.5, "test": 0.5}
    )
    assert "_h" in out.columns and "_hd" in out.columns
    rows = out.select("_h", "_hd", "split").collect()
    assert all(r["_h"] == "keep-h" and r["_hd"] == 7.0 for r in rows)
    assert all(r["split"] in ("train", "test") for r in rows)
    # quotas still exact with the deepened temp names: per-stratum
    # k = floor(n_s/2 + 0.5), so the train total can exceed half by at
    # most one row per stratum (documents.lang has a handful of values)
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert abs(n_train - len(rows) / 2) <= 6
