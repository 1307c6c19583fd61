"""Data-quality surface: PII redaction / normalization, table
profiling, constraint validation, merge/upsert, hash splits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mitoscape_spark.catalog import load_table
from mitoscape_spark.operators.merge import apply_changes, merge_upsert
from mitoscape_spark.operators.profile import (
    check_unique,
    orphan_rows,
    profile_columns,
    quality_summary,
)
from mitoscape_spark.operators.redact import (
    normalize_text,
    pii_counts,
    redact_pii,
)
from mitoscape_spark.operators.sampling import assign_splits

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------------- redact
def test_redact_pii_all_patterns(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk today"),
            (2, "see https://example.com/a/b?q=1#frag for details"),
            (3, "call +1(555)123-4567 now"),
            (4, "clean text, nothing to hide"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.redacted for r in redact_pii(docs).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "see <URL> for details"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "clean text, nothing to hide"


def test_pii_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a@b.io c@d.io and https://x.y plus +1555123456789")],
        "doc_id long, text string",
    )
    r = pii_counts(docs).first()
    assert (r.n_email, r.n_url, r.n_phone) == (2, 1, 1)


def test_redact_credit_cards_luhn_gate(spark):
    """Only Luhn-valid card-shaped runs redact; invalid digit runs
    (order ids), short runs, and >19-digit runs are untouched."""
    from mitoscape_spark.operators.redact import redact_credit_cards

    docs = spark.createDataFrame(
        [
            (1, "pay with 4111 1111 1111 1111 please"),       # valid
            (2, "card 5500-0055-5555-5559 on file"),          # valid
            (3, "order 1234 5678 9012 3456 shipped"),         # invalid
            (4, "short 4111 1111 done"),                      # 8 digits
            (5, "id 12345678901234567890123 long"),           # 23 digits
            (6, "no digits at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_credit_cards(docs).collect()}
    assert rows[1].cc_redacted == "pay with <CC> please"
    assert rows[2].cc_redacted == "card <CC> on file"
    assert rows[3].cc_redacted == "order 1234 5678 9012 3456 shipped"
    assert (rows[3].n_cc_candidates, rows[3].n_cc) == (1, 0)
    assert rows[4].cc_redacted == "short 4111 1111 done"
    assert rows[4].n_cc_candidates == 0
    assert rows[5].cc_redacted == "id 12345678901234567890123 long"
    assert rows[5].n_cc_candidates == 0
    assert rows[6].n_cc == 0


def test_normalize_text_collapses_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "  A\tB\n\nC   d  ")], "doc_id long, text string"
    )
    r = normalize_text(docs).first()
    assert r.normalized == "a b c d"


# ------------------------------------------------------------- profile
def test_profile_columns_single_job(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")],
        "k long, v string",
    )
    prof = {r.col_name: r for r in profile_columns(df, ["k", "v"]).collect()}
    k, v = prof["k"], prof["v"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 1, 2)
    assert (k.min_val, k.max_val) == ("1", "2")
    assert (v.n_rows, v.n_nulls, v.n_distinct) == (4, 1, 2)
    assert (v.min_val, v.max_val) == ("x", "y")


def test_check_unique_and_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20), (3, 99)], "k long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    dups = check_unique(child, ["k", "fk"]).collect()
    assert [(r.k, r.fk, r.n) for r in dups] == [(1, 10, 2)]
    orphans = orphan_rows(child, parent, "fk", "pk").collect()
    assert [r.fk for r in orphans] == [99]


def test_quality_summary_counts(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, None), (3, 99)], "k long, fk long"
    )
    parent = spark.createDataFrame([(10,), (99,)], "pk long")
    res = {
        r.check_name: r.n_violations
        for r in quality_summary(
            df,
            not_null=["fk"],
            unique=[["k"]],
            references=[(parent, "fk", "pk")],
        ).collect()
    }
    assert res["not_null:fk"] == 1
    assert res["unique:k"] == 1  # k=1 appears twice -> one violating key
    # fk=None and fk=2's row: NULL fk doesn't match -> orphan; 10/99 match
    assert res["fk:fk->pk"] == 1


# --------------------------------------------------------------- merge
def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string"
    )
    merged = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert merged == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_apply_changes_deletes_and_upserts(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(1, None, "D"), (2, "B", "U"), (4, "D", "I")],
        "k long, v string, op string",
    )
    out = {r.k: r.v for r in apply_changes(target, changes, ["k"]).collect()}
    assert out == {2: "B", 3: "c", 4: "D"}


# --------------------------------------------------------------- split
def test_assign_splits_disjoint_total_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    s1 = assign_splits(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = s1.select("doc_id", "split").collect()
    n = docs.count()
    # every row assigned exactly one split; fractions sum to 1 -> no NULLs
    assert len(rows) == n
    assert all(r.split in ("train", "val", "test") for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert by["train"] | by.get("val", set()) | by.get("test", set()) == {
        r.doc_id for r in rows
    }
    # rough proportions at n=50: train dominates
    assert len(by["train"]) > len(by.get("val", set()))
    # deterministic: a repartitioned rerun assigns identically
    s2 = {
        r.doc_id: r.split
        for r in assign_splits(
            docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert s2 == {r.doc_id: r.split for r in rows}


def test_leakage_safe_splits_components_never_straddle(spark):
    """Content-level guard: every near-dup component lands in ONE
    split — including a transitive chain whose endpoints share no
    direct pair — and singletons keep assign_splits determinism."""
    from mitoscape_spark.operators.sampling import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # components: chain {0,1,2,3}, pair {10,11}, singletons elsewhere
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_splits(
        docs, pairs, {"train": 0.5, "test": 0.5}
    )
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 40 and all(v in ("train", "test") for v in rows.values())
    assert len({rows[i] for i in (0, 1, 2, 3)}) == 1  # chain together
    assert rows[10] == rows[11]
    # singletons follow the plain entity-level assignment on their own id
    from mitoscape_spark.operators.sampling import assign_splits

    plain = {
        r.doc_id: r.split
        for r in assign_splits(
            docs, "doc_id", {"train": 0.5, "test": 0.5}
        ).collect()
    }
    in_pairs = {0, 1, 2, 3, 10, 11}
    assert all(rows[i] == plain[i] for i in rows if i not in in_pairs)
    # deterministic under repartition
    again = {
        r.doc_id: r.split
        for r in leakage_safe_splits(
            docs.repartition(7), pairs, {"train": 0.5, "test": 0.5}
        ).collect()
    }
    assert again == rows


def test_leakage_safe_splits_empty_pairs_degrades_to_entity_split(spark):
    """With no near-dup pairs the content-level split must be exactly
    the plain per-id assignment (singleton components group as
    themselves)."""
    from mitoscape_spark.operators.sampling import (
        assign_splits,
        leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    no_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.split
        for r in leakage_safe_splits(
            docs, no_pairs, {"train": 0.7, "test": 0.3}
        ).collect()
    }
    want = {
        r.doc_id: r.split
        for r in assign_splits(
            docs, "doc_id", {"train": 0.7, "test": 0.3}
        ).collect()
    }
    assert got == want


def test_assign_splits_holdout_band(spark):
    docs = load_table(spark, SF, "documents")
    out = assign_splits(docs, "doc_id", {"train": 0.5})
    n_null = out.where(F.col("split").isNull()).count()
    n_train = out.where(F.col("split") == "train").count()
    assert n_null + n_train == docs.count()
    assert n_null > 0 and n_train > 0


# ----------------------------------------------------------- bpe tokens
def test_bpe_tokens_gpt2_style_split(spark):
    from mitoscape_spark.operators.textstats import bpe_tokens

    docs = spark.createDataFrame(
        [(1, "I'll pay 42 dollars, ok?")], "doc_id long, text string"
    )
    r = bpe_tokens(docs).first()
    assert r.bpe_tokens == [
        "I", "'ll", " pay", " 42", " dollars", ",", " ok", "?"
    ]
    assert r.n_bpe_tokens == 8
    assert r.n_bpe_distinct == 8


# --------------------------------------------------------------- tfidf
def test_tfidf_similar_pairs_ranks_near_dups(spark, tmp_path):
    from mitoscape_spark.operators.tfidf import (
        fit_tfidf,
        tfidf_similar_pairs,
        tfidf_vectors,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox leaps over the lazy dog"),
            (3, "completely unrelated text about spark and parquet"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_similar_pairs(docs, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] > pairs.get((1, 3), 0.0)
    assert pairs[(1, 2)] > 0.5
    # unit-norm: self cosine == 1 -> vector norms are 1
    model = fit_tfidf(docs)
    vecs = tfidf_vectors(docs, model).collect()
    import numpy as np

    for r in vecs:
        assert np.isclose(np.linalg.norm(r.tfidf.toArray()), 1.0)
    # fitted corpus stats persist and reload
    path = str(tmp_path / "tfidf_model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    a = model.transform(docs).select("tfidf").collect()
    b = reloaded.transform(docs).select("tfidf").collect()
    assert [r.tfidf for r in a] == [r.tfidf for r in b]


# ---------------------------------------------------------------- udaf
def test_grouped_agg_pandas_udaf(spark):
    import math

    from mitoscape_spark.functions.aggregates import geometric_mean_1p

    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 7), ("b", 3)], "g string, v long"
    )
    got = {
        r.g: r.gm
        for r in df.groupBy("g")
        .agg(geometric_mean_1p("v").alias("gm"))
        .collect()
    }
    exp_a = math.exp((math.log(1) + math.log(2) + math.log(8)) / 3)
    assert got["a"] == pytest.approx(exp_a, rel=1e-12)
    assert got["b"] == pytest.approx(4.0, rel=1e-12)


def test_observed_metrics_one_pass(spark, sf_smoke):
    """Observation counters ride the existing action — values must match
    a separate aggregation, with no second job over the input."""
    from pyspark.sql import functions as F

    from mitoscape_spark.catalog import load_table
    from mitoscape_spark.operators.profile import observed_metrics

    li = load_table(spark, sf_smoke, "lineitem")
    observed, obs = observed_metrics(
        li,
        "liq",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_qty": F.count(F.when(F.col("l_quantity").isNull(), 1)),
            "sum_qty": F.sum("l_quantity"),
        },
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    exact = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s"),
    ).head()
    assert got["n_rows"] == exact["n"]
    assert got["n_null_qty"] == 0
    assert abs(got["sum_qty"] - exact["s"]) < 1e-6


def test_k_anonymity_suppression_enforces_k(spark):
    from mitoscape_spark.operators.profile import (
        k_anonymity_report,
        suppress_rare_combinations,
    )

    rows = (
        [("US", "a")] * 6 + [("US", "b")] * 2 + [("DE", "a")] * 1
        + [("DE", "b")] * 4
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    rare = {
        (r.country, r.seg, r.group_size)
        for r in k_anonymity_report(df, ["country", "seg"], k=4).collect()
    }
    assert rare == {("US", "b", 2), ("DE", "a", 1)}
    kept = suppress_rare_combinations(df, ["country", "seg"], k=4)
    # every surviving combination has >= k members; nothing else lost
    sizes = {
        (r.country, r.seg): r.n
        for r in kept.groupBy("country", "seg").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sizes == {("US", "a"): 6, ("DE", "b"): 4}


def test_suppress_rare_combinations_null_keys_suppressed(spark):
    from mitoscape_spark.operators.profile import (
        suppress_rare_combinations,
    )

    rows = [("US",)] * 6 + [(None,)] * 2
    df = spark.createDataFrame(rows, "country string")
    kept = suppress_rare_combinations(df, ["country"], k=5).collect()
    # the NULL group (size 2 < k) must actually be suppressed
    assert [r.country for r in kept] == ["US"] * 6


def test_expectations_report_and_one_job_shape(spark):
    from mitoscape_spark.operators.expectations import validate

    df = spark.createDataFrame(
        [
            (1, "A", 10.0, "1-URGENT"),
            (2, None, -5.0, "9-BAD"),
            (2, "B", 2000.0, "2-HIGH"),
        ],
        "k long, s string, v double, pri string",
    )
    rules = [
        {"rule": "not_null", "col": "s"},
        {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 1000.0},
        {"rule": "regex", "col": "pri", "pattern": "^[1-5]-"},
        {"rule": "accepted_values", "col": "s", "values": ["A", "B"]},
        {"rule": "expression", "name": "k_positive", "sql": "k > 0"},
        {"rule": "unique", "cols": ["k"]},
    ]
    rows = {r.rule_id: r for r in validate(df, rules).collect()}
    assert rows[0].n_violations == 1 and rows[0].passed == 0
    assert rows[1].n_violations == 2  # -5 and 2000 out of range
    assert rows[2].n_violations == 1  # 9-BAD
    assert rows[3].n_violations == 0 and rows[3].passed == 1
    assert rows[4].n_violations == 0
    assert rows[5].n_violations == 1  # duplicate k=2 (count-1)
    assert rows[5].target == "k"


def test_expectations_null_expression_is_violation(spark):
    from mitoscape_spark.operators.expectations import validate

    df = spark.createDataFrame([(None,)], "x double")
    rows = validate(
        df, [{"rule": "expression", "name": "x_big", "sql": "x > 5"}]
    ).collect()
    assert rows[0].n_violations == 1  # NULL predicate = not met


def test_expectations_empty_accepted_values_raises(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.expectations import validate

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="non-empty"):
        validate(df, [{"rule": "accepted_values", "col": "k", "values": []}])


# ------------------------------------------------------- text normalize
def test_normalize_for_dedup_links_surface_variants(spark):
    """The normalizer must collapse case/punct/digit/whitespace
    variants to one canonical form — and leave distinct content
    distinct."""
    from mitoscape_spark.functions.textnorm import normalize_for_dedup

    rows = [
        (1, "Hello, World! Posted 2024-01-07."),
        (2, "hello   world  posted 1999_12_31"),   # same after norm
        (3, "Hello, World! Posted... differently"),
        (4, "Price: $3.14 (sale)"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", normalize_for_dedup("text").alias("n")
        ).collect()
    }
    assert out[1] == "hello world posted 0000 00 00"
    assert out[1] == out[2]
    assert out[3] == "hello world posted differently"
    # punct stripped BEFORE digit folding: "3.14" -> "0 00", not "0.00"
    assert out[4] == "price 0 00 sale"
    assert out[5] == ""


def test_normalize_for_dedup_is_idempotent(spark):
    """norm(norm(x)) == norm(x): the normalized form is a fixed point
    (a second pass can find no punctuation, digits>0, or extra
    whitespace to change) — the property that makes re-normalizing an
    already-clean corpus safe."""
    from mitoscape_spark.functions.textnorm import normalize_for_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World! 42 times...   over\tand over"),
            (2, "a_b_c (d) [e] {f} 3.14159"),
            (3, "  leading and trailing  "),
        ],
        "doc_id long, text string",
    )
    once = docs.select(
        "doc_id", normalize_for_dedup("text").alias("text")
    )
    twice = once.select(
        "doc_id", normalize_for_dedup("text").alias("text")
    )
    assert {(r.doc_id, r.text) for r in once.collect()} == {
        (r.doc_id, r.text) for r in twice.collect()
    }
