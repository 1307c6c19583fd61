"""Repeated-substring removal + temperature mix + quality-percentile
filter (operators/substrings.py, operators/sampling.py round-2 ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mitoscape_spark.operators.sampling import (
    temperature_mix,
    top_fraction_per_key,
)
from mitoscape_spark.operators.substrings import (
    common_span_removal,
    gram_occurrences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_common_span_removed_from_both_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta unique one"),
            (2, "other words alpha beta gamma delta tail"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in common_span_removal(docs, n=4, min_docs=2).collect()
    }
    # the shared 4-gram "alpha beta gamma delta" is excised from BOTH
    assert out[1]["clean_text"] == "unique one"
    assert out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "other words tail"
    assert out[2]["n_removed"] == 4


def test_overlapping_spans_union_not_greedy(spark):
    # docs share two OVERLAPPING 4-grams: a b c d and b c d e
    docs = _docs(
        spark,
        [
            (1, "a b c d e x"),
            (2, "y a b c d e"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in common_span_removal(docs, n=4, min_docs=2).collect()
    }
    # union of covered positions removes a..e (5 tokens), keeps the rest
    assert out[1]["clean_text"] == "x"
    assert out[1]["n_removed"] == 5
    assert out[2]["clean_text"] == "y"


def test_short_and_unique_docs_untouched(spark):
    docs = _docs(
        spark,
        [
            (1, "too short"),  # < n tokens: no grams, nothing removed
            (2, "entirely unique words here nothing shared at all"),
            (3, "common span here we go now"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in common_span_removal(docs, n=4, min_docs=2).collect()
    }
    for i in (1, 2, 3):
        assert out[i]["n_removed"] == 0
        assert out[i]["clean_text"]


def test_fully_boilerplate_doc_becomes_empty(spark):
    docs = _docs(
        spark,
        [(1, "exact same four tokens"), (2, "exact same four tokens")],
    )
    out = common_span_removal(docs, n=4, min_docs=2).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 4 for r in out)


def test_gram_occurrences_count_and_positions(spark):
    docs = _docs(spark, [(7, "a b c d e")])
    rows = gram_occurrences(docs, n=4).orderBy("i").collect()
    assert [(r["i"], r["g"]) for r in rows] == [
        (1, "a b c d"),
        (2, "b c d e"),
    ]


# ------------------------------------------------------------ sampling
def test_temperature_mix_budgets_flatten_head(spark):
    rows = [(i, "big") for i in range(90)] + [
        (1000 + i, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, "source", "doc_id", total=50, alpha=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # proportional would be 45/5; sqrt-temperature flattens toward
    # 37.5/12.5 — assert the tail got boosted and the head trimmed
    assert by_src["small"] > 5
    assert by_src["big"] < 45
    assert by_src["big"] + by_src["small"] <= 50


def test_temperature_mix_alpha_zero_is_uniform(spark):
    rows = [(i, "a") for i in range(80)] + [(100 + i, "b") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, "source", "doc_id", total=40, alpha=0.0)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"a": 20, "b": 20}


def test_temperature_mix_deterministic(spark):
    rows = [(i, "s" + str(i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(
        r["doc_id"]
        for r in temperature_mix(df, "source", "doc_id", 30).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_mix(df, "source", "doc_id", 30).collect()
    )
    assert a == b


def test_top_fraction_per_key_keeps_best_half(spark):
    rows = [(i, "k", float(i)) for i in range(10)]  # scores 0..9
    df = spark.createDataFrame(rows, "doc_id long, key string, score double")
    kept = sorted(
        r["doc_id"]
        for r in top_fraction_per_key(
            df, "key", "score", 0.5, "doc_id"
        ).collect()
    )
    # percent_rank over 10 rows desc: pr = (rank-1)/9, so <= 0.5 keeps
    # pr 0..4/9 — the top 5 scores
    assert kept == [5, 6, 7, 8, 9]


def test_top_fraction_per_key_is_per_key_not_global(spark):
    rows = [(i, "lo", float(i)) for i in range(4)] + [
        (100 + i, "hi", 1000.0 + i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string, score double")
    out = top_fraction_per_key(df, "key", "score", 0.5, "doc_id")
    by_key = {
        r["key"]: r["n"]
        for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    # a global cutoff would keep 'hi' entirely and empty 'lo'
    assert by_key == {"lo": 2, "hi": 2}


def test_run_concurrent_times_and_isolates_failures(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from mitoscape_spark.concurrency import run_concurrent

    failures = []
    out = run_concurrent(
        spark,
        {
            "ok1": lambda: spark.range(10).selectExpr("sum(id) as s"),
            "ok2": lambda: spark.range(5),
            "boom": lambda: spark.range(1).selectExpr("no_such_col"),
        },
        max_inflight=2,
        on_error=lambda n, e: failures.append(n),
    )
    assert out["ok1"] > 0 and out["ok2"] > 0
    assert out["boom"] == -1.0
    assert failures == ["boom"]
