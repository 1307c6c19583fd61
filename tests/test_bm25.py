"""BM25 (operators/bm25.py) vs a pure-Python reference scorer."""

from __future__ import annotations

import math

import pytest

from mitoscape_spark.operators.bm25 import (
    bm25_search,
    read_bm25_topk,
    write_bm25_index,
)

CORPUS = [
    (0, "spark shuffles data fast"),
    (1, "duck db runs fast fast fast"),
    (2, "spark joins spark aggregates spark"),
    (3, "slow single node engine"),
    (4, "fast spark fast plans"),
]


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {i: t.lower().split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = sorted(set(query.lower().split(" ")))
    scores = {}
    for term in terms:
        df = sum(1 for t in docs.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in docs.items():
            tf = t.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
            scores[i] = scores.get(i, 0.0) + s
    return {i: round(s, 6) for i, s in scores.items()}


def _docs_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_python_reference(spark):
    got = {
        r.doc_id: r.bm25
        for r in bm25_search(_docs_df(spark), "fast spark", k=10).collect()
    }
    want = _py_bm25(CORPUS, "fast spark")
    assert got.keys() == want.keys()
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-6)


def test_bm25_topk_ordering_and_limit(spark):
    rows = bm25_search(_docs_df(spark), "fast", k=2).collect()
    assert len(rows) == 2
    # doc 1 has tf=3 of 'fast' and short length -> best
    assert rows[0].doc_id == 1
    assert rows[0].bm25 > rows[1].bm25


def test_bm25_unknown_term_contributes_nothing(spark):
    base = {
        r.doc_id: r.bm25
        for r in bm25_search(_docs_df(spark), "spark", k=10).collect()
    }
    plus = {
        r.doc_id: r.bm25
        for r in bm25_search(
            _docs_df(spark), "spark zzznotaterm", k=10
        ).collect()
    }
    assert base == plus


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_search(_docs_df(spark), "  ")


def test_bm25_persisted_index_serves_same_topk(spark, tmp_path):
    path = str(tmp_path / "bm25idx")
    write_bm25_index(_docs_df(spark), path)
    live = bm25_search(_docs_df(spark), "fast spark", k=10).collect()
    served = read_bm25_topk(spark, path, "fast spark", k=10).collect()
    assert [(r.doc_id, r.bm25) for r in live] == [
        (r.doc_id, r.bm25) for r in served
    ]


def test_bm25_persisted_index_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "bm25idx")
    write_bm25_index(_docs_df(spark), path)
    plan = (
        read_bm25_topk(spark, path, "fast", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # bucket is a partition column: the IN-list must land in
    # PartitionFilters (directory pruning), not a post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters:", 1)[1][:200]


def test_hybrid_rrf_fusion_math(spark, sf_smoke):
    from pyspark.sql import functions as F

    from mitoscape_spark.operators.bm25 import bm25_search, hybrid_search_rrf
    from mitoscape_spark.operators.similarity import topk_cosine

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qv = list(emb.where(F.col("vec_id") == 0).head().embedding)
    out = hybrid_search_rrf(docs, emb, "vector join fast", qv, k=10, depth=20)
    rows = out.collect()
    assert len(rows) == 10
    # recompute rrf from the channel ranks independently
    lex = bm25_search(docs, "vector join fast", k=20).collect()
    dense = topk_cosine(emb, qv, k=20).collect()
    lex_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(lex, key=lambda r: (-r.bm25, r.doc_id))
        )
    }
    dense_rank = {
        r.id: i + 1
        for i, r in enumerate(sorted(dense, key=lambda r: (-r.cos, r.id)))
    }
    for r in rows:
        want = 0.0
        if r.id in lex_rank:
            want += 1.0 / (60 + lex_rank[r.id])
        if r.id in dense_rank:
            want += 1.0 / (60 + dense_rank[r.id])
        assert abs(r.rrf - round(want, 6)) < 1e-9
        assert (r.r_lex is None) == (r.id not in lex_rank)
        assert (r.r_dense is None) == (r.id not in dense_rank)
    # descending fused order
    vals = [r.rrf for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_phrase_search_exact_sequences_only(spark):
    from mitoscape_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "fast vector join inside"),       # has the phrase
            (2, "vector fast join"),              # tokens, wrong order
            (3, "a vector Join here"),            # case-insensitive hit
            (4, "vector"),                        # partial
            (5, "x vector join vector join y"),   # multiple occurrences
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in phrase_search(docs, "vector join").collect()}
    assert got == {1, 3, 5}
    # single-token phrase degenerates to a token-membership lookup
    got1 = {r.doc_id for r in phrase_search(docs, "vector").collect()}
    assert got1 == {1, 2, 3, 4, 5}
    # rarest-token anchoring must not change results when the phrase
    # repeats a token or contains a corpus-absent token
    got2 = {
        r.doc_id for r in phrase_search(docs, "vector join vector").collect()
    }
    assert got2 == {5}
    assert phrase_search(docs, "vector zzz_absent").count() == 0


def test_proximity_search_window_semantics(spark):
    from mitoscape_spark.operators.bm25 import proximity_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta target"),   # gap 4 from alpha
            (2, "alpha x x x x x x target"),        # gap 7: out of w=5
            (3, "target alpha"),                    # gap 1, reversed order
            (4, "alpha only here"),                 # missing term b
            (5, "alpha target alpha far target"),   # min gap 1
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.min_gap
        for r in proximity_search(docs, "ALPHA", "target", 5).collect()
    }
    assert got == {1: 4, 3: 1, 5: 1}


def test_proximity_same_term_pairs_distinct_occurrences(spark):
    import pytest as _pytest

    from mitoscape_spark.operators.bm25 import proximity_search

    docs = spark.createDataFrame(
        [(1, "echo x echo"), (2, "echo only once"), (3, "far echo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.min_gap
        for r in proximity_search(docs, "echo", "echo", 5).collect()
    }
    # doc 1 has two occurrences 2 apart; single-occurrence docs must
    # NOT self-pair at gap 0
    assert got == {1: 2}
