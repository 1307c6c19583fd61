"""token_entropy / js_divergence_by_group vs local math."""

import math
from collections import Counter

import pytest

from mitoscape_spark.operators.textstats import (
    js_divergence_by_group,
    token_entropy,
)

DOCS = [
    (0, "a a a a", "s1"),            # zero entropy
    (1, "a b c d", "s2"),            # max entropy for 4 tokens
    (2, "a a b b c", "s3"),
]


def test_entropy_matches_local(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    assert got["s1"] == (4, 1, 0.0)
    assert got["s2"][2] == pytest.approx(math.log(4), abs=1e-6)
    c = Counter("a a b b c".split())
    h = -sum((v / 5) * math.log(v / 5) for v in c.values())
    assert got["s3"] == (5, 3, pytest.approx(round(h, 6), abs=1e-6))


def _js_local(p_counts, q_counts):
    np_, nq = sum(p_counts.values()), sum(q_counts.values())
    toks = set(p_counts) | set(q_counts)
    js = 0.0
    for t in toks:
        p = p_counts.get(t, 0) / np_
        q = q_counts.get(t, 0) / nq
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    return js


def test_js_divergence_matches_local(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    got = {
        r["source"]: r["js_divergence"]
        for r in js_divergence_by_group(df).collect()
    }
    corpus = Counter(
        tok for _, text, _ in DOCS for tok in text.split()
    )
    for _, text, src in DOCS:
        want = _js_local(Counter(text.split()), corpus)
        assert got[src] == pytest.approx(want, abs=1e-6)


def test_js_divergence_bounds(spark):
    # a source identical to the corpus mix has JS ~ 0; disjoint
    # vocabulary approaches ln 2
    rows = [(0, "x y z", "only")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = js_divergence_by_group(df).collect()[0]["js_divergence"]
    assert got == pytest.approx(0.0, abs=1e-9)  # source IS the corpus
