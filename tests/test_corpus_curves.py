"""novelty_fractions and heaps_curve vs brute-force locals."""

import pytest

from mitoscape_spark.operators.textstats import (
    heaps_curve,
    novelty_fractions,
)

DOCS = [
    (0, "a b c d e"),          # mints all its shingles
    (1, "a b c x y z"),        # 'a b c' seen in doc 0
    (2, "a b c d e"),          # nothing new
    (3, "q r"),                # too short for 3-shingles
]


def _shingles(text, n=3):
    t = text.lower().split(" ")
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_novelty_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["novel_frac"])
        for r in novelty_fractions(df, n=3).collect()
    }
    first = {}
    for doc_id, text in DOCS:
        for sh in sorted(_shingles(text)):
            first.setdefault(sh, doc_id)
    want = {}
    for doc_id, text in DOCS:
        shs = _shingles(text)
        if not shs:
            continue
        novel = sum(1 for s in shs if first[s] == doc_id)
        want[doc_id] = (len(shs), round(novel / len(shs), 6))
    assert got == want
    assert 3 not in got  # short doc absent by contract
    assert got[0] == (3, 1.0)
    assert got[2][1] == 0.0


def test_heaps_curve_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["cum_vocab"])
        for r in heaps_curve(df).collect()
    }
    seen, cum_t, want = set(), 0, {}
    for doc_id, text in DOCS:
        toks = text.lower().split(" ")
        cum_t += len(toks)
        seen |= set(toks)
        want[doc_id] = (cum_t, len(seen))
    assert got == want


def test_heaps_curve_monotone(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = sorted(heaps_curve(df).collect(), key=lambda r: r["doc_id"])
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] > a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]
