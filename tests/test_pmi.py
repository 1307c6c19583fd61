"""token_group_pmi vs a brute-force local computation."""

import math
from collections import Counter

import pytest

from mitoscape_spark.operators.textstats import token_group_pmi

DOCS = [
    (0, "alpha beta beta gamma", "s1"),
    (1, "alpha alpha delta", "s1"),
    (2, "gamma gamma gamma epsilon", "s2"),
    (3, "delta epsilon epsilon", "s2"),
]


def _pmi_local(top_k):
    c_tg, c_t, c_g, n = Counter(), Counter(), Counter(), 0
    for _, text, src in DOCS:
        for tok in text.lower().split(" "):
            c_tg[(tok, src)] += 1
            c_t[tok] += 1
            c_g[src] += 1
            n += 1
    out = {}
    for src in {s for _, s in c_tg}:
        scored = sorted(
            (
                (
                    -(c_tg[(t, s)] * n) / (c_t[t] * c_g[s]),
                    t,
                    c_tg[(t, s)],
                )
                for (t, s) in c_tg
                if s == src
            ),
        )[:top_k]
        out[src] = [
            (t, c, round(math.log(-r), 6)) for r, t, c in scored
        ]
    return out


def test_pmi_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    got = token_group_pmi(df, "text", "source", top_k=3).collect()
    want = _pmi_local(3)
    by_src = {}
    for r in sorted(got, key=lambda r: (r["source"], r["rank"])):
        by_src.setdefault(r["source"], []).append(
            (r["tok"], r["n_tok_grp"], r["pmi"])
        )
    assert by_src == want


def test_pmi_positive_for_exclusive_token(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    rows = {
        (r["source"], r["tok"]): r["pmi"]
        for r in token_group_pmi(df, "text", "source", top_k=10).collect()
    }
    # beta appears only in s1: PMI = ln(N / c_g) > 0
    assert rows[("s1", "beta")] > 0
    # every group's top list has ranks 1..k without gaps
    assert ("s2", "gamma") in rows
