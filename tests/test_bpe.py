"""Learned BPE (operators/bpe.py): merge learning + distributed apply."""

from __future__ import annotations

from mitoscape_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    learn_merges,
    word_frequencies,
)


def test_learn_merges_picks_most_frequent_pair():
    # "ab" appears in every word with weight 10+10 = dominant
    merges = learn_merges([("abc", 10), ("abd", 10), ("xy", 1)], n_merges=1)
    assert merges == [("a", "b")]


def test_learn_merges_deterministic_tiebreak():
    # equal counts: lexicographically LARGEST pair wins (max on (n, pair))
    m1 = learn_merges([("ab", 5), ("cd", 5)], n_merges=1)
    m2 = learn_merges([("cd", 5), ("ab", 5)], n_merges=1)
    assert m1 == m2


def test_learn_merges_stops_at_singletons():
    merges = learn_merges([("abcdef", 1)], n_merges=100)
    assert merges == []  # every pair occurs once: nothing to learn


def test_word_frequencies_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "The the THE cat"), (2, "the cat sat")], "doc_id long, text string"
    )
    wf = dict(word_frequencies(docs))
    assert wf["the"] == 4 and wf["cat"] == 2 and wf["sat"] == 1


def test_train_apply_compresses_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "lowlow lower lowest " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=10)
    # "low" must assemble within the first merges (via l+o→lo+w or
    # o+w→l+ow — tie-break picks the lexicographically larger pair)
    assert ("lo", "w") in merges or ("l", "ow") in merges
    enc = bpe_apply(docs, merges)
    rows = {r["id"]: r for r in enc.collect()}
    # with "low" merged, each word is far fewer than its char count
    assert all(r["n_tokens"] < len("lowlow lower lowest ") * 5 for r in rows.values())
    again = {r["id"]: r["tokens"] for r in bpe_apply(docs, merges).collect()}
    assert {k: v["tokens"] for k, v in rows.items()} == again


def test_apply_without_merges_is_chars_plus_marker(spark):
    docs = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    (row,) = bpe_apply(docs, []).collect()
    assert row["tokens"] == ["a", "b", "</w>", "c", "</w>"]


# ---------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st

from mitoscape_spark.operators.bpe import _encode_word

_word = st.text(alphabet="abcdef", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_word, st.integers(1, 50)), min_size=1, max_size=20),
       st.integers(0, 30))
def test_encode_word_reconstructs_and_never_expands(word_freq, n_merges):
    """For ANY learned merge table: (1) concatenating a word's tokens
    (minus the </w> marker) reproduces the word; (2) token count never
    exceeds chars+1; (3) encoding is deterministic."""
    merges = learn_merges(word_freq, n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _n in word_freq:
        toks = _encode_word(w, ranks)
        assert "".join(toks).replace("</w>", "") == w
        assert len(toks) <= len(w) + 1
        assert toks == _encode_word(w, ranks)
