"""sample_negatives: exclusion, fill, determinism, under-fill."""

import pytest

from mitoscape_spark.operators.sampling import sample_negatives


def _mk(spark, pos_pairs, corpus_ids):
    pos = spark.createDataFrame(pos_pairs, "qid long, did long")
    corpus = spark.createDataFrame(
        [(i,) for i in corpus_ids], "did long"
    )
    return pos, corpus


def test_negatives_exclude_positives_and_self(spark):
    pos_pairs = [(q, d) for q in range(10) for d in range(10, 15)]
    pos, corpus = _mk(spark, pos_pairs, range(100))
    out = sample_negatives(pos, corpus, "qid", "did", k=5).collect()
    pos_set = set(map(tuple, pos_pairs))
    for r in out:
        assert (r["qid"], r["neg_id"]) not in pos_set
        assert r["neg_id"] != r["qid"]


def test_full_fill_and_determinism(spark):
    pos_pairs = [(q, (q + 1) % 50) for q in range(50)]
    pos, corpus = _mk(spark, pos_pairs, range(1000))
    a = sorted(
        map(tuple, sample_negatives(pos, corpus, "qid", "did", 4).collect())
    )
    b = sorted(
        map(tuple, sample_negatives(pos, corpus, "qid", "did", 4).collect())
    )
    assert a == b
    per_q = {}
    for qid, _, order in a:
        per_q.setdefault(qid, []).append(order)
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_q.values())


def test_underfill_returns_short_not_wrong(spark):
    # corpus of 4; query 0 has 2 positives -> at most 1 legal negative
    pos, corpus = _mk(spark, [(0, 1), (0, 2)], [0, 1, 2, 3])
    out = sample_negatives(
        pos, corpus, "qid", "did", k=3, oversample=10
    ).collect()
    negs = [r["neg_id"] for r in out]
    assert set(negs) <= {3}
    assert len(negs) <= 1


def test_salt_changes_sample(spark):
    pos, corpus = _mk(spark, [(q, 0) for q in range(1, 30)], range(500))
    a = sorted(
        (r["qid"], r["neg_id"])
        for r in sample_negatives(pos, corpus, "qid", "did", 3).collect()
    )
    b = sorted(
        (r["qid"], r["neg_id"])
        for r in sample_negatives(
            pos, corpus, "qid", "did", 3, salt="other"
        ).collect()
    )
    assert a != b


def test_rejects_bad_params(spark):
    pos, corpus = _mk(spark, [(0, 1)], [0, 1])
    with pytest.raises(ValueError):
        sample_negatives(pos, corpus, "qid", "did", k=0)


def test_weighted_wr_sampling_bias_and_determinism(spark):
    from mitoscape_spark.operators.sampling import (
        weighted_sample_with_replacement,
    )

    # one heavy item (weight 1000) among 100 light (weight 1):
    # ~91% of draws should hit the heavy item
    rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample_with_replacement(
        df, "w", k=50, id_col="id"
    ).collect()
    assert len(out) == 50  # every draw resolves to exactly one row
    assert sorted(r["draw_order"] for r in out) == list(range(50))
    heavy = sum(1 for r in out if r["id"] == 0)
    assert heavy >= 35  # E ~ 45.5; generous slack
    again = weighted_sample_with_replacement(
        df, "w", k=50, id_col="id"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_wr_excludes_nonpositive(spark):
    from mitoscape_spark.operators.sampling import (
        weighted_sample_with_replacement,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "id long, w double"
    )
    out = weighted_sample_with_replacement(
        df, "w", k=10, id_col="id"
    ).collect()
    assert len(out) == 10 and all(r["id"] == 1 for r in out)
