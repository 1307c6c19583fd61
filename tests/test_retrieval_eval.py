"""retrieval_metrics vs hand-computed metrics on a tiny fixture."""

import math

import pytest

from mitoscape_spark.operators.retrieval_eval import retrieval_metrics


def test_metrics_hand_computed(spark):
    # q1: relevant docs {A, B}; run ranks A(1), X(2), B(3)
    # q2: relevant docs {C};    run ranks Y(1), Z(2)  -> no hit
    # q3: no relevant docs      -> excluded from averages
    runs = spark.createDataFrame(
        [
            ("q1", "A", 0.9), ("q1", "X", 0.8), ("q1", "B", 0.7),
            ("q2", "Y", 0.9), ("q2", "Z", 0.8),
            ("q3", "W", 0.9),
        ],
        "qid string, did string, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", "A"), ("q1", "B"), ("q2", "C")],
        "qid string, did string",
    )
    r = retrieval_metrics(runs, qrels, k=3).collect()[0]
    assert r["n_queries"] == 2
    # q1: P@3 = 2/3, MRR = 1, DCG = 1/log2(2)+1/log2(4) = 1.5,
    #     IDCG(min(2,3)=2) = 1/log2(2)+1/log2(3); q2: all zero
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert r["p_at_k"] == pytest.approx((2 / 3) / 2, abs=1e-6)
    assert r["mrr"] == pytest.approx(0.5, abs=1e-6)
    assert r["ndcg"] == pytest.approx((1.5 / idcg) / 2, abs=1e-6)


def test_perfect_retrieval_scores_one(spark):
    runs = spark.createDataFrame(
        [("q", f"d{i}", 1.0 - i / 100) for i in range(5)],
        "qid string, did string, score double",
    )
    qrels = spark.createDataFrame(
        [("q", f"d{i}") for i in range(5)], "qid string, did string"
    )
    r = retrieval_metrics(runs, qrels, k=5).collect()[0]
    assert (r["p_at_k"], r["mrr"], r["ndcg"]) == (1.0, 1.0, 1.0)


def test_run_depth_beyond_k_ignored(spark):
    runs = spark.createDataFrame(
        [("q", "bad1", 0.9), ("q", "bad2", 0.8), ("q", "hit", 0.7)],
        "qid string, did string, score double",
    )
    qrels = spark.createDataFrame([("q", "hit")], "qid string, did string")
    r = retrieval_metrics(runs, qrels, k=2).collect()[0]
    assert r["mrr"] == 0.0 and r["p_at_k"] == 0.0


def test_rejects_bad_k(spark):
    df = spark.createDataFrame([("q", "d", 1.0)], "qid string, did string, score double")
    with pytest.raises(ValueError):
        retrieval_metrics(df, df.select("qid", "did"), k=0)
