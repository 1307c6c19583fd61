"""Retrieval evaluation: P@k, MRR, nDCG@k over ranked runs + qrels.

The measurement half of the retrieval stack (operators/bm25.py,
operators/similarity.py builds the runs; this scores them) — the
trec_eval contract: ``runs`` rows are (qid, did, score) candidates,
``qrels`` rows are (qid, did) binary-relevant pairs, and queries with
no relevant document are excluded from the macro averages (scoring an
unanswerable query as 0 would punish the retriever for the labels'
gaps).

Metrics per query, then macro-averaged:
* precision@k — relevant hits in the top k, / k;
* MRR — 1 / rank of the first relevant hit (0 if none in top k);
* nDCG@k — Σ 1/log2(rank+1) over relevant hits, normalized by the
  ideal DCG of min(R, k) relevant docs ranked 1..m (binary gains).

Plan shape: one window ranks each query's candidates (partitioned by
qid — never global), one left join flags relevance, one hash agg per
query, one tiny final agg. The ideal-DCG denominator is a sequence
fold (JVM higher-order function, no extra shuffle). Determinism: ranks
tie-break (score DESC, did); the only floats are 1/log2 sums whose
cross-engine jitter is ~1e-15 against the 6 dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    runs: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """One macro-average row: (n_queries, p_at_k, mrr, ndcg).

    ``runs``: (qid, did, score); ``qrels``: (qid, did) relevant pairs,
    unique per pair. Extra run depth beyond ``k`` is ignored.
    """
    if k < 1:
        raise ValueError("retrieval_metrics: k >= 1")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "did")
    top = (
        runs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
    flagged = top.join(
        qrels.select("qid", "did").withColumn("_rel", F.lit(1)),
        ["qid", "did"],
        "left",
    )
    rel = F.col("_rel").isNotNull()
    per_q = flagged.groupBy("qid").agg(
        (F.sum(rel.cast("double")) / F.lit(float(k))).alias("_p"),
        F.coalesce(
            F.max(F.when(rel, F.lit(1.0) / F.col("rk"))), F.lit(0.0)
        ).alias("_mrr"),
        F.sum(
            F.when(rel, F.lit(1.0) / F.log2(F.col("rk") + 1)).otherwise(
                F.lit(0.0)
            )
        ).alias("_dcg"),
    )
    n_rel = qrels.groupBy("qid").agg(
        F.count(F.lit(1)).alias("_r")
    )
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(_r, {k}))), 0D,"
        f" (acc, i) -> acc + 1.0 / log2(i + 1))"
    )
    scored = (
        per_q.join(n_rel, "qid")  # inner: unanswerable queries drop out
        .withColumn("_ndcg", F.col("_dcg") / idcg)
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("_p"), 6).alias("p_at_k"),
        F.round(F.avg("_mrr"), 6).alias("mrr"),
        F.round(F.avg("_ndcg"), 6).alias("ndcg"),
    )
