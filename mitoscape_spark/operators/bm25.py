"""BM25 ranked retrieval over a document corpus, as Catalyst plans.

Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework") decomposes into exactly the relational shapes Spark is good
at: a postings table (token, doc, tf, doclen) built by one
explode+groupBy, corpus statistics (N, avgdl, per-token df) as
aggregations, and query scoring as a *filtered* postings scan + one
per-doc sum + top-k.

Scale notes (100 TB corpus):
- The index build is one shuffle (groupBy token,doc) plus one token-key
  agg for df; both partial-aggregate map-side. No driver state — the
  vocabulary never materializes on the driver.
- ``bm25_search`` filters postings with ``token IN (query terms)``
  BEFORE any join or agg, so the scan prunes to the query's terms; a
  persisted index partitioned/bucketed by token turns that into
  partition pruning (see ``write_bm25_index``) and the per-query cost
  becomes proportional to the query terms' posting lists — the
  inverted-index access path, expressed relationally.
- idf and avgdl ride a broadcast join of 1-row / vocab-row aggregates:
  no ``.first()`` round-trips, no closure-captured corpus stats.
- The final top-k is ``orderBy().limit()`` → TakeOrderedAndProject
  (per-partition heaps + driver merge of k rows), never a global sort.

Tokenization matches the engine's corpus convention
(``split(lower(text), ' ')``) so the DuckDB oracle can reproduce scores
bit-for-bit from the same SQL-expressible formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def bm25_postings(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(token, doc_id, tf, dl): term frequencies + document length.

    One explode + one groupBy; dl (whitespace token count) is computed
    before the explode so it rides the row instead of re-aggregating.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    )
    return toks.groupBy("token", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_index(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(postings with df attached, 1-row corpus stats (n_docs, avgdl)).

    df joins back to postings on token (Catalyst picks SMJ/shuffle-hash;
    AQE converts to broadcast when the vocabulary is small); corpus
    stats stay a 1-row DataFrame for a broadcast crossJoin at score
    time — the stats never leave the cluster.
    """
    postings = bm25_postings(docs, text_col, id_col)
    df_tok = postings.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    return postings.join(df_tok, "token"), stats


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for ``query`` by BM25 score.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (the "plus-one" idf —
    never negative for terms in more than half the corpus), and
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    The query's terms are a driver-side constant (queries are small by
    definition); they become an IN-list filter that prunes the postings
    build to matching tokens before the df agg and the scoring sum.
    """
    terms = sorted({t for t in query.lower().split(" ") if t})
    if not terms:
        raise ValueError("bm25_search: empty query")
    postings, stats = bm25_index(docs, text_col, id_col)
    hit = postings.where(F.col("token").isin(terms))
    return _score_topk(hit, stats, k, k1, b)


def _score_topk(
    hit: DataFrame, stats: DataFrame, k: int, k1: float, b: float
) -> DataFrame:
    """THE scoring tree (idf · tf-norm → per-doc sum → top-k), shared
    by the live and persisted-index paths so the formula can never
    diverge between them."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hit.crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * norm)
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return (
        scored.select(
            "doc_id", F.round(F.col("score"), 6).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def write_bm25_index(docs: DataFrame, path: str,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Persist the postings index partitioned by token-hash bucket.

    Queries that read the persisted index filter on ``bucket IN (...)``
    (derivable from the query terms), so the parquet reader prunes
    partitions — the billion-doc serving path: index once, per-query
    cost ∝ the query's posting lists, not the corpus.
    """
    postings, stats = bm25_index(docs, text_col, id_col)
    (
        postings.withColumn(
            "bucket", F.pmod(F.hash("token"), F.lit(64)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def read_bm25_topk(
    spark,
    path: str,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Serve a query from a persisted index: bucket-pruned postings
    read (PartitionFilters on bucket, PushedFilters on token), then the
    same scoring tree as ``bm25_search``."""
    terms = sorted({t for t in query.lower().split(" ") if t})
    if not terms:
        raise ValueError("read_bm25_topk: empty query")
    postings = spark.read.parquet(f"{path}/postings")
    stats = spark.read.parquet(f"{path}/stats")
    # bucket ids are computable engine-side for the constant terms
    buckets = [
        r.bucket
        for r in spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(t) for t in terms])
            ).alias("token")
        )
        .select(F.pmod(F.hash("token"), F.lit(64)).cast("int").alias("bucket"))
        .distinct()
        .collect()
    ]
    hit = postings.where(
        F.col("bucket").isin(buckets) & F.col("token").isin(terms)
    )
    return _score_topk(hit, stats, k, k1, b)


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 15,
    depth: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with dense cosine
    ranking by reciprocal-rank fusion —
    ``rrf = Σ_channels 1/(rrf_k + rank)`` (Cormack et al. 2009), the
    fusion modern RAG stacks default to because it needs no score
    calibration between channels.

    Both channels produce their top-``depth`` lists exactly as their
    standalone operators do (pruned postings scan / brute-force or
    ANN-backed cosine), each a TakeOrderedAndProject — the fused join
    then touches 2·depth rows, nothing corpus-sized. Ranks are assigned
    on ROUNDED scores with id tie-breaks, which makes the whole fusion
    deterministic and lets the DuckDB oracle reproduce it bit-for-bit
    (rank-on-raw-floats would diverge on summation order).
    A document surfacing in only one channel contributes only that
    channel's term (standard RRF semantics).
    """
    from pyspark.sql import Window as W

    from mitoscape_spark.operators.similarity import topk_cosine

    lex = bm25_search(docs, query, k=depth, id_col=id_col)
    dense = topk_cosine(embeddings, query_vec, k=depth, id_col=vec_id_col)
    w_lex = W.orderBy(F.col("bm25").desc(), F.col(id_col))
    w_dense = W.orderBy(F.col("cos").desc(), F.col("id"))
    lex_r = lex.select(
        F.col(id_col).alias("id"), F.row_number().over(w_lex).alias("r_lex")
    )
    dense_r = dense.select(
        "id", F.row_number().over(w_dense).alias("r_dense")
    )
    fused = lex_r.join(dense_r, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_dense")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        "r_lex",
        "r_dense",
    )
    return fused.orderBy(F.col("rrf").desc(), "id").limit(k)


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, doc_id, pos): the positional inverted index — what
    phrase/proximity queries need beyond BM25's frequency postings.
    One posexplode, one optional persisted layout (partition by token
    hash bucket, same recipe as write_bm25_index)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "token"
        ),
    ).select("token", "doc_id", "pos")


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_ids containing the exact token sequence ``phrase`` — the
    positional-index access path: the postings scan prunes to the
    phrase's tokens (IN-list pushdown), then k−1 equi-joins align
    consecutive tokens on (doc_id, pos + i). Per-query cost ∝ the
    phrase tokens' posting lists, never a corpus text scan — on a
    persisted bucket-partitioned index this is partition pruning, the
    reason search engines store positions. The RAREST token anchors
    the join chain (its list bounds every intermediate size): term
    document frequencies come from one tiny k-row aggregate — the
    dictionary lookup a persisted index serves from stored stats —
    and the chain joins in ascending-df order (CBO is off by default,
    so Spark executes inner-join chains in written order; the
    anchoring must be done here, not hoped for from the optimizer).
    """
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    # §20 pin (round 11): the pruned postings feed the df-lookup
    # action AND one join-chain leg per phrase term — without it the
    # positional-postings explode over every document re-executes
    # k+1 times for a k-term phrase. The filtered table is the
    # REDUCED form (only the phrase terms' postings survive).
    postings = (
        positional_postings(docs, text_col, id_col)
        .where(F.col("token").isin(sorted(set(terms))))
        .transform(pin)
    )
    # k-row df lookup (k = distinct phrase tokens); a token with zero
    # postings sorts first and empties the chain at the anchor — the
    # cheapest possible "no match" plan
    dfs = {
        r["token"]: r["df"]
        for r in postings.groupBy("token")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    order = sorted(
        range(len(terms)), key=lambda i: (dfs.get(terms[i], 0), i)
    )
    # every term aligns to the phrase start: _p0 = pos − offset; join
    # order is then free to follow rarity without breaking alignment
    chain = None
    for i in order:
        nxt = postings.where(F.col("token") == terms[i]).select(
            "doc_id", (F.col("pos") - i).alias("_p0")
        )
        chain = nxt if chain is None else chain.join(nxt, ["doc_id", "_p0"])
    return chain.select("doc_id").distinct()


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, min_gap): documents where ``term_a`` and ``term_b``
    co-occur within ``window`` tokens, with the closest observed gap —
    the NEAR/w operator. Same pruned positional-postings access path as
    phrase_search; the per-doc position join is tiny (one token's
    occurrences within one document), so the only real work is the two
    posting-list fetches."""
    if window < 1:
        raise ValueError("window must be >= 1")
    postings = positional_postings(docs, text_col, id_col)
    a = postings.where(F.col("token") == term_a.lower()).select(
        "doc_id", F.col("pos").alias("_pa")
    )
    b = postings.where(F.col("token") == term_b.lower()).select(
        "doc_id", F.col("pos").alias("_pb")
    )
    # same-term proximity ("x NEAR x") must pair DISTINCT occurrences —
    # without the guard every occurrence pairs with itself at gap 0
    occ_guard = (
        F.col("_pa") < F.col("_pb")
        if term_a.lower() == term_b.lower()
        else F.lit(True)
    )
    return (
        a.join(b, "doc_id")
        .where(occ_guard)
        .withColumn("_gap", F.abs(F.col("_pa") - F.col("_pb")))
        .where(F.col("_gap") <= window)
        .groupBy("doc_id")
        .agg(F.min("_gap").cast("int").alias("min_gap"))
    )
