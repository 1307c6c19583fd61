"""Similarity search over embedding columns (``array<float>``).

* ``topk_cosine``        — exact brute-force top-k for one query vector:
                           a map-side dot product + TakeOrderedAndProject
                           (per-partition top-k, k-row driver merge — no
                           global sort, no shuffle of the corpus).
* ``SignRandomProjectionLSH`` — cosine LSH: seeded random hyperplanes →
                           sign-bit bucket key; candidates only probe
                           their bucket. The 100 TB path: the bucket join
                           is an equi-join on the hash key, and recall is
                           tuned with (n_planes, n_tables).
* ``IVFFlatIndex``       — inverted-file ANN: a coarse quantizer (k-means
                           centroids trained on a driver-side sample —
                           standard IVF practice; the quantizer needs
                           thousands of vectors, not the corpus) assigns
                           every vector a centroid id; queries probe only
                           the ``n_probe`` nearest cells. At 100 TB the
                           assigned table is written partitioned by
                           centroid id so a probe is partition pruning,
                           not a scan.

Built-in BucketedRandomProjectionLSH (pyspark.ml) covers euclidean
distance; cosine needs the sign-projection variant, implemented here as
pure column expressions over a broadcast plane matrix literal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pins import pin

from mitoscape_spark.functions.vectors import cosine_similarity


def _double_array_sql(values) -> str:
    """SQL text of an array<double> literal (rows of a 2-D input become
    nested arrays). repr() round-trips every double exactly and the
    parser reads 'xD' as that exact double, so ONE parsed expression
    replaces per-element F.lit construction — hundreds of py4j driver
    round-trips (measured: 1.8 s to build the LSH 2048-literal plane
    matrix column element-wise vs a ~4 ms parse)."""
    a = np.asarray(values, dtype=float)
    if a.ndim == 1:
        return "array(" + ",".join(f"{float(x)!r}D" for x in a) + ")"
    return "array(" + ",".join(_double_array_sql(row) for row in a) + ")"


def _double_array_lit(values):
    return F.expr(_double_array_sql(values))


def _training_sample(
    embeddings: DataFrame,
    vec_col: str,
    n: int,
    seed: int,
    total: int | None = None,
) -> list:
    """Collect ≤``n`` vectors drawn uniformly across ALL partitions.

    An unordered ``limit(n)`` reads only the first partitions, so at
    scale a quantizer would train on one shard's distribution (a silent
    quality — not correctness — degradation).  Instead: count, Bernoulli-
    sample at a fraction that over-draws ~50%, and thin to exactly ``n``
    driver-side with the same seed.  One extra count job, paid only at
    fit time (callers that already know the cardinality pass ``total``).
    """
    if total is None:
        total = embeddings.count()
    if total <= n:
        rows = embeddings.select(vec_col).collect()
    else:
        frac = min(1.0, 1.5 * n / total)
        rows = (
            embeddings.select(vec_col).sample(fraction=frac, seed=seed).collect()
        )
    sample = [row[0] for row in rows]
    if len(sample) > n:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(sample), n, replace=False)
        sample = [sample[i] for i in idx]
    return sample


def topk_cosine(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``.

    The query vector is inlined as an array literal (broadcast by
    value); ranking is deterministic via the (cos DESC, id) tie-break.
    """
    q = _double_array_lit(query)
    scored = embeddings.select(
        F.col(id_col).alias("id"),
        F.round(
            cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
        ).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


def knn_join(
    embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """(id, nbr, cos): the EXACT k nearest neighbors by cosine for
    EVERY row — the all-rows companion of ``topk_cosine`` (one query)
    and ``embedding_near_duplicates`` (threshold, not top-k). This is
    the kNN-join workhorse of embedding pipelines: build-the-graph
    steps for SemDeDup-style ε-dedup, retrieval-augmentation neighbor
    tables, label propagation over embedding graphs.

    Plan shape (same family as the blocked GEMM in operators/dedup.py):
    vectors pack into B blocks; all B² ORDERED (query-block,
    neighbor-block) pairs run one numpy GEMM each; every task emits its
    per-row top-k PLUS the rounding-margin band (all candidates whose
    cosine could still round into the k-th place: cos ≥ round₆(kth) −
    5.01e-7), so the later JVM re-score + rank cannot disagree with the
    task-local selection — blocks partition the neighbor set, so
    per-pair top-k ∪ global top-k is exact. Candidates (n·B·k-ish rows,
    ids only — never vectors) re-score JVM-side (``cosine_similarity``
    + round 6) and a per-query window keeps rank ≤ k under the
    deterministic (cos DESC, nbr) order — the same rank-on-rounded
    convention every retrieval query here uses. Duplicate-heavy corpora
    widen the margin band (every copy ties); near-dedup first.

    Ids must be integral (blocking + numpy int64 arrays, as in
    embedding_near_duplicates).
    """
    from mitoscape_spark.operators.dedup import (
        _auto_n_blocks,
        _require_integral_id,
    )

    _require_integral_id(embeddings, id_col, "knn_join")
    if k < 1:
        raise ValueError("knn_join: k must be >= 1")
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull())
    if n_blocks is None:
        stats = e.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size("v")).alias("d")
        ).first()
        n_blocks = _auto_n_blocks((stats["n"] or 0) * (stats["d"] or 0) * 8)
    packed = (
        e.withColumn(
            "block", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int")
        )
        .groupBy("block")
        .agg(
            F.collect_list("id").alias("ids"),
            F.collect_list("v").alias("vecs"),
        )
    )
    a = packed.select(
        F.col("block").alias("block_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = packed.select(
        F.col("block").alias("block_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    sc = embeddings.sparkSession.sparkContext
    # ORDERED pairs (B², not B²/2): the output is per-QUERY-row, so
    # each query block must meet every neighbor block. Explicit
    # repartition — same AQE-coalescing guard as the dedup GEMM paths.
    n_tasks = max(1, min(n_blocks * n_blocks, 2 * sc.defaultParallelism))
    block_pairs = a.join(b, F.lit(True)).repartition(n_tasks)

    def partial_topk(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_q, out_n = [], []
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.array([np.asarray(x) for x in row.vecs_a])
                mb = np.array([np.asarray(x) for x in row.vecs_b])
                na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
                nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
                cos = (ma / na[:, None]) @ (mb / nb[:, None]).T
                # self-mask by ID equality, never by matrix position:
                # the two sides are independently-evaluated
                # collect_list aggregates whose row ORDER can differ
                # between shuffle reads, so fill_diagonal could NaN a
                # real neighbor cell and let the true self cell
                # (cos=1) through (round-4 review finding). NaN, not
                # -inf: every comparison with NaN is False, so the
                # self cell can never pass the cut.
                cos[ids_a[:, None] == ids_b[None, :]] = np.nan
                n_valid = (~np.isnan(cos)).sum(axis=1)
                kk = np.minimum(k, n_valid)
                # per query row: k-th largest, then the rounding band
                desc = -np.sort(-np.nan_to_num(cos, nan=-np.inf), axis=1)
                keep_rows = kk > 0
                kth = np.full(len(ids_a), np.inf)
                kth[keep_rows] = desc[keep_rows, kk[keep_rows] - 1]
                cut = np.round(kth, 6) - 5.01e-7
                ia, ib = np.nonzero(cos >= cut[:, None])
                out_q.append(ids_a[ia])
                out_n.append(ids_b[ib])
            yield pd.DataFrame(
                {
                    "id": np.concatenate(out_q) if out_q else
                    np.empty(0, dtype=np.int64),
                    "nbr": np.concatenate(out_n) if out_n else
                    np.empty(0, dtype=np.int64),
                }
            )

    candidates = block_pairs.mapInPandas(
        partial_topk, schema="id long, nbr long"
    )
    qv = e.select(F.col("id"), F.col("v").alias("_qv"))
    nv = e.select(F.col("id").alias("nbr"), F.col("v").alias("_nv"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("cos").desc(), F.col("nbr")
    )
    return (
        candidates.join(qv, "id")
        .join(nv, "nbr")
        .select(
            "id",
            "nbr",
            F.round(cosine_similarity("_qv", "_nv"), 6).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("id", "nbr", "cos")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_blocks: int | None = None,
) -> DataFrame:
    """(qid, pred_label, votes): label each query vector by majority
    vote of its exact k nearest labeled corpus neighbors (cosine) —
    the kNN auto-labeler / weak-supervision step of embedding
    pipelines (label a small eval/probe set from a labeled corpus, or
    propagate scarce human labels onto new data).

    Scale shape — small-queries × huge-corpus, NOT the self-join of
    ``knn_join``: the query set (an eval suite, a probe batch) is
    MB-scale against a 100 TB corpus, so queries pack into ONE
    broadcast row and the corpus streams through in ``n_blocks``
    id-hashed blocks; each task runs one numpy GEMM (queries × block)
    and emits per-query partial top-k ids. Corpus blocks partition the
    neighbor set, so the union of per-block top-k contains the global
    top-k exactly; the rounding-margin band (cos ≥ round₆(kth) −
    5.01e-7) plus the JVM re-score + deterministic (round-6 cos DESC,
    nbr) rank make the result independent of numpy-vs-JVM summation
    order — the identical exactness argument as ``knn_join``.
    Candidate volume is ~n_blocks·k ids per query, never vectors.

    Vote tie-break is deterministic: highest count, then smallest
    label. Queries present in the corpus (same id) are self-masked.
    """
    from pyspark.sql import Window

    from mitoscape_spark.operators.dedup import (
        _auto_n_blocks,
        _require_integral_id,
    )

    _require_integral_id(corpus, id_col, "knn_classify")
    _require_integral_id(queries, id_col, "knn_classify")
    if k < 1:
        raise ValueError("knn_classify: k must be >= 1")
    c = corpus.select(
        F.col(id_col).alias("nbr"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col(label_col).alias("label"),
    ).where(F.col("v").isNotNull())
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).where(F.col("qv").isNotNull())
    if n_blocks is None:
        stats = c.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size("v")).alias("d")
        ).first()
        n_blocks = _auto_n_blocks((stats["n"] or 0) * (stats["d"] or 0) * 8)
    # the whole query set as ONE packed row — eval-suite-sized by
    # contract (documented), exactly like a broadcast dim table
    q_packed = q.agg(
        F.collect_list("qid").alias("qids"),
        F.collect_list("qv").alias("qvecs"),
    )
    blocks = (
        c.withColumn(
            "block", F.pmod(F.col("nbr"), F.lit(n_blocks)).cast("int")
        )
        .groupBy("block")
        .agg(
            F.collect_list("nbr").alias("ids_b"),
            F.collect_list("v").alias("vecs_b"),
        )
    )
    sc = corpus.sparkSession.sparkContext
    n_tasks = max(1, min(n_blocks, 2 * sc.defaultParallelism))
    pairs = blocks.join(F.broadcast(q_packed), F.lit(True)).repartition(
        n_tasks
    )

    def partial_topk(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_q, out_n = [], []
            for row in pdf.itertuples(index=False):
                qids = np.asarray(row.qids, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                mq = np.array([np.asarray(x) for x in row.qvecs])
                mb = np.array([np.asarray(x) for x in row.vecs_b])
                nq = np.maximum(np.linalg.norm(mq, axis=1), 1e-12)
                nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
                cos = (mq / nq[:, None]) @ (mb / nb[:, None]).T
                # self-mask by id equality (a query that also sits in
                # the corpus must not vote for itself); NaN, not -inf
                # — same reasoning as knn_join
                cos[qids[:, None] == ids_b[None, :]] = np.nan
                n_valid = (~np.isnan(cos)).sum(axis=1)
                kk = np.minimum(k, n_valid)
                desc = -np.sort(-np.nan_to_num(cos, nan=-np.inf), axis=1)
                keep_rows = kk > 0
                kth = np.full(len(qids), np.inf)
                kth[keep_rows] = desc[keep_rows, kk[keep_rows] - 1]
                cut = np.round(kth, 6) - 5.01e-7
                iq, ib = np.nonzero(cos >= cut[:, None])
                out_q.append(qids[iq])
                out_n.append(ids_b[ib])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q) if out_q else
                    np.empty(0, dtype=np.int64),
                    "nbr": np.concatenate(out_n) if out_n else
                    np.empty(0, dtype=np.int64),
                }
            )

    candidates = pairs.mapInPandas(partial_topk, schema="qid long, nbr long")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nbr"))
    topk = (
        candidates.join(q.withColumnRenamed("qv", "_qv"), "qid")
        .join(c.withColumnRenamed("v", "_nv"), "nbr")
        .select(
            "qid",
            "nbr",
            "label",
            F.round(cosine_similarity("_qv", "_nv"), 6).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    return (
        topk.groupBy("qid", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn("_vr", F.row_number().over(wv))
        .where(F.col("_vr") == 1)
        .select("qid", F.col("label").alias("pred_label"), "votes")
    )


def knn_join_ivf(
    embeddings: DataFrame,
    k: int = 10,
    index: "IVFFlatIndex | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_block_bytes: int = 64 << 20,
) -> DataFrame:
    """(id, nbr, cos): approximate kNN join via an IVF coarse
    quantizer — the 100 TB path where the exact ``knn_join``'s O(n²·d)
    GEMM stops being affordable. Each row probes its ``n_probe``
    nearest cells and candidates come from an equi-join on the cell id:
    per-cell work is |cell| × (queries probing it), so total cost is
    ~n²·p/C — pick ``n_centroids`` ∝ √n and the join is subquadratic
    with bounded cells AND enough join keys to parallelize. Scoring is
    a JVM column expression (no Python in the hot path); ranking uses
    the same deterministic (round-6 cos DESC, nbr) order as the exact
    join, so recall is directly comparable (pinned in tests).

    Pass a pre-``fit`` index to reuse a quantizer (or its persisted
    form via ``save_ivf``/``load_ivf``); default fits on the corpus.

    Per-cell work runs as numpy GEMMs inside ``applyInPandas``
    (members × probing queries), emitting id-only top-k candidates
    with the same rounding-margin band as the exact ``knn_join`` —
    a first cut scored the 2M candidate rows through the interpreted
    higher-order-function cosine expression and spent 40 s at a mere
    sf0.1; the GEMM form does the identical math in ~2 s and ships no
    vectors out of the cell task. Only the ~n·k surviving candidates
    re-score JVM-side for the deterministic final ranking.

    The score matrix is BLOCKED over query rows so each chunk stays
    ~``score_block_bytes`` (64 MB default, same convention as the
    blocked exact paths in operators/dedup.py): top-k-per-query is
    row-independent, so chunking is exact. Without the bound, a
    mis-sized quantizer (constant ``n_centroids`` on a grown corpus)
    materializes a |probing queries| × |cell| float64 matrix — ~20 GB
    and a kernel OOM kill at the 100× probe scale (PERF.md §26); the
    bound caps worker memory for ANY cell size, leaving only time to
    grow with the documented ~n²·p/C flop contract.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if k < 1:
        raise ValueError("knn_join_ivf: k must be >= 1")
    # same null-vector guard as the exact twin — a NULL embedding
    # would crash the assign/probe pandas UDFs mid-job
    embeddings = embeddings.where(F.col(vec_col).isNotNull())
    if index is None:
        index = IVFFlatIndex().fit(embeddings, vec_col=vec_col)
    assert index.centroids is not None, "call fit() first"
    cent, n_probe = index.centroids, index.n_probe

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = np.asarray(vecs.tolist(), dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(x @ cent.T), axis=1)[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    assigned = index.assign(embeddings, id_col, vec_col).transform(pin)
    members = assigned.select(
        "centroid", F.lit(False).alias("is_q"), "id", "v"
    )
    queries = assigned.select(
        F.explode(probe_cells("v")).alias("centroid"),
        F.lit(True).alias("is_q"), "id", "v",
    )

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        qs = pdf[pdf["is_q"]]
        ms = pdf[~pdf["is_q"]]
        if qs.empty or ms.empty:
            return pd.DataFrame(
                {"id": np.empty(0, dtype=np.int64),
                 "nbr": np.empty(0, dtype=np.int64)}
            )
        qid = qs["id"].to_numpy(dtype=np.int64)
        mid = ms["id"].to_numpy(dtype=np.int64)
        mq = np.array([np.asarray(x) for x in qs["v"]])
        mm = np.array([np.asarray(x) for x in ms["v"]])
        mq = mq / np.maximum(np.linalg.norm(mq, axis=1, keepdims=True), 1e-12)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        # blocked over query rows: each chunk's score matrix is
        # ~score_block_bytes; per-query top-k is row-independent so the
        # chunked result is bit-identical to the one-shot GEMM
        step = max(1, score_block_bytes // (8 * len(mid)))
        out_q, out_n = [], []
        for lo in range(0, len(qid), step):
            qidc = qid[lo:lo + step]
            cos = mq[lo:lo + step] @ mm.T
            cos[qidc[:, None] == mid[None, :]] = np.nan  # no self-match
            n_valid = (~np.isnan(cos)).sum(axis=1)
            kk = np.minimum(k, n_valid)
            desc = -np.sort(-np.nan_to_num(cos, nan=-np.inf), axis=1)
            keep_rows = kk > 0
            kth = np.full(len(qidc), np.inf)
            kth[keep_rows] = desc[keep_rows, kk[keep_rows] - 1]
            cut = np.round(kth, 6) - 5.01e-7
            ia, ib = np.nonzero(cos >= cut[:, None])
            out_q.append(qidc[ia])
            out_n.append(mid[ib])
        return pd.DataFrame(
            {"id": np.concatenate(out_q), "nbr": np.concatenate(out_n)}
        )

    candidates = (
        members.unionByName(queries)
        .groupBy("centroid")
        .applyInPandas(per_cell, "id long, nbr long")
        .distinct()  # a nbr can surface from several probed cells
    )
    qv = assigned.select("id", F.col("v").alias("_qv"))
    nv = assigned.select(F.col("id").alias("nbr"), F.col("v").alias("_nv"))
    w = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("nbr"))
    return (
        candidates.join(qv, "id")
        .join(nv, "nbr")
        .select(
            "id", "nbr",
            F.round(cosine_similarity("_qv", "_nv"), 6).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("id", "nbr", "cos")
    )


class SignRandomProjectionLSH:
    """Cosine LSH via seeded random hyperplane sign bits.

    ``n_planes`` bits per table → 2^n_planes buckets; ``n_tables``
    independent tables OR-ed together for recall. All hashing is
    JVM-side column arithmetic over a literal plane matrix (the planes
    are small: n_tables × n_planes × dim doubles).
    """

    def __init__(
        self, dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = 42
    ):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.n_planes = n_planes
        self.n_tables = n_tables

    def _fold_sql(self, vec_col: str, finish_sql) -> str:
        """THE sign-bit kernel (round 12, single source — VERDICT r11
        item 2): one ``aggregate`` pass over the vector accumulates all
        n_tables × n_planes plane dots into an array accumulator —
        acc[j] += v[i] · P[i][j] with additions in vector-index order,
        the SAME IEEE sequence as the per-plane fold it replaces (and
        as the oracle's list_dot_product restatement), so every sign
        bit is bit-identical. ``finish_sql`` maps the dots-array
        variable to the caller's SQL text (bucket id, bucket array,
        candidate predicate) INSIDE the fold, so the dots are computed
        exactly once per row however many buckets the caller derives.

        The whole kernel is ONE generated-and-parsed SQL expression:
        the functional-API form spent ~1.5 s per call in py4j driver
        round-trips just BUILDING the column tree (2048 plane literals
        plus per-bit ops — ~70% of ext_ann_lsh's wall-clock was
        expression construction, not execution); the equivalent parse
        is ~4 ms and yields the same resolved expressions."""
        flat = self.planes.reshape(self.n_tables * self.n_planes, -1)
        contribs = _double_array_sql(flat.T)
        zero = "array(" + ",".join(["0.0D"] * len(flat)) + ")"
        return (
            f"aggregate(zip_with({vec_col}, {contribs}, "
            "(_x, _pa) -> transform(_pa, _pv -> _x * _pv)), "
            f"{zero}, "
            "(_ac, _cc) -> zip_with(_ac, _cc, (_aa, _vv) -> _aa + _vv), "
            f"_dots -> {finish_sql('_dots')})"
        )

    def _bucket_sql(self, dots: str, table: int) -> str:
        """SQL text of one table's bucket id from the dots array —
        integer arithmetic only; the float work lives in the fold."""
        return " + ".join(
            f"(CAST(({dots}[{table * self.n_planes + p}] >= 0) AS INT)"
            f" * {1 << p})"
            for p in range(self.n_planes)
        )

    def _bucket_expr(self, vec_col: str, table: int):
        return F.expr(
            self._fold_sql(vec_col, lambda d: self._bucket_sql(d, table))
        )

    def bucketize(
        self,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, v, table, bucket) — one row per (vector, table).

        One fold pass computes every table's bucket; the per-table rows
        come from a posexplode of the bucket array instead of an
        n_tables-way unionAll that re-scanned the vector payload (and
        re-ran the fold) once per table."""
        e = embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        buckets = F.expr(
            self._fold_sql(
                "v",
                lambda d: "array("
                + ",".join(
                    self._bucket_sql(d, t) for t in range(self.n_tables)
                )
                + ")",
            )
        )
        return e.select(
            "id", "v", F.posexplode(buckets).alias("table", "bucket")
        )

    def topk(
        self,
        embeddings: DataFrame,
        query: list[float],
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Approximate top-k: score only vectors sharing a bucket with
        the query in at least one table.

        Round 11 (guide §2.3/§2.4): the candidate test is evaluated as
        ONE row pass — an OR of per-table bucket equalities — instead
        of materializing ``bucketize``'s n_tables-way unionAll (which
        scanned and shipped the 64-dim vector payload once per table
        and then dropDuplicates'd the blow-up back down). The
        candidate set is identical by definition: a vector qualifies
        iff ∃t: bucket_t(v) == bucket_t(q), which is exactly the OR
        filter. Round 12: the OR is the ``finish`` of ONE
        ``_dots_fold`` pass (the round-11 form re-ran the fold per
        table — 8× the float work; measured −18%, bit-identical), so
        the oracle-pinned sign-bit arithmetic lives in exactly one
        kernel that ``bucketize`` shares.
        """
        qv = np.asarray(query, dtype=float)
        q_buckets = {
            t: int(
                sum(
                    (float(self.planes[t, p] @ qv) >= 0) << p
                    for p in range(self.n_planes)
                )
            )
            for t in range(self.n_tables)
        }
        e = embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        cond = F.expr(
            self._fold_sql(
                "v",
                lambda d: " OR ".join(
                    f"(({self._bucket_sql(d, t)}) = {bk})"
                    for t, bk in q_buckets.items()
                ),
            )
        )
        q = _double_array_lit(query)
        # dropDuplicates preserves the old one-row-per-id contract for
        # inputs carrying duplicate ids (candidate-set-sized, not
        # corpus-sized)
        candidates = e.where(cond).dropDuplicates(["id"])
        return (
            candidates.select(
                "id",
                F.round(cosine_similarity("v", q), 6).alias("cos"),
            )
            .orderBy(F.col("cos").desc(), F.col("id"))
            .limit(k)
        )


class IVFFlatIndex:
    """IVF-Flat approximate nearest neighbor over an embedding column.

    ``fit`` trains a seeded k-means coarse quantizer on a bounded
    driver-side sample (Lloyd's, ``n_iter`` rounds — deterministic), then
    assigns every corpus vector its nearest centroid with an
    Arrow-vectorized pandas UDF (one numpy matmul per batch, no per-row
    Python). ``topk`` probes the ``n_probe`` centroids nearest the query
    and brute-forces cosine inside those cells only.

    Scale path: persist ``assign(...)`` partitioned by ``centroid`` —
    probing is then parquet partition pruning; cells stay balanced
    because k-means splits dense regions.
    """

    def __init__(
        self,
        n_centroids: int = 16,
        n_probe: int = 4,
        n_iter: int = 10,
        seed: int = 42,
        train_sample: int = 20_000,
    ):
        self.n_centroids = n_centroids
        self.n_probe = n_probe
        self.n_iter = n_iter
        self.seed = seed
        self.train_sample = train_sample
        self.centroids: np.ndarray | None = None

    # -- quantizer -------------------------------------------------------
    def fit(
        self,
        embeddings: DataFrame,
        vec_col: str = "embedding",
        distributed_threshold: int = 2_000_000,
    ) -> "IVFFlatIndex":
        """Train the coarse quantizer.  Corpora above
        ``distributed_threshold`` rows route to :meth:`fit_distributed`
        (pyspark.ml KMeans over the full corpus) — the driver-side
        spherical k-means below is the small/medium path.  Either way
        the training rows are a partition-independent seeded sample,
        never a first-partitions ``limit``.
        """
        total = embeddings.count()
        if total > distributed_threshold:
            return self.fit_distributed(embeddings, vec_col)
        sample = _training_sample(
            embeddings, vec_col, self.train_sample, self.seed, total=total
        )
        x = np.asarray(sample, dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(self.seed)
        centroids = x[rng.choice(len(x), self.n_centroids, replace=False)]
        for _ in range(self.n_iter):
            sims = x @ centroids.T  # cosine == dot on unit vectors
            assign = sims.argmax(axis=1)
            for c in range(self.n_centroids):
                members = x[assign == c]
                if len(members):
                    mu = members.mean(axis=0)
                    centroids[c] = mu / max(np.linalg.norm(mu), 1e-12)
        self.centroids = centroids
        return self

    def fit_distributed(
        self,
        embeddings: DataFrame,
        vec_col: str = "embedding",
    ) -> "IVFFlatIndex":
        """Train the coarse quantizer with pyspark.ml KMeans over the
        FULL corpus — the path for when embeddings exceed driver memory
        (the sample-based ``fit`` caps at ``train_sample`` rows).

        Vectors are unit-normalized JVM-side first, so euclidean
        k-means on them approximates spherical k-means (cosine cells);
        the returned centers are re-normalized and search proceeds
        through the same dot-product assignment as ``fit``.
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        norm = F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        )
        unit = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: x / F.greatest(F.col("_norm"), F.lit(1e-12)),
        )
        feats = (
            embeddings.withColumn("_norm", norm)
            .select(array_to_vector(unit).alias("features"))
        )
        model = KMeans(
            k=self.n_centroids, seed=self.seed, maxIter=self.n_iter
        ).fit(feats)
        centers = np.asarray(model.clusterCenters(), dtype=np.float64)
        self.centroids = centers / np.maximum(
            np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
        )
        return self

    def assign(
        self,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, v, centroid) — corpus vectors tagged with their cell."""
        assert self.centroids is not None, "call fit() first"
        from pyspark.sql.functions import pandas_udf

        cent = self.centroids  # closure-captured; broadcast by Spark

        @pandas_udf("int")
        def nearest_centroid(vecs: pd.Series) -> pd.Series:
            x = np.asarray(vecs.tolist(), dtype=np.float64)
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            return pd.Series((x @ cent.T).argmax(axis=1).astype("int32"))

        return embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).withColumn("centroid", nearest_centroid("v"))

    # -- search ----------------------------------------------------------
    def topk(
        self,
        embeddings: DataFrame,
        query: list[float],
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        assert self.centroids is not None, "call fit() first"
        qv = np.asarray(query, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        probe = np.argsort(-(self.centroids @ qv))[: self.n_probe]
        cells = [int(c) for c in probe]
        q = _double_array_lit(query)
        return (
            self.assign(embeddings, id_col, vec_col)
            .where(F.col("centroid").isin(cells))
            .select(
                "id",
                F.round(cosine_similarity("v", q), 6).alias("cos"),
            )
            .orderBy(F.col("cos").desc(), F.col("id"))
            .limit(k)
        )


def lsh_near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos): embedding near-dup pairs generated inside LSH
    buckets — the scale path for dedup.embedding_near_duplicates'
    brute-force baseline. Candidates come from a self-equi-join on
    (table, bucket) (uniform md-bucket keys shuffle evenly); the exact
    cosine then filters, so results are a subset of brute force with
    recall tuned by (n_planes, n_tables).
    """
    lsh = SignRandomProjectionLSH(dim=dim, n_planes=n_planes, n_tables=n_tables)
    buckets = lsh.bucketize(embeddings, id_col, vec_col)
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("va", "vb"), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


class PQIndex:
    """Product-quantization ANN: vectors compress to ``m`` uint8 codes
    (one per subspace, ``k`` centroids each); queries score candidates
    with an asymmetric-distance table — ``m`` lookups + adds per
    vector instead of a full d-dim dot product.

    The memory-side scale path: a 64-dim float corpus shrinks ~64× (m
    bytes/vector), so a 100 TB embedding set's codes fit the cluster's
    page cache and the scan is bandwidth-, not FLOP-, bound. Standard
    composition: IVF cells for partition pruning × PQ codes inside the
    cell; here PQ stands alone so its recall is measurable in
    isolation.

    Training follows the same sample-based convention as IVFFlatIndex
    (a quantizer needs thousands of vectors, not the corpus); vectors
    are unit-normalized so the inner-product ADC ranks by cosine.
    """

    def __init__(
        self,
        m: int = 8,
        k: int = 16,
        train_sample: int = 4096,
        n_iter: int = 12,
        seed: int = 7,
    ):
        self.m, self.k = m, k
        self.train_sample, self.n_iter, self.seed = train_sample, n_iter, seed
        self.codebooks: np.ndarray | None = None  # (m, k, d_sub)

    @staticmethod
    def _unit(x: np.ndarray) -> np.ndarray:
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    def fit(self, embeddings: DataFrame, vec_col: str = "embedding") -> "PQIndex":
        sample = _training_sample(
            embeddings, vec_col, self.train_sample, self.seed
        )
        x = self._unit(np.asarray(sample, dtype=np.float64))
        d = x.shape[1]
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        d_sub = d // self.m
        rng = np.random.default_rng(self.seed)
        books = []
        for j in range(self.m):
            xs = x[:, j * d_sub : (j + 1) * d_sub]
            cent = xs[rng.choice(len(xs), self.k, replace=False)]
            for _ in range(self.n_iter):
                d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(self.k):
                    members = xs[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books.append(cent)
        self.codebooks = np.stack(books)  # (m, k, d_sub)
        return self

    def encode(
        self,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, codes array<int>): per-subspace nearest-centroid codes,
        computed batch-vectorized in mapInPandas (no shuffle)."""
        books = self.codebooks
        m, k, d_sub = books.shape

        def run(batches):
            for pdf in batches:
                vecs = self._unit(
                    np.asarray(list(pdf[vec_col]), dtype=np.float64)
                )
                codes = np.empty((len(vecs), m), dtype=np.int64)
                for j in range(m):
                    xs = vecs[:, j * d_sub : (j + 1) * d_sub]
                    d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    codes[:, j] = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {"id": pdf[id_col], "codes": list(codes)}
                )

        return embeddings.select(id_col, vec_col).mapInPandas(
            run, "id long, codes array<long>"
        )

    def topk(
        self,
        codes: DataFrame,
        query: list[float],
        k: int = 10,
    ) -> DataFrame:
        """(id, score): top-k by the asymmetric inner-product estimate
        Σ_j <q_j, centroid_j[code_j]> — the distance TABLE (m×k floats)
        broadcasts by closure; scoring is m gathers + a sum per row,
        then per-partition top-k (TakeOrderedAndProject, no global
        sort)."""
        books = self.codebooks
        m, _k, d_sub = books.shape
        q = np.asarray(query, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        table = np.stack(
            [books[j] @ q[j * d_sub : (j + 1) * d_sub] for j in range(m)]
        )  # (m, k)

        def run(batches):
            for pdf in batches:
                c = np.asarray(list(pdf["codes"]), dtype=np.int64)
                score = table[np.arange(m)[None, :], c].sum(axis=1)
                yield pd.DataFrame(
                    {"id": pdf["id"], "score": np.round(score, 6)}
                )

        scored = codes.mapInPandas(run, "id long, score double")
        return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


class IVFPQIndex:
    """IVF × PQ — the composed billion-vector recipe: IVF cells give
    PARTITION PRUNING (probe n_probe/n_centroids of the corpus), PQ
    codes give MEMORY compression inside the probed cells (~64×,
    bandwidth-bound ADC scan). Each half is the engine's existing
    operator; this class is the composition plus the cell-pruned scan.

    At 100 TB: write the encoded table partitioned by `centroid` so a
    probe is literal partition pruning on disk; codes-only scans never
    touch the float vectors.
    """

    def __init__(
        self,
        n_centroids: int = 8,
        n_probe: int = 3,
        m: int = 8,
        k: int = 16,
        seed: int = 7,
    ):
        self.ivf = IVFFlatIndex(
            n_centroids=n_centroids, n_probe=n_probe, seed=seed
        )
        self.pq = PQIndex(m=m, k=k, seed=seed)

    def fit(self, embeddings: DataFrame, vec_col: str = "embedding"):
        self.ivf.fit(embeddings, vec_col)
        self.pq.fit(embeddings, vec_col)
        return self

    def encode(
        self,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, centroid, codes): the compressed, cell-tagged index
        table — the thing a deployment persists partitioned by cell."""
        cells = self.ivf.assign(embeddings, id_col, vec_col).select(
            "id", "centroid"
        )
        codes = self.pq.encode(embeddings, id_col, vec_col)
        return codes.join(cells, "id")

    def topk(
        self, index: DataFrame, query: list[float], k: int = 10
    ) -> DataFrame:
        """ADC scan over ONLY the probed cells of the encoded table."""
        qv = np.asarray(query, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        probe = np.argsort(-(self.ivf.centroids @ qv))[: self.ivf.n_probe]
        pruned = index.where(
            F.col("centroid").isin([int(c) for c in probe])
        )
        return self.pq.topk(pruned.select("id", "codes"), query, k=k)


def literal_pq_codebooks(
    m: int, k: int, d: int, seed: int
) -> np.ndarray:
    """Data-INdependent PQ codebooks — a pure function of the seed,
    like SignRandomProjectionLSH's hyperplanes. Fitted (k-means)
    codebooks are a function of the data, so an oracle re-deriving
    them would have to embed numbers computed by the system under
    test; these literal books instead let DuckDB re-derive the whole
    encode → ADC-table → top-k machinery end-to-end. Verification-
    grade, not recall-grade — production callers fit."""
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    # ~1/sqrt(d) scale puts centroids on the magnitude of unit-vector
    # subspace coordinates, so codes spread across all k entries
    return rng.standard_normal((m, k, d // m)) / np.sqrt(d)


def literal_ivf_centroids(n: int, d: int, seed: int) -> np.ndarray:
    """Data-INdependent unit-norm coarse centroids (see
    literal_pq_codebooks): random directions partition the sphere into
    Voronoi cells well enough to exercise assignment + probe pruning,
    and DuckDB can re-derive both from the same literals."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n, d))
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


# ---------------------------------------------------------- persistence
#
# Index state is the tiny fitted numpy arrays (centroids / codebooks —
# KBs regardless of corpus size); the ENCODED TABLE is an ordinary
# DataFrame the deployment persists as parquet partitioned by cell.
# save/load here cover the fitted quantizers so a serving job can load
# the index without re-sampling the corpus (and so two jobs can never
# drift apart on quantizer state).

def _save_state(path: str, meta: dict, arrays: dict) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    np.savez(os.path.join(path, "state.npz"), **arrays)


def _load_state(path: str) -> tuple[dict, dict]:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    arrays = dict(np.load(os.path.join(path, "state.npz")))
    return meta, arrays


def save_ivf(index: IVFFlatIndex, path: str) -> None:
    if index.centroids is None:
        raise ValueError("save_ivf: index not fitted")
    _save_state(
        path,
        {
            "kind": "ivf",
            "n_centroids": index.n_centroids,
            "n_probe": index.n_probe,
            "n_iter": index.n_iter,
            "seed": index.seed,
            "train_sample": index.train_sample,
        },
        {"centroids": index.centroids},
    )


def load_ivf(path: str) -> IVFFlatIndex:
    meta, arrays = _load_state(path)
    if meta.get("kind") != "ivf":
        raise ValueError(f"not an IVF index dir: {path}")
    idx = IVFFlatIndex(
        n_centroids=meta["n_centroids"],
        n_probe=meta["n_probe"],
        n_iter=meta["n_iter"],
        seed=meta["seed"],
        train_sample=meta["train_sample"],
    )
    idx.centroids = arrays["centroids"]
    return idx


def save_pq(index: PQIndex, path: str) -> None:
    if index.codebooks is None:
        raise ValueError("save_pq: index not fitted")
    _save_state(
        path,
        {
            "kind": "pq",
            "m": index.m,
            "k": index.k,
            "train_sample": index.train_sample,
            "n_iter": index.n_iter,
            "seed": index.seed,
        },
        {"codebooks": index.codebooks},
    )


def load_pq(path: str) -> PQIndex:
    meta, arrays = _load_state(path)
    if meta.get("kind") != "pq":
        raise ValueError(f"not a PQ index dir: {path}")
    idx = PQIndex(
        m=meta["m"],
        k=meta["k"],
        train_sample=meta["train_sample"],
        n_iter=meta["n_iter"],
        seed=meta["seed"],
    )
    idx.codebooks = arrays["codebooks"]
    return idx


def save_ivfpq(index: IVFPQIndex, path: str) -> None:
    import os

    save_ivf(index.ivf, os.path.join(path, "ivf"))
    save_pq(index.pq, os.path.join(path, "pq"))


def load_ivfpq(path: str) -> IVFPQIndex:
    import os

    idx = IVFPQIndex()
    idx.ivf = load_ivf(os.path.join(path, "ivf"))
    idx.pq = load_pq(os.path.join(path, "pq"))
    return idx


def embedding_distance_histogram(
    embeddings: DataFrame,
    n_bins: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Histogram of ALL-pairs cosine similarities (bins over [-1, 1])
    WITHOUT materializing a single pair row — the distance-distribution
    profile that picks the embedding-dedup threshold / ANN radius by
    evidence instead of folklore (a bimodal profile hands you ε; a
    unimodal one warns dedup will be a precision bloodbath).

    Plan: the same blocked packing as
    ``dedup.embedding_near_duplicates`` (one shuffle into ~B block
    matrices), one numpy GEMM per block pair inside ``mapInPandas`` —
    but each task reduces its n²/B² cosines to ≤ ``n_bins`` partial
    counts via ``np.bincount`` before anything leaves the task; the
    final agg sums ≤ tasks·n_bins rows. O(n²·d) flops, O(bins) output.

    Cross-engine note: a pair whose cosine sits within float-GEMM
    error (~1e-15) of a bin edge could bin differently than a
    sequential-dot oracle — probability ~pairs·1e-14, the repo's
    negligible class.
    """
    from mitoscape_spark.operators.dedup import (
        _auto_n_blocks,
        _parallelism_blocks,
        _require_integral_id,
    )

    _require_integral_id(
        embeddings, id_col, "embedding_distance_histogram"
    )
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull())
    if n_blocks is None:
        stats = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.size("v")).alias("d"),
        ).first()
        n_blocks = max(
            _auto_n_blocks((stats["n"] or 0) * (stats["d"] or 0) * 8),
            _parallelism_blocks(
                embeddings.sparkSession,
                float(stats["n"] or 0) ** 2 * (stats["d"] or 0),
            ),
        )
    packed = (
        e.withColumn(
            "block", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int")
        )
        .groupBy("block")
        .agg(
            F.collect_list("id").alias("ids"),
            F.collect_list("v").alias("vecs"),
        )
    )
    a = packed.select(
        F.col("block").alias("block_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = packed.select(
        F.col("block").alias("block_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    sc = embeddings.sparkSession.sparkContext
    n_tasks = max(
        1,
        min(n_blocks * (n_blocks + 1) // 2, 2 * sc.defaultParallelism),
    )
    block_pairs = a.join(
        b, F.col("block_a") <= F.col("block_b")
    ).repartition(n_tasks)
    bins = int(n_bins)

    def hist_partial(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            acc = np.zeros(bins, dtype=np.int64)
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                ma = np.array([np.asarray(x) for x in row.vecs_a])
                mb = np.array([np.asarray(x) for x in row.vecs_b])
                # floor norms as knn_classify does: a zero-norm vector
                # would yield NaN cosines, and floor(NaN)→int64 is
                # undefined (INT64_MIN), silently polluting bin 0
                na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
                nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
                cos = (ma @ mb.T) / np.outer(na, nb)
                if row.block_a == row.block_b:
                    mask = ids_a[:, None] < ids_b[None, :]
                else:
                    mask = np.ones_like(cos, dtype=bool)
                vals = cos[mask]
                idx = np.clip(
                    np.floor((vals + 1.0) / 2.0 * bins).astype(
                        np.int64
                    ),
                    0,
                    bins - 1,
                )
                acc += np.bincount(idx, minlength=bins)
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame(
                {"bin": nz.astype("int32"), "n": acc[nz]}
            )

    partials = block_pairs.mapInPandas(
        hist_partial, schema="bin int, n long"
    )
    return (
        partials.groupBy("bin")
        .agg(F.sum("n").cast("long").alias("n_pairs"))
        .select(
            "bin",
            F.round(F.lit(-1.0) + F.col("bin") * (2.0 / bins), 6)
            .alias("bin_lo"),
            "n_pairs",
        )
    )
