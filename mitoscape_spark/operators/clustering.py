"""Corpus clustering + cluster-aware sampling over embedding columns.

The training-data recipe behind "semantic dedup" and diversity-balanced
mixes (SemDeDup, cluster-balanced data selection): k-means the corpus
embeddings, inspect cluster geometry, then sample evenly (or by quota)
per cluster instead of uniformly — head topics stop dominating.

Scale shape:
- fit: pyspark.ml KMeans — distributed Lloyd iterations, centers-only
  driver state (k × dim doubles; corpus never leaves executors).
- assign: model.transform — JVM vector ops, no Python boundary.
- profiles: centers join back as a BROADCAST dim table; per-row
  distance is a zip_with/aggregate column expression feeding one
  partial+final agg. No UDFs anywhere in the readout path.
- sampling: deterministic md5-hash ranking per cluster (same
  convention as operators/sampling.py) — a window per cluster,
  re-runnable byte-identically on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_clusters(
    embeddings: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 20,
):
    """Fit k-means and assign every row: returns (assigned, centers).

    ``assigned``: input ids + ``cluster`` int. ``centers``: a small
    (cluster, center array<double>) DataFrame built from the fitted
    model — broadcastable wherever geometry is needed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        ),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    assigned = (
        model.transform(feats)
        .select(F.col(id_col), F.col("prediction").alias("cluster"))
    )
    spark = embeddings.sparkSession
    centers = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "cluster int, center array<double>",
    )
    return assigned, centers


def cluster_profiles(
    embeddings: DataFrame,
    assigned: DataFrame,
    centers: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cluster, n, mean_dist, max_dist): size + tightness per cluster.

    Distance to the cluster's center is a pure column expression
    (zip_with squared diffs → aggregate sum → sqrt) after a broadcast
    join on the k-row centers table; one agg job total.
    """
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("center"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .join(assigned, id_col)
        .join(F.broadcast(centers), "cluster")
        .withColumn("dist", dist)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("dist"), 6).alias("mean_dist"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
    )


def balanced_sample(
    assigned: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    salt: str = "balanced",
) -> DataFrame:
    """Up to ``per_cluster`` rows from every cluster, deterministically.

    Rank within cluster by md5(salt, id) — a content-addressed shuffle
    order, reproducible across runs and engines — and keep the first
    ``per_cluster``. Head clusters stop dominating the sample; clusters
    smaller than the quota contribute everything.
    """
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col(id_col))
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_cluster)
        .drop("rk")
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    assigned: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = 8192,
) -> DataFrame:
    """(id_a, id_b, cos): cosine pairs ≥ threshold WITHIN each
    cluster — the SemDeDup decomposition (Abbas et al. 2023): k-means
    first, quadratic verification only inside cells.

    Each cluster is one ``applyInPandas`` group: a GEMM over the
    cluster's unit vectors, emitting only above-threshold index pairs.
    The quadratic term is bounded by the LARGEST CELL — and because a
    degenerate global fit (one giant cell) would otherwise go quadratic
    with no loud failure (round-3 verdict #3), cells over
    ``max_cell_size`` are guarded, the same contract as the LSH
    hot-bucket star cap:

    - an over-cap cell is recursively BISECTED by a deterministic local
      spherical 2-means (finer-k SemDeDup semantics — pairs crossing a
      bisection boundary are dropped, exactly the approximation a
      larger global k would make), until every piece fits;
    - a piece that will not split (a cohesive blob — near-identical
      vectors, where bisection cannot make progress) emits VERIFIED
      sparse links instead of the n²/2 pair matrix: a representative
      star (members with cos(rep, x) ≥ threshold link to the
      smallest-id member) plus a consecutive-member chain (id-sorted
      neighbors with cos ≥ threshold). For the giant-IDENTICAL-cluster
      case every spoke verifies, so the downstream connected
      components/keep-set are exactly the unguarded answer; for a
      merely-cohesive blob the links are a verified SUBSET of the true
      pair set (members above threshold to neither the rep nor an
      id-adjacent neighbor can disconnect) — the same
      keep-more-never-wrong-pairs approximation direction as a larger
      global k. Per-task memory stays O(max_cell_size² + n·d).

    ``max_cell_size=None`` disables the guard (exact within-cell
    pairs whatever the fit). Cross-cluster near-dups are deliberately
    out of scope (the method's documented approximation); the exact
    alternative is operators.dedup.embedding_near_duplicates.
    """
    import numpy as np
    import pandas as pd

    joined = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).join(assigned.select(id_col, "cluster"), id_col)
    # pair schema follows the id column's ACTUAL type — hardcoding
    # long would crash (or null out) string/UUID ids at Arrow
    # conversion time, exactly the ids the id_col parameter invites
    id_type = embeddings.schema[id_col].dataType.simpleString()

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by id: bisection seeds and star representatives become
        # content-deterministic (groupBy hands rows in shuffle order)
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        x = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        x = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []

        def emit(a: np.ndarray, b: np.ndarray, cos: np.ndarray) -> None:
            swap = ~(a < b)  # np.where-safe for numeric AND string ids
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
            out_c.append(np.round(cos, 6))

        def gemm(idx: np.ndarray) -> None:
            sub = x[idx]
            sims = sub @ sub.T
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            if len(ia):
                emit(ids[idx][ia], ids[idx][ib], sims[ia, ib])

        def star(idx: np.ndarray) -> None:
            # idx is id-sorted; rep = smallest id. VERIFIED links only:
            # rep→member spokes plus consecutive-member chain links —
            # both O(n·d), and the chain catches members similar to
            # their neighbors but not to the rep (an edge-sitting rep
            # would otherwise disconnect them; see docstring for the
            # exact coverage statement)
            rep, rest = idx[0], idx[1:]
            cos = x[rest] @ x[rep]
            hit = cos >= threshold
            if hit.any():
                emit(
                    np.repeat(ids[rep], int(hit.sum())),
                    ids[rest][hit],
                    cos[hit],
                )
            if len(idx) > 2:
                chain = np.einsum("ij,ij->i", x[idx[:-1]], x[idx[1:]])
                chit = chain >= threshold
                if chit.any():
                    emit(ids[idx[:-1]][chit], ids[idx[1:]][chit],
                         chain[chit])

        def split(idx: np.ndarray) -> None:
            n = len(idx)
            if max_cell_size is None or n <= max_cell_size:
                gemm(idx)
                return
            # deterministic spherical 2-means: seed with the min-id
            # point and its cosine-farthest peer, 5 Lloyd rounds
            sub = x[idx]
            c0 = sub[0]
            c1 = sub[int(np.argmin(sub @ c0))]
            for _ in range(5):
                side = (sub @ c1) > (sub @ c0)
                if side.all() or not side.any():
                    break
                c0 = sub[~side].mean(axis=0)
                c1 = sub[side].mean(axis=0)
                c0 /= max(np.linalg.norm(c0), 1e-12)
                c1 /= max(np.linalg.norm(c1), 1e-12)
            side = (sub @ c1) > (sub @ c0)
            small = int(min(side.sum(), n - side.sum()))
            if small < max(1, n // 20):
                # no progress — cohesive blob; cap-and-star like LSH
                star(idx)
                return
            split(idx[~side])
            split(idx[side])

        split(np.arange(len(ids)))
        if not out_a:  # typed empties — Arrow needs the id dtype
            return pd.DataFrame(
                {"id_a": ids[:0], "id_b": ids[:0],
                 "cos": np.empty(0, dtype=np.float64)}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return joined.groupBy("cluster").applyInPandas(
        per_cluster, f"id_a {id_type}, id_b {id_type}, cos double"
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_cell_size: int | None = 8192,
) -> DataFrame:
    """Survivors after cluster-scoped near-dup removal: for every
    within-cluster near-dup component the smallest id is kept (rows in
    no pair survive untouched). Composition: fit_clusters →
    semantic_dedup_pairs → connected components → anti-join
    (operators.dedup.dedup_keep_canonical)."""
    from mitoscape_spark.operators.dedup import dedup_keep_canonical

    assigned, _ = fit_clusters(
        embeddings, k=k, vec_col=vec_col, id_col=id_col, seed=seed
    )
    pairs = semantic_dedup_pairs(
        embeddings, assigned, threshold, id_col, vec_col,
        max_cell_size=max_cell_size,
    )
    return dedup_keep_canonical(
        embeddings, pairs.withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b"),
        id_col=id_col,
    )
