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
