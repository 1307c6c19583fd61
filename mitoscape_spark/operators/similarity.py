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

Built-in BucketedRandomProjectionLSH (pyspark.ml) covers euclidean
distance; cosine needs the sign-projection variant, implemented here as
pure column expressions over a broadcast plane matrix literal.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.functions.vectors import cosine_similarity


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
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col).alias("id"),
        F.round(
            cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
        ).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col("id")).limit(k)


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

    def _bucket_expr(self, vec_col: str, table: int):
        bits = []
        for p in range(self.n_planes):
            plane = F.array(
                *[F.lit(float(x)) for x in self.planes[table, p]]
            )
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append((dot >= 0).cast("int") * (2**p))
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        return bucket

    def bucketize(
        self,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, v, table, bucket) — one row per (vector, table)."""
        e = embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        tables = [
            e.select(
                "id",
                "v",
                F.lit(t).alias("table"),
                self._bucket_expr("v", t).alias("bucket"),
            )
            for t in range(self.n_tables)
        ]
        out = tables[0]
        for t in tables[1:]:
            out = out.unionAll(t)
        return out

    def topk(
        self,
        embeddings: DataFrame,
        query: list[float],
        k: int = 10,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Approximate top-k: score only vectors sharing a bucket with
        the query in at least one table."""
        buckets = self.bucketize(embeddings, id_col, vec_col)
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
        cond = None
        for t, bk in q_buckets.items():
            c = (F.col("table") == t) & (F.col("bucket") == bk)
            cond = c if cond is None else (cond | c)
        q = F.array(*[F.lit(float(x)) for x in query])
        candidates = (
            buckets.where(cond).select("id", "v").dropDuplicates(["id"])
        )
        return (
            candidates.select(
                "id",
                F.round(cosine_similarity("v", q), 6).alias("cos"),
            )
            .orderBy(F.col("cos").desc(), F.col("id"))
            .limit(k)
        )
