"""Clustering + balanced sampling (operators/clustering.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mitoscape_spark.operators.clustering import (
    balanced_sample,
    cluster_profiles,
    fit_clusters,
)


def _blobs_df(spark, seed=3):
    """Three tight, well-separated 4-d blobs: 30 + 20 + 10 points."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], dtype=float
    )
    rows, truth = [], {}
    i = 0
    for b, n in enumerate((30, 20, 10)):
        for _ in range(n):
            v = centers[b] + rng.normal(scale=0.05, size=4)
            rows.append((i, [float(x) for x in v]))
            truth[i] = b
            i += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        truth,
    )


def test_kmeans_recovers_separated_blobs(spark):
    df, truth = _blobs_df(spark)
    assigned, centers = fit_clusters(df, k=3, seed=7)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    # cluster ids are arbitrary; require a perfect relabeling
    mapping = {}
    for i, b in truth.items():
        mapping.setdefault(got[i], set()).add(b)
    assert len(mapping) == 3
    assert all(len(v) == 1 for v in mapping.values())
    assert centers.count() == 3


def test_cluster_profiles_geometry_matches_numpy(spark):
    df, _ = _blobs_df(spark)
    assigned, centers = fit_clusters(df, k=3, seed=7)
    prof = {r.cluster: r for r in
            cluster_profiles(df, assigned, centers).collect()}
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    cent = {r.cluster: np.array(r.center) for r in centers.collect()}
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    for c, row in prof.items():
        d = [
            np.linalg.norm(vecs[i] - cent[c])
            for i, cl in got.items()
            if cl == c
        ]
        assert row.n == len(d)
        assert abs(row.mean_dist - round(float(np.mean(d)), 6)) < 1e-6
        assert abs(row.max_dist - round(float(np.max(d)), 6)) < 1e-6


def test_balanced_sample_quotas_and_determinism(spark):
    df, _ = _blobs_df(spark)
    assigned, _ = fit_clusters(df, k=3, seed=7)
    s1 = balanced_sample(assigned, per_cluster=12)
    sizes = {
        r.cluster: r.n
        for r in s1.groupBy("cluster").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    # quota binds on the 30- and 20-point clusters, not the 10-point one
    assert sorted(sizes.values()) == [10, 12, 12]
    ids1 = sorted(r.vec_id for r in s1.collect())
    ids2 = sorted(r.vec_id for r in balanced_sample(
        assigned, per_cluster=12
    ).collect())
    assert ids1 == ids2
    # a different salt draws a different (but equally sized) sample
    ids3 = sorted(
        r.vec_id
        for r in balanced_sample(
            assigned, per_cluster=12, salt="other"
        ).collect()
    )
    assert ids3 != ids1


# --------------------------------------------------- semantic dedup
from mitoscape_spark.operators.clustering import (
    semantic_dedup,
    semantic_dedup_pairs,
)


def _dup_corpus(spark, seed=11):
    """Blobs + planted near-copies (id 1000+i ≈ id i) inside blobs."""
    rng = np.random.default_rng(seed)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0]], dtype=float)
    rows = []
    for b, n in enumerate((20, 20)):
        for j in range(n):
            i = b * 100 + j
            v = centers[b] + rng.normal(scale=0.3, size=4)
            rows.append((i, [float(x) for x in v]))
            if j < 5:  # five planted near-duplicates per blob
                w = v + rng.normal(scale=1e-4, size=4)
                rows.append((1000 + i, [float(x) for x in w]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semantic_dedup_pairs_match_bruteforce_within_cluster(spark):
    df = _dup_corpus(spark)
    assigned, _ = fit_clusters(df, k=2, seed=5)
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(df, assigned, 0.9999).collect()
    }
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    cl = {r.vec_id: r.cluster for r in assigned.collect()}
    want = set()
    ids = sorted(vecs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if cl[a] != cl[b]:
                continue
            ca = vecs[a] / np.linalg.norm(vecs[a])
            cb = vecs[b] / np.linalg.norm(vecs[b])
            if ca @ cb >= 0.9999:
                want.add((a, b))
    assert got == want
    assert len(want) >= 10  # every planted copy found


def test_semantic_dedup_keeps_canonical_min_id(spark):
    df = _dup_corpus(spark)
    kept = {
        r.vec_id
        for r in semantic_dedup(
            df, k=2, threshold=0.9999, seed=5
        ).collect()
    }
    # expected survivors: union-find over brute-force same-cluster
    # pairs (natural near-dups among originals count too), min id wins
    assigned, _ = fit_clusters(df, k=2, seed=5)
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    cl = {r.vec_id: r.cluster for r in assigned.collect()}
    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if cl[a] != cl[b]:
                continue
            ua = vecs[a] / np.linalg.norm(vecs[a])
            ub = vecs[b] / np.linalg.norm(vecs[b])
            if ua @ ub >= 0.9999:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in vecs:
        comp.setdefault(find(i), set()).add(i)
    want = {min(members) for members in comp.values()}
    assert kept == want
    # every planted copy whose original shares its cluster is gone
    gone = set(vecs) - kept
    assert any(i >= 1000 for i in gone)
    for i in gone:
        assert find(i) in kept


def test_semantic_dedup_works_with_string_ids(spark):
    rows = [
        ("doc-a", [10.0, 0.0, 0.0, 0.0]),
        ("doc-b", [10.0001, 0.0, 0.0, 0.0]),   # near-copy of doc-a
        ("doc-c", [0.0, 10.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    assigned, _ = fit_clusters(df, k=2, seed=3)
    pairs = semantic_dedup_pairs(df, assigned, 0.9999).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [("doc-a", "doc-b")]
    kept = {
        r.vec_id
        for r in semantic_dedup(df, k=2, threshold=0.9999, seed=3).collect()
    }
    assert kept == {"doc-a", "doc-c"}


def test_semantic_dedup_cell_guard_giant_identical_cell(spark):
    """Round-3 verdict #3: a degenerate fit (one giant cohesive cell)
    must not go quadratic. 1,200 identical vectors in ONE cell with
    max_cell_size=128: the guard's star fallback emits n−1 verified
    links to the min id (not ~720k GEMM pairs), and the downstream
    keep-set is byte-identical to the exact answer — only the min id
    survives."""
    n = 1200
    df = spark.createDataFrame(
        [(i, [3.0, 1.0, 4.0, 1.5]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    assigned = df.select("vec_id", F.lit(0).alias("cluster"))
    pairs = semantic_dedup_pairs(
        df, assigned, threshold=0.9999, max_cell_size=128
    ).collect()
    # linear edge count: rep→member spokes + consecutive chain links,
    # never the ~720k dense pair matrix
    got = {(p.id_a, p.id_b) for p in pairs}
    spokes = {(0, i) for i in range(1, n)}
    chain = {(i, i + 1) for i in range(1, n - 1)}
    assert got == spokes | chain
    assert all(p.cos >= 0.9999 for p in pairs)
    kept = {
        r.vec_id
        # k=2 (pyspark KMeans requires k>1); identical points collapse
        # both centers, so ties land every row in one giant cell anyway
        for r in semantic_dedup(
            df, k=2, threshold=0.9999, seed=5, max_cell_size=128
        ).collect()
    }
    assert kept == {0}


def test_semantic_dedup_cell_guard_bisection_recovers_blobs(spark):
    """Over-cap cell holding two well-separated blobs: the local
    2-means bisection must separate them, after which within-blob
    pairs are EXACT (equal to brute force — no above-threshold pair
    crosses the blob boundary, so nothing is lost to the split)."""
    rng = np.random.default_rng(7)
    rows = []
    for b, center in enumerate(
        (np.array([10.0, 0, 0, 0]), np.array([0, 10.0, 0, 0]))
    ):
        for j in range(50):
            i = b * 1000 + j
            v = center + rng.normal(scale=0.3, size=4)
            rows.append((i, [float(x) for x in v]))
            if j < 8:  # planted near-copies
                w = v + rng.normal(scale=1e-4, size=4)
                rows.append((i + 500, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.select("vec_id", F.lit(0).alias("cluster"))
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            df, assigned, threshold=0.9999, max_cell_size=64
        ).collect()
    }
    vecs = {i: np.array(v) for i, v in rows}
    ids = sorted(vecs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ua = vecs[a] / np.linalg.norm(vecs[a])
            ub = vecs[b] / np.linalg.norm(vecs[b])
            if ua @ ub >= 0.9999:
                want.add((a, b))
    assert got == want
    assert len(want) >= 16  # every planted copy found


def test_ann_index_persistence_roundtrip(spark, tmp_path, sf_smoke):
    import numpy as np

    from mitoscape_spark.operators.similarity import (
        IVFPQIndex,
        load_ivfpq,
        save_ivfpq,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    idx = IVFPQIndex(n_centroids=4, n_probe=2, m=8, k=8).fit(emb)
    encoded = idx.encode(emb)
    q = list(emb.where("vec_id = 0").head().embedding)
    before = [(r.id, r.score) for r in idx.topk(encoded, q, k=5).collect()]

    path = str(tmp_path / "ann_index")
    save_ivfpq(idx, path)
    restored = load_ivfpq(path)
    assert np.array_equal(restored.ivf.centroids, idx.ivf.centroids)
    assert np.array_equal(restored.pq.codebooks, idx.pq.codebooks)
    after = [
        (r.id, r.score) for r in restored.topk(encoded, q, k=5).collect()
    ]
    assert before == after  # serving job reproduces the fit job exactly
