"""embedding_distance_histogram vs numpy brute force."""

import numpy as np
import pytest

from mitoscape_spark.operators.similarity import (
    embedding_distance_histogram,
)


def _corpus(spark, n=60, d=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        vecs,
    )


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_histogram_matches_numpy(spark, n_blocks):
    df, vecs = _corpus(spark)
    got = {
        r["bin"]: r["n_pairs"]
        for r in embedding_distance_histogram(
            df, n_bins=20, n_blocks=n_blocks
        ).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(vecs), k=1)
    idx = np.clip(
        np.floor((cos[iu] + 1.0) / 2.0 * 20).astype(int), 0, 19
    )
    want = {int(b): int(c) for b, c in
            zip(*np.unique(idx, return_counts=True))}
    assert got == want
    assert sum(got.values()) == len(vecs) * (len(vecs) - 1) // 2


def test_histogram_zero_norm_vectors_dont_pollute_bin0(spark):
    """Zero-norm vectors must not yield NaN cosines: floor(NaN)→int64
    is undefined (INT64_MIN) and used to clip into bin 0 (round-5
    advice, low). With the 1e-12 norm floor their cosine against
    anything is ~0 → the middle bin, deterministically."""
    df, vecs = _corpus(spark, n=12)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    rows.append((len(vecs), [0.0] * vecs.shape[1]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["bin"]: r["n_pairs"]
        for r in embedding_distance_histogram(df, n_bins=20).collect()
    }
    n = len(rows)
    assert sum(got.values()) == n * (n - 1) // 2  # every pair binned
    norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(vecs), k=1)
    idx = np.clip(np.floor((cos[iu] + 1.0) / 2.0 * 20).astype(int), 0, 19)
    want = {int(b): int(c) for b, c in
            zip(*np.unique(idx, return_counts=True))}
    # the zero vector's 12 pairs all land in the cos=0 bin (bin 10)
    want[10] = want.get(10, 0) + len(vecs)
    assert got == want


def test_histogram_bin_lo_edges(spark):
    df, _ = _corpus(spark, n=10)
    rows = embedding_distance_histogram(df, n_bins=10).collect()
    for r in rows:
        assert r["bin_lo"] == pytest.approx(-1.0 + r["bin"] * 0.2, abs=1e-9)
