"""Perceptual hash + banded near-dup: recall vs brute force, hash math."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mitoscape_spark.operators.images import (
    _ahash64,
    average_hashes,
    phash_near_duplicates,
)
from mitoscape_spark.sources.multimodal import encode_bmp, encode_ppm


def _image_rows():
    """Fixture corpus: a base image, a 1-block perturbation of it (near
    dup), the same image re-encoded as BMP (exact visual dup across
    formats), and structurally different images."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    near = base.copy()
    near[0:2, 0:2, :] = 255  # flip one 8x8 block's mean
    far = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    rows = [
        (0, "image", encode_ppm(16, 16, base.tobytes())),
        (1, "image", encode_ppm(16, 16, near.tobytes())),
        (2, "image", encode_bmp(16, 16, base.tobytes())),
        (3, "image", encode_ppm(16, 16, far.tobytes())),
        (4, "audio", b"\x00\x01"),  # non-image: must be dropped
        (5, "image", None),  # null payload: dropped
    ]
    return rows


def test_ahash_invariants():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :, :] = 200  # top half bright
    h = _ahash64(img)
    assert h.bit_length() <= 64
    assert bin(h).count("1") == 32  # half the blocks above mean


def test_average_hashes_cross_format_identical(spark):
    df = spark.createDataFrame(
        _image_rows(), "media_id long, modality string, payload binary"
    )
    got = {r.media_id: r.phash for r in average_hashes(df).collect()}
    assert set(got) == {0, 1, 2, 3}  # audio + null dropped
    assert got[0] == got[2]  # PPM and BMP of the same pixels agree


def test_phash_near_duplicates_matches_brute_force(spark):
    df = spark.createDataFrame(
        _image_rows(), "media_id long, modality string, payload binary"
    )
    hashes = average_hashes(df)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_duplicates(hashes, max_hamming=3).collect()
    }
    rows = hashes.collect()
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d = bin((a.phash ^ b.phash) & (2**64 - 1)).count("1")
            lo, hi = sorted((a.media_id, b.media_id))
            if d <= 3:
                brute.add((lo, hi, d))
    assert got == brute
    assert (0, 2, 0) in got  # cross-format exact dup found
    # the 1-block perturbation lands within the banded threshold
    assert any(p[:2] == (0, 1) for p in got)


def test_phash_banding_unsound_threshold_raises(spark):
    df = spark.createDataFrame(
        _image_rows(), "media_id long, modality string, payload binary"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_duplicates(average_hashes(df), max_hamming=4)


def test_phash_query_runs_on_synthetic_corpus(spark, sf_smoke):
    from mitoscape_spark.queries.extensions import ext_image_phash

    out = ext_image_phash(spark, sf_smoke)
    rows = out.collect()
    assert list(out.columns) == ["id_a", "id_b", "hamming"]
    assert all(r.hamming <= 3 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_video_near_dup_finds_planted_reencodes(spark, sf_smoke):
    from pyspark.sql import functions as F

    from mitoscape_spark.operators.images import (
        video_frame_hashes,
        video_near_duplicates,
    )
    from mitoscape_spark.sources.multimodal import synthetic_video_corpus

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(40)
    videos = synthetic_video_corpus(spark, docs, n_frames=8)
    hashes = video_frame_hashes(videos, every_n=1)
    pairs = video_near_duplicates(hashes, min_overlap=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every (4k, 4k+1) planted re-encode pair must surface
    planted = {
        (i, i + 1)
        for i in range(0, 40, 4)
        if i + 1 < 40
    }
    assert planted <= got
    # jaccard bounded and ids ordered
    for r in pairs.collect():
        assert 0.0 < r.jaccard <= 1.0 and r.id_a < r.id_b


def test_video_frame_hashes_sampling(spark, sf_smoke):
    from mitoscape_spark.operators.images import video_frame_hashes
    from mitoscape_spark.sources.multimodal import synthetic_video_corpus

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(4)
    videos = synthetic_video_corpus(spark, docs, n_frames=8)
    h_all = video_frame_hashes(videos, every_n=1)
    h_half = video_frame_hashes(videos, every_n=2)
    assert h_all.count() == 4 * 8
    assert h_half.count() == 4 * 4
    idxs = {r.frame_idx for r in h_half.collect()}
    assert idxs == {0, 2, 4, 6}


def test_multimodal_dedup_capstone_consistency(spark, sf_smoke):
    from mitoscape_spark.queries.extensions import ext_multimodal_dedup

    row = ext_multimodal_dedup(spark, sf_smoke).head()
    assert row.n_docs == 500
    # union graph is at least as connected as any single modality
    assert row.n_union_pairs >= max(
        row.n_text_pairs, row.n_image_pairs, row.n_audio_pairs
    )
    # survivors: at least one per corpus, fewer than total when any
    # pairs exist, and enough to cover every doc not in a pair
    assert 0 < row.n_survivors <= row.n_docs
    if row.n_union_pairs:
        assert row.n_survivors < row.n_docs
