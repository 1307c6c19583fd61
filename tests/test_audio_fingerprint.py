"""Audio spectral fingerprints: invariances + banded pairing."""

from __future__ import annotations

import numpy as np

from mitoscape_spark.operators.audio import _fingerprint64, audio_fingerprints
from mitoscape_spark.operators.images import phash_near_duplicates
from mitoscape_spark.sources.multimodal import encode_wav


def _tone(freqs, n=4096, amp=8000, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = sum(np.sin(2 * np.pi * f * t / n) for f in freqs)
    x = amp * x / max(len(freqs), 1)
    if noise:
        x = x + rng.randn(n) * noise * amp
    return np.clip(x, -32768, 32767).astype("<i2")


def test_fingerprint_amplitude_invariant():
    a = _fingerprint64(_tone([50, 300], amp=8000).astype(np.float64))
    b = _fingerprint64(_tone([50, 300], amp=800).astype(np.float64))
    assert a == b  # median threshold is relative per window


def test_batch_matches_scalar():
    """The vectorized (stacked-FFT) fingerprint path must be
    BIT-identical to the per-clip scalar path — the round-8 batching is
    a pure call-overhead optimization, never a semantic change."""
    from mitoscape_spark.operators.audio import _fingerprint64_batch

    clips = [
        _tone([50, 300]).astype(np.float64),
        _tone([50, 300], amp=800).astype(np.float64),
        _tone([17, 900], noise=0.01, seed=3).astype(np.float64),
        _tone([220, 440], amp=5600).astype(np.float64),
        np.zeros(4096),  # silence: all-equal energies, bits all False
        _tone([90], n=64).astype(np.float64),  # shorter length group
    ]
    for c in clips:
        scalar = _fingerprint64(c)
        batch = int(_fingerprint64_batch(c[None, :])[0])
        assert scalar == batch
    # stacked evaluation of the equal-length subset agrees element-wise
    eq = [c for c in clips if len(c) == 4096]
    vals = _fingerprint64_batch(np.stack(eq))
    assert [int(v) for v in vals] == [_fingerprint64(c) for c in eq]
    # degenerate short clip (pads, k < 64 shift-parity branch)
    tiny = np.arange(7, dtype=np.float64)
    assert _fingerprint64(tiny) == int(_fingerprint64_batch(tiny[None, :])[0])


def test_fingerprint_noise_robust_and_content_sensitive():
    base = _fingerprint64(_tone([50, 300]).astype(np.float64))
    noisy = _fingerprint64(
        _tone([50, 300], noise=0.01, seed=3).astype(np.float64)
    )
    other = _fingerprint64(_tone([17, 900]).astype(np.float64))
    assert bin(base ^ noisy).count("1") <= 7
    assert bin(base ^ other).count("1") > 7


def test_audio_near_dup_pairs_via_banded_join(spark):
    rows = [
        (0, "audio", encode_wav(_tone([50, 300]))),
        (1, "audio", encode_wav(_tone([50, 300], amp=4000, noise=0.01, seed=5))),
        (2, "audio", encode_wav(_tone([17, 900]))),
        (3, "image", b"\x00"),  # non-audio dropped
        (4, "audio", None),  # null payload dropped
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary"
    )
    prints = audio_fingerprints(media)
    got_ids = {r.media_id for r in prints.collect()}
    assert got_ids == {0, 1, 2}
    pairs = {
        (r.id_a, r.id_b)
        for r in phash_near_duplicates(prints, max_hamming=7).collect()
    }
    assert (0, 1) in pairs  # re-encoded/rescaled clip found
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_audio_corpus_planted_pairs_found(spark, sf_smoke):
    from pyspark.sql import functions as F

    from mitoscape_spark.operators.audio import audio_fingerprints
    from mitoscape_spark.operators.images import phash_near_duplicates
    from mitoscape_spark.sources.multimodal import synthetic_audio_corpus

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(40)
    media = synthetic_audio_corpus(spark, docs)
    pairs = phash_near_duplicates(audio_fingerprints(media), max_hamming=7)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1) for i in range(0, 40, 4)}
    assert planted <= got
