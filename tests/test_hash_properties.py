"""Property-based tests (hypothesis, pure Python — no Spark in the
loop per the repo's JVM-safety rule) for the perceptual-hash kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mitoscape_spark.operators.audio import _fingerprint64
from mitoscape_spark.operators.images import _ahash64


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(8, 32),
    w=st.integers(8, 32),
    shift=st.integers(1, 60),
)
def test_ahash_invariant_under_uniform_brightness_shift(seed, h, w, shift):
    rng = np.random.RandomState(seed)
    # keep headroom so the shift can't clip (clipping breaks uniformity)
    px = rng.randint(0, 195, size=(h, w, 3)).astype(np.uint8)
    shifted = (px.astype(np.int32) + shift).astype(np.uint8)
    assert _ahash64(px) == _ahash64(shifted)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_ahash_is_64_bits_and_deterministic(seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    a, b = _ahash64(px), _ahash64(px)
    assert a == b and 0 <= a < (1 << 64)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    scale=st.floats(0.01, 100.0),
)
def test_fingerprint_invariant_under_amplitude_scale(seed, scale):
    rng = np.random.RandomState(seed)
    x = rng.randn(2048) * 1000
    assert _fingerprint64(x) == _fingerprint64(x * scale)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(16, 5000))
def test_fingerprint_total_and_bounded(seed, n):
    rng = np.random.RandomState(seed)
    x = rng.randn(n) * 1000
    v = _fingerprint64(x)
    assert 0 <= v < (1 << 64)
    assert v == _fingerprint64(x)  # deterministic
