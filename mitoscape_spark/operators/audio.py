"""Audio fingerprinting + near-duplicate pairs — completes per-modality
dedup (text: dedup.py, image: images.py aHash, video: frame hashes).

Fingerprint: decode WAV at full PCM precision (sources/multimodal.py::
decode_wav_pcm — the uint8 histogram decode would inject a quantization
noise floor), split the clip into ``n_windows`` equal windows, rFFT
power in ``n_bands`` log-spaced bands per window, then derive one bit
per (window, band) cell by Haitsma–Kalker DOUBLE differencing —
bit(w,b) = [ΔE(w,b) − ΔE(w−1,b) > 0] with ΔE the adjacent-band energy
difference (see ``_fingerprint64``). 9×9 energy cells → 8×8 = a 64-bit
fingerprint that is invariant to amplitude scaling (differences of a
scaled spectrum keep their signs) and stable under small additive
noise (a borderline band perturbs one bit, not a bit per window) —
the Shazam-family constellation idea reduced to a fixed-width hash so
the pairing stage can reuse the EXACT machinery image dedup uses:
banded equi-join + ``bit_count`` hamming verify
(operators/images.py::phash_near_duplicates). Audio bits flip more
under noise than image aHash bits, so the hash splits into 8×8-bit
bands — pigeonhole-sound up to hamming 7.

Decode + FFT run once per clip in an Arrow batch (numpy rFFT on the
whole window matrix, no per-sample Python); 12 bytes emerge per clip;
everything after is columnar JVM work. Non-audio / non-decodable rows
drop (profiling counts them upstream).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_BANDS = 8  # 8 × 8-bit bands — hamming <= 7 soundness for the
# noisier differential-bit derivation (image aHash uses 4 × 16)


def _fingerprint64(
    samples: np.ndarray, n_windows: int = 9, n_bands: int = 9
) -> int:
    """64 Haitsma–Kalker differential-energy bits:
    bit(w,b) = [ΔE(w,b) − ΔE(w−1,b) > 0] with ΔE(w,b) = E(w,b) −
    E(w,b+1) — 9 windows × 9 bands → 8×8 bits. Double-differential
    bits are the industry fingerprint derivation precisely because a
    single band sitting at a threshold boundary perturbs ONE bit, not
    a bit per window (an absolute median threshold on stationary audio
    flips the same borderline band in every window at once).

    Deliberately INDEPENDENT of ``_fingerprint64_batch`` (do not
    delegate): this scalar form is the semantic reference that
    ``test_batch_matches_scalar`` compares the vectorized path against
    — delegating would make that bit-identity pin vacuous."""
    x = samples.astype(np.float64)
    if len(x) < n_windows * 2:
        x = np.pad(x, (0, n_windows * 2 - len(x)))
    width = len(x) // n_windows
    wins = x[: width * n_windows].reshape(n_windows, width)
    spec = np.abs(np.fft.rfft(wins, axis=1)) ** 2
    # log-spaced band edges over the positive spectrum (skip DC)
    n_freq = spec.shape[1]
    edges = np.unique(
        np.geomspace(1, max(n_freq - 1, 2), n_bands + 1).astype(int)
    )
    while len(edges) < n_bands + 1:  # tiny windows: pad edge list
        edges = np.append(edges, edges[-1] + 1)
    bands = np.stack(
        [
            spec[:, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=1)
            for b in range(n_bands)
        ],
        axis=1,
    )  # (n_windows, n_bands)
    d_band = bands[:, :-1] - bands[:, 1:]  # (n_windows, n_bands-1)
    bits = (d_band[1:] - d_band[:-1] > 0).ravel()
    val = 0
    for b in bits[:64]:
        val = (val << 1) | int(b)
    return val


def _fingerprint64_batch(
    clips: np.ndarray, n_windows: int = 9, n_bands: int = 9
) -> np.ndarray:
    """Vectorized fingerprints for a (n_clips, n_samples) float64 matrix
    of EQUAL-LENGTH clips — one rFFT over the stacked window matrix
    instead of one small FFT per clip (the per-clip path spent ~1 ms of
    numpy call overhead per 4096-sample clip; the batch path amortizes
    it across the Arrow batch). numpy's pocketfft transforms each row
    independently, band sums reduce per row, and the comparisons are
    elementwise, so the bits are BIT-IDENTICAL to the scalar path
    (pinned by tests/test_audio_fingerprint.py::test_batch_matches_scalar).
    Returns uint64 fingerprints, one per clip."""
    x = clips.astype(np.float64, copy=False)
    n_clips, n_samples = x.shape
    if n_samples < n_windows * 2:
        x = np.pad(x, ((0, 0), (0, n_windows * 2 - n_samples)))
        n_samples = x.shape[1]
    width = n_samples // n_windows
    wins = x[:, : width * n_windows].reshape(n_clips, n_windows, width)
    spec = np.abs(np.fft.rfft(wins, axis=2)) ** 2
    # log-spaced band edges over the positive spectrum (skip DC)
    n_freq = spec.shape[2]
    edges = np.unique(
        np.geomspace(1, max(n_freq - 1, 2), n_bands + 1).astype(int)
    )
    while len(edges) < n_bands + 1:  # tiny windows: pad edge list
        edges = np.append(edges, edges[-1] + 1)
    bands = np.stack(
        [
            spec[:, :, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=2)
            for b in range(n_bands)
        ],
        axis=2,
    )  # (n_clips, n_windows, n_bands)
    d_band = bands[:, :, :-1] - bands[:, :, 1:]
    bits = (d_band[:, 1:, :] - d_band[:, :-1, :] > 0).reshape(n_clips, -1)
    bits64 = bits[:, :64]
    k = bits64.shape[1]
    if k < 64:  # degenerate window/band params — fewer shift steps
        bits64 = np.pad(bits64, ((0, 0), (0, 64 - k)))
    # packbits: first bit -> MSB of byte 0, matching the scalar
    # (val << 1) | bit accumulation; big-endian view reassembles u64.
    # With k < 64 the scalar loop only shifted k times, so the packed
    # value sits k-bits-from-the-top — shift it back down.
    vals = np.packbits(bits64, axis=1).view(">u8").ravel().astype(np.uint64)
    if k < 64:
        vals = vals >> np.uint64(64 - k)
    return vals


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, phash, band0..band7) for decodable WAV rows — the
    same schema ``phash_near_duplicates`` consumes, so audio pairs come
    from the identical banded plan as image pairs."""
    from pyspark.sql import types as T

    from mitoscape_spark.sources.multimodal import decode_wav_pcm

    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False),
         T.StructField("phash", T.LongType(), False)]
        + [
            T.StructField(f"band{i}", T.IntegerType(), False)
            for i in range(AUDIO_BANDS)
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode per clip (wave module is inherently per-payload),
            # then fingerprint per LENGTH GROUP so the FFT + band sums
            # run as one stacked matrix op per distinct clip length —
            # bit-identical to the scalar path, ~5x less numpy call
            # overhead on uniform corpora
            ids: list[int] = []
            clips: list[np.ndarray] = []
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "audio" or payload is None:
                    continue
                try:
                    samples = decode_wav_pcm(bytes(payload))
                except Exception:
                    continue
                ids.append(int(media_id))
                clips.append(samples)
            vals = np.zeros(len(ids), dtype=np.uint64)
            by_len: dict[int, list[int]] = {}
            for i, c in enumerate(clips):
                by_len.setdefault(len(c), []).append(i)
            for idxs in by_len.values():
                stacked = np.stack([clips[i] for i in idxs])
                vals[idxs] = _fingerprint64_batch(stacked)
            signed = vals.view(np.int64)  # wrap uint64 bit pattern
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(signed, dtype="int64"),
                    **{
                        f"band{i}": pd.Series(
                            (vals >> np.uint64(8 * i))
                            & np.uint64(0xFF),
                            dtype="int32",
                        )
                        for i in range(AUDIO_BANDS)
                    },
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, out_schema
    )
