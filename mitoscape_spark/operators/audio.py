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
    flips the same borderline band in every window at once)."""
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
            ids, hashes, bands = [], [], [[] for _ in range(AUDIO_BANDS)]
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "audio" or payload is None:
                    continue
                try:
                    samples = decode_wav_pcm(bytes(payload))
                except Exception:
                    continue
                val = _fingerprint64(samples)
                ids.append(media_id)
                hashes.append(val - (1 << 64) if val >= (1 << 63) else val)
                for i in range(AUDIO_BANDS):
                    bands[i].append((val >> (8 * i)) & 0xFF)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                    **{
                        f"band{i}": pd.Series(bands[i], dtype="int32")
                        for i in range(AUDIO_BANDS)
                    },
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, out_schema
    )
