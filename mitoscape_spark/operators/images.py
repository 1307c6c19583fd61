"""Perceptual image hashing + hamming-banded near-duplicate pairs.

Ties the multimodal column family (sources/multimodal.py: binary
payloads + stdlib PPM/BMP decoders) into the dedup family
(operators/dedup.py): aHash — grayscale, 8×8 block means, threshold at
the image mean — gives a 64-bit fingerprint whose hamming distance
tracks visual similarity; near-identical crops/re-encodes land within a
few bits.

Scale shape mirrors SimHash dedup (operators/dedup.py::simhash): the
64-bit hash splits into 4×16-bit bands; by pigeonhole, any pair at
hamming <= 3 agrees EXACTLY on at least one band, so candidates come
from 4 equi-joins on (band_idx, band_val) — never an all-pairs compare —
and the verifier is one JVM-side ``bit_count(xor)`` on the candidates.
Decode runs once per image in an Arrow-batched ``mapInPandas``
(vectorized numpy block means, no per-pixel Python), emitting 12 bytes
per image; everything after the hash is columnar JVM work.

No reference counterpart (alignment engine); this is the
training-corpus image-dedup primitive (re-encoded/resized duplicates).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BANDS = 4  # 4 × 16-bit bands over the 64-bit hash


def _ahash64(px: np.ndarray) -> int:
    """64-bit average hash of an (h, w, 3) uint8 image: grayscale →
    8×8 block means → bit per block above the global mean."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # every source pixel contributes to exactly one of the 8×8 buckets
    # (block mean, robust to any h/w — no resize kernel needed)
    ys = np.arange(h) * 8 // h
    xs = np.arange(w) * 8 // w
    sums = np.zeros((8, 8))
    counts = np.zeros((8, 8))
    np.add.at(sums, (ys[:, None], xs[None, :]), gray)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
    blocks = sums / np.maximum(counts, 1.0)
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:  # 64 iterations on an 8×8 summary, not per-pixel
        val = (val << 1) | int(b)
    return val


def average_hashes(media: DataFrame) -> DataFrame:
    """(media_id, phash, band0..band3) for stdlib-decodable image rows
    (PPM/BMP); non-image / non-decodable rows are dropped (they have no
    visual hash — upstream profiling counts them)."""
    from mitoscape_spark.sources.multimodal import decode_bmp, decode_ppm

    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False),
         T.StructField("phash", T.LongType(), False)]
        + [
            T.StructField(f"band{i}", T.IntegerType(), False)
            for i in range(N_BANDS)
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, bands = [], [], [[] for _ in range(N_BANDS)]
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "image" or payload is None:
                    continue
                raw = bytes(payload)
                try:
                    if raw[:2] == b"P6":
                        px = decode_ppm(raw)
                    elif raw[:2] == b"BM":
                        px = decode_bmp(raw)
                    else:
                        continue
                except ValueError:
                    continue
                val = _ahash64(px)
                ids.append(media_id)
                # Spark LongType is signed: wrap the uint64 bit pattern
                hashes.append(val - (1 << 64) if val >= (1 << 63) else val)
                for i in range(N_BANDS):
                    bands[i].append((val >> (16 * i)) & 0xFFFF)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                    **{
                        f"band{i}": pd.Series(bands[i], dtype="int32")
                        for i in range(N_BANDS)
                    },
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, out_schema
    )


def phash_near_duplicates(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs at hamming distance <= ``max_hamming``.

    Sound for ``max_hamming <= 3``: 4 bands, <= 3 differing bits, so one
    band is untouched and the banded equi-join sees the pair (same
    pigeonhole as MinHash banding, but exact). Larger thresholds raise —
    silently missing pairs is the one failure a dedup filter must not
    have."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"banded pigeonhole is only sound for max_hamming < {N_BANDS}"
        )
    banded = hashes.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(*[F.col(f"band{i}") for i in range(N_BANDS)])
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several bands
    )
    return pairs
