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

from mitoscape_spark.pins import pin

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
    hashes: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """(id_a, id_b, hamming) pairs at hamming distance <= ``max_hamming``.

    Sound for ``max_hamming < n_bands``: <= max_hamming differing bits
    across n_bands bands leaves one band untouched, so the banded
    equi-join sees the pair (same pigeonhole as MinHash banding, but
    exact). Larger thresholds raise — silently missing pairs is the one
    failure a dedup filter must not have. ``n_bands`` defaults to the
    band columns present in ``hashes`` (image aHash emits 4×16-bit;
    audio fingerprints emit 8×8-bit for their noisier bit derivation)."""
    if n_bands is None:
        n_bands = len([c for c in hashes.columns if c.startswith("band")])
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded pigeonhole is only sound for max_hamming < {n_bands}"
        )
    # multi-consumer input pin (PERF.md §20): the banded self-join below
    # references ``hashes`` twice, and ReuseExchange does NOT kick in
    # when the planner broadcasts one side — the caller's upstream
    # lineage (typically a Python decode/FFT mapInPandas over raw
    # payloads) would execute once per side. ``hashes`` is the REDUCED
    # form the doctrine requires — one short numeric row per media item,
    # KB/MB-scale where payloads are GB-scale — so pin it at entry:
    # measured at sf0.1, the audio pair join dropped 6.9 s → 0.7 s
    # with the fingerprint derivation running once.
    hashes = hashes.transform(pin)
    banded = hashes.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(*[F.col(f"band{i}") for i in range(n_bands)])
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


def video_frame_hashes(
    media: DataFrame, every_n: int = 2, max_frames: int | None = None
) -> DataFrame:
    """(media_id, frame_idx, phash): perceptual hash of sampled frames.

    Composes the multimodal plumbing end-to-end: ``frame_sample``
    (sources/multimodal.py) windows the payload into per-frame bytes in
    place — no shuffle, frames stay with their source partition — and
    each sampled frame decodes (PPM/BMP) + aHashes in the same Arrow
    batch. Non-decodable frames drop silently (profiling counts them
    upstream); cost is one scan ∝ sampled frames.
    """
    from mitoscape_spark.sources.multimodal import (
        decode_bmp,
        decode_ppm,
        frame_sample,
    )

    frames = frame_sample(media, every_n=every_n, max_frames=max_frames)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for media_id, frame_idx, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame"]
            ):
                if frame is None:
                    continue
                raw = bytes(frame)
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
                idxs.append(frame_idx)
                hashes.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return frames.mapInPandas(
        run, "media_id long, frame_idx int, phash long"
    )


def video_near_duplicates(
    frame_hashes: DataFrame, min_overlap: float = 0.5
) -> DataFrame:
    """(id_a, id_b, shared, jaccard): video pairs whose sampled-frame
    hash SETS overlap at least ``min_overlap`` (Jaccard) — re-encodes,
    container changes, and brightness tweaks keep most frame hashes
    intact, so shared-hash counting finds them without comparing pixel
    data across videos.

    Scale shape = the inverted-index dedup family: candidates come from
    an equi-join on phash (only videos SHARING a frame hash ever meet;
    a hot hash — e.g. an all-black frame — is the skew case: drop
    hashes whose posting list exceeds a cap before joining, exactly the
    stop-gram treatment text dedup uses), then one grouped count +
    broadcast of per-video set sizes.
    """
    # §20 pin: sigs feeds the size agg AND both self-join sides — the
    # caller's frame-hash lineage is the Python video-decode path, which
    # must run once, not three times
    sigs = (
        frame_hashes.select("media_id", "phash")
        .distinct()
        .transform(pin)
    )
    # (round-11 A/B: pinning sizes LOST 1.82→2.12 s — it is a cheap
    # agg over the ALREADY pinned sigs checkpoint; the extra
    # materialization job outweighs the saved re-agg at every scale
    # because the input is already local. Left unpinned on evidence.)
    sizes = sigs.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sigs.alias("a"), sigs.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.phash") == F.col("b.phash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(
        F.col("media_id").alias("id_a"), F.col("n").alias("_na")
    )
    nb = sizes.select(
        F.col("media_id").alias("id_b"), F.col("n").alias("_nb")
    )
    # no broadcast hint: the size table is |videos| rows — corpus-sized
    # at scale; AQE converts to broadcast when it actually fits
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("_na") + F.col("_nb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_overlap)
    )
