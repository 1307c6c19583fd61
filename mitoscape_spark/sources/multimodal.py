"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed batch-wise via mapInPandas.

The Spark-side plumbing is real: explicit schema (binary + metadata
struct), Arrow-batched UDF signatures, deterministic partition-friendly
feature extraction. The *codec* step is stubbed — image/audio libraries
are not in this container — behind ``decode_media`` which raises
``NotImplementedError`` unless a codec callback is injected. The
default feature extractor is a byte histogram: a real, deterministic
computation with the exact batch shape a decoder would have.

Scale notes: payloads stay columnar (parquet BYTE_ARRAY); metadata
filters (modality/size) push down without touching bytes; feature
extraction streams Arrow batches so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — at 100 TB, tune that
down for large payloads rather than letting whole-row-group pandas
frames materialize.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16  # byte-histogram buckets


def synthetic_media(
    spark: SparkSession, docs: DataFrame, modality: str = "image"
) -> DataFrame:
    """Deterministic fake media derived from the documents table: the
    payload is the md5-seeded byte expansion of the text — stable
    across runs, so downstream feature tests are golden."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        # repeat the md5 hex digest to a pseudo-payload; to_binary makes
        # real bytes (deterministic, no RNG)
        F.to_binary(
            F.repeat(F.md5(F.col("text")), 8), F.lit("hex")
        ).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def decode_media(
    media: DataFrame,
    codec: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """Decode payloads via an injected codec (e.g. PIL/librosa when
    available). Without one, raises — decoding genuinely needs a codec
    library that is not in this container."""
    if codec is None:
        raise NotImplementedError(
            "no media codec available in this environment; inject "
            "codec=callable(payload_bytes, modality) -> np.ndarray, or "
            "use extract_features() whose byte-level path needs no codec"
        )
    return _feature_map(media, codec)


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, modality, features array<double>) — 16-bucket byte
    histogram, L1-normalized. Real Arrow-batched mapInPandas with the
    same shape a decoder-backed extractor would use."""
    return _feature_map(media, None)


def _feature_map(
    media: DataFrame, codec: Callable[[bytes, str], np.ndarray] | None
) -> DataFrame:
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField(
                "features", T.ArrayType(T.DoubleType()), True
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if payload is None:
                    feats.append(None)
                    continue
                arr = (
                    codec(bytes(payload), modality)
                    if codec is not None
                    else np.frombuffer(bytes(payload), dtype=np.uint8)
                )
                hist, _ = np.histogram(
                    arr, bins=FEATURE_DIM, range=(0, 256)
                )
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, out_schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize is decode-dependent → metadata-only update here, payload
    untouched; a codec-backed implementation swaps _feature_map in."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ),
    )


def frame_sample(
    media: DataFrame, every_n: int = 2, max_frames: int | None = None
) -> DataFrame:
    """(media_id, frame_idx, frame) — sample every ``every_n``-th frame.

    Frames are fixed-width byte windows of the payload per
    ``meta.n_frames`` (a codec-backed build decodes real frames; the
    windowing, fan-out schema and Arrow batching are identical either
    way). Fan-out is a generator, not a shuffle — frame rows land in
    the same partition as their source row.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if payload is None:
                    continue
                n_frames = max(int(meta["n_frames"] or 1), 1)
                raw = bytes(payload)
                width = max(len(raw) // n_frames, 1)
                taken = 0
                for k in range(0, n_frames, every_n):
                    if max_frames is not None and taken >= max_frames:
                        break
                    ids.append(media_id)
                    idxs.append(k)
                    frames.append(raw[k * width : (k + 1) * width])
                    taken += 1
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, out_schema)
