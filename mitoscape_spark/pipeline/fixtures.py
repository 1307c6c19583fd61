"""Deterministic domain fixtures (FIXTURES.md §B, seed=42).

Synthetic stand-ins for the reference's BAM/CSV inputs, generated as
pandas frames and lifted to Spark via Arrow. Everything is seeded so
golden tests are stable across runs and machines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
BASES = np.array(list("ACGT"))
CHROMS = [str(i) for i in range(1, 23)] + ["X"]


def _mask_seq(rng: np.random.Generator, length: int, subs: list[int]) -> tuple[str, str]:
    """Build a calmd-masked seq and its MD tag with subs at given 0-based positions."""
    seq = ["="] * length
    md_parts: list[str] = []
    prev = 0
    for pos in sorted(subs):
        base = str(rng.choice(BASES))
        ref_base = str(rng.choice(BASES))
        seq[pos] = base
        md_parts.append(str(pos - prev))
        md_parts.append(ref_base)
        prev = pos + 1
    md_parts.append(str(length - prev))
    return "".join(seq), "".join(md_parts)


def mt_alignments_pdf(n_reads: int = 300, seed: int = SEED) -> pd.DataFrame:
    """Mitochondrial alignments, MD-tagged (analog of <prefix>_MT_MD.bam).

    Each read appears 2× (mate pairs); ~5% appear once to exercise the
    inner-join drop (FIXTURES.md B.1).
    """
    rng = np.random.default_rng(seed)
    rows = []
    for r in range(n_reads):
        name = f"read_{r:05d}"
        mates = 1 if rng.random() < 0.05 else 2
        for _ in range(mates):
            length = 100
            start = int(rng.integers(1, 16400))
            n_subs = int(rng.integers(0, 4))
            subs = sorted(rng.choice(length, size=n_subs, replace=False).tolist())
            seq, md = _mask_seq(rng, length, subs)
            nm, nh, xq = int(n_subs), int(rng.integers(1, 4)), int(rng.integers(0, 101))
            rows.append(
                {
                    "read_name": name,
                    "chrom": "chrM",
                    "start": start,
                    "mapq": int(rng.integers(0, 61)),
                    "attributes": f"NM:i:{nm} NH:i:{nh} XQ:i:{xq}",
                    "seq": seq,
                    "md": md,
                    "primary_alignment": bool(rng.random() > 0.05),
                    "read_paired": bool(rng.random() > 0.03),
                    "proper_pair": bool(rng.random() > 0.03),
                    "mate_mapped": bool(rng.random() > 0.03),
                    "supplementary": bool(rng.random() < 0.03),
                }
            )
    return pd.DataFrame(rows)


def nt_alignments_pdf(n_reads: int = 300, seed: int = SEED) -> pd.DataFrame:
    """Nuclear alignments (analog of <prefix>_NT.bam); read names overlap
    ~80% with mt_alignments (FIXTURES.md B.2)."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    for r in range(n_reads):
        # 80% shared names, 20% nuclear-only
        name = (
            f"read_{r:05d}" if rng.random() < 0.8 else f"ntonly_{r:05d}"
        )
        for _ in range(2):
            nm, nh, xq = int(rng.integers(0, 5)), int(rng.integers(1, 4)), int(rng.integers(0, 101))
            rows.append(
                {
                    "read_name": name,
                    "chrom": str(rng.choice(CHROMS)),
                    "start": int(rng.integers(1, 2_000_000)),
                    "mapq": int(rng.integers(0, 61)),
                    "attributes": f"NM:i:{nm} NH:i:{nh} XQ:i:{xq}",
                    "primary_alignment": bool(rng.random() > 0.05),
                    "read_paired": bool(rng.random() > 0.03),
                    "proper_pair": bool(rng.random() > 0.03),
                    "mate_mapped": bool(rng.random() > 0.03),
                    "supplementary": bool(rng.random() < 0.03),
                }
            )
    return pd.DataFrame(rows)


def ld_scores_pdf(n: int = 5000, seed: int = SEED) -> pd.DataFrame:
    """LD table (analog of mitomap.ld): variant pairs + correlation r.

    Includes r values that scale-truncate to 0 (dropped, LD.scala:49)
    and swapped-order duplicates (symmetric lookup, LD.scala:59-67).
    """
    rng = np.random.default_rng(seed + 2)
    pos = rng.integers(1, 16570, size=(n, 2))
    alts = rng.choice(BASES, size=(n, 2))
    r = np.where(
        rng.random(n) < 0.1,
        rng.uniform(-4e-6, 4e-6, n),  # |r*1e5| < 1 → truncates to 0
        rng.uniform(-0.5, 0.9, n),
    )
    pdf = pd.DataFrame(
        {
            "variant1": [f"{p}{a}" for p, a in zip(pos[:, 0], alts[:, 0])],
            "variant2": [f"{p}{a}" for p, a in zip(pos[:, 1], alts[:, 1])],
            "r": r,
        }
    )
    # swapped-order duplicates for ~2% of rows
    dup = pdf.sample(frac=0.02, random_state=seed).rename(
        columns={"variant1": "variant2", "variant2": "variant1"}
    )
    return pd.concat([pdf, dup], ignore_index=True)


def numts_pdf(n: int = 25, seed: int = SEED) -> pd.DataFrame:
    """NUMT interval table (analog of NUMTs_hg38.txt, ~25 rows)."""
    rng = np.random.default_rng(seed + 3)
    start = rng.integers(1, 1_900_000, size=n)
    return pd.DataFrame(
        {
            "chrom": rng.choice(CHROMS, size=n),
            "start": start,
            "end": start + rng.integers(500, 200_000, size=n),
            "score": rng.uniform(0.1, 1.0, size=n).astype(np.float32),
        }
    )


def labeled_features_pdf(n: int = 2000, seed: int = SEED) -> pd.DataFrame:
    """Separable-ish labeled feature table for ML threshold tests
    (FIXTURES.md B.5): label 0.0 = MT, 1.0 = rho0."""
    rng = np.random.default_rng(seed + 4)
    label = rng.integers(0, 2, size=n).astype(float)
    noise = lambda s: rng.normal(0, s, n)  # noqa: E731
    return pd.DataFrame(
        {
            "Read": [f"lread_{i:05d}" for i in range(n)],
            "MTMapQ": 50 - 15 * label + noise(5),
            "MTNumAlignments": (2 + 2 * label + noise(0.5)).round().astype(int).clip(1),
            "MTEditDist": (1 + 3 * label + noise(0.7)).round().astype(int).clip(0),
            "LD": (40000 * (1 - label) + noise(8000)).round().astype(int),
            "NTMapQ": 30 + 20 * label + noise(5),
            "NTNumAlignments": (3 - 1 * label + noise(0.5)).round().astype(int).clip(1),
            "NTEditDist": (3 - 2 * label + noise(0.7)).round().astype(int).clip(0),
            "NTScore": (30 + 40 * label + noise(10)).round().astype(int),
            "label": label,
        }
    )


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf)


def to_spark_canonical(
    spark: SparkSession, pdf: pd.DataFrame, key: str, partitions: int = 4
) -> DataFrame:
    """Lift with a configuration-independent partition layout.

    Seeded MLlib tree training samples per partition, so the fitted
    model depends on partitioning, not just the seed. Hash-repartition
    on a key + sort within partitions pins layout regardless of the
    session's core count — golden classify outputs stay stable across
    local[8] and local[32].
    """
    return (
        to_spark(spark, pdf).repartition(partitions, key).sortWithinPartitions(key)
    )
