"""Fuzzy matching / record linkage: blocked Levenshtein pairs.

All-pairs edit distance is O(n²·len²) — never viable. The standard
linkage shape: a cheap **blocking key** (here: first token; phonetic or
prefix keys slot in the same way) turns the cross product into
per-block products via an equi-join, then the JVM ``levenshtein``
filters inside the block. At 100 TB the blocks shuffle-partition
evenly and AQE splits oversized (hot) blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(col: Column | str) -> Column:
    return F.split(F.col(col) if isinstance(col, str) else col, " ")[0]


def token_prefix_block(col: Column | str, n_tokens: int = 2) -> Column:
    """Blocking key from the first ``n_tokens`` tokens. Block
    granularity is THE cost/recall dial of blocked linkage: candidate
    pairs scale with Σ block_size², so when a one-token key leaves
    blocks of thousands (measured: 8 blocks × 2.5k rows = 25M pairs at
    20k parts), widening the prefix divides the quadratic term by the
    next token's cardinality. Recall: pairs whose edit falls inside the
    prefix land in different blocks — run a second pass with a shifted
    key (e.g. last-n-tokens) and union when that matters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.slice(F.split(c, " "), 1, n_tokens), " ")


def fuzzy_partitions(n_blocks: int, n_salts: int) -> int:
    """Join parallelism for the salted blocked self-join: one task per
    (block, salt) cell is the natural grain — that is exactly the set
    of independent pair-generation units."""
    return max(n_blocks, 1) * n_salts


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_distance: int = 1,
    max_distance: int = 3,
    block: Column | None = None,
    n_salts: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """(id_a, id_b, dist): pairs within the same block whose edit
    distance lies in [min_distance, max_distance] (min_distance=1
    excludes exact duplicates — exact dedup is a hash groupBy, not an
    edit-distance problem).

    Four scale levers, all semantics-preserving:
    - **text-level kernel** (round 11): edit distance is a function of
      the TEXTS, not the ids, so the DP runs once per distinct
      (block, text) pair and the id pairs are expanded back by two
      equi-joins afterwards. On corpora with repeated values this is
      the difference between O(distinct²) and O(rows²) DP calls
      (measured at sf0.1: 64 distinct part names over 20k rows —
      25.0M banded DPs collapsed to ≤2k, ext_fuzzy_match 4.6 s →
      sub-second kernel + the irreducible 1.5M-row pair emission);
      with unique texts it degenerates to exactly the old shape plus
      one cheap distinct. The expansion is joins, not per-name id
      arrays, so a hot text value is an AQE-splittable hot join key
      rather than an unsplittable giant row (guide §2.5).
    - **salted self-join**: a low-cardinality blocking key caps
      parallelism at #blocks (measured: 8 blocks pinned the whole job
      to 8 tasks, 121 s). The probe side keeps one salt per row, the
      build side replicates across ``n_salts`` — same pair set, blocks
      × n_salts parallel tasks (121 s → ~8 s on 20k parts).
    - **length prune** inside the join condition: |len(a)−len(b)| >
      max ⇒ dist > max, filtered before the DP kernel runs.
    - **banded Levenshtein**: the threshold arg caps the DP band at
      O(len·max) per pair with early exit.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        (block if block is not None else first_token_block(text_col)).alias(
            "blk"
        ),
    )
    # distinct (block, text) values — the DP kernel's true domain.
    # Pinned (§20 doctrine: reduced form consumed ≥2 times — the
    # partition-count probe plus both self-join sides) so the corpus
    # scan + distinct shuffle run once.
    uniq = keyed.select("blk", "txt").distinct().localCheckpoint(eager=False)
    # the probe side must actually be distributed: a dimension-sized
    # input arrives as one scan task, and with a broadcast build side
    # the join inherits that single partition — repartition on the
    # (block, salt) grain so every salt becomes a parallel task
    # explicit partition count: AQE sizes shuffle partitions by BYTES,
    # and the pre-join rows are tiny — it would coalesce them into one
    # partition, unaware each row explodes into thousands of pairs
    # downstream. A user-specified count is exempt from coalescing.
    # The count tracks actual block cardinality (one cheap distinct
    # count; pass n_partitions to skip it), not a hard-coded constant.
    # BOTH join sides get the explicit exchange: with only one side
    # pinned, EnsureRequirements re-shuffles it to match the other
    # side's default shuffle-partition count and the pinned number
    # silently loses. (Even pinned on both sides the planner floors
    # the count at spark.sql.shuffle.partitions — observed
    # max(user, conf) — which only ever ADDS parallelism.)
    if n_partitions is None:
        n_partitions = fuzzy_partitions(
            uniq.select("blk").distinct().count(), n_salts
        )
    a = (
        uniq.withColumn(
            "salt", F.pmod(F.hash("txt"), F.lit(n_salts)).cast("int")
        )
        .repartition(n_partitions, "blk", "salt")
        .alias("a")
    )
    b = (
        uniq.withColumn(
            "salt",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")
            ),
        )
        .repartition(n_partitions, "blk", "salt")
        .alias("b")
    )
    # strict text ordering canonicalizes the unordered text pair (the
    # id-level a.id < b.id canonicalization moves to least/greatest in
    # the expansion below); same-text id pairs have dist 0 and are the
    # min_distance == 0 branch at the end.
    name_pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.txt") < F.col("b.txt"))
            & (
                F.abs(F.length("a.txt") - F.length("b.txt"))
                <= max_distance
            ),
        )
        .select(
            F.col("a.blk").alias("blk"),
            F.col("a.txt").alias("txt_a"),
            F.col("b.txt").alias("txt_b"),
            F.levenshtein("a.txt", "b.txt", max_distance + 1).alias(
                "dist"
            ),
        )
        .where(F.col("dist").between(max(min_distance, 1), max_distance))
    )
    ia = keyed.select(
        "blk", F.col("txt").alias("txt_a"), F.col("id").alias("_ida")
    )
    ib = keyed.select(
        "blk", F.col("txt").alias("txt_b"), F.col("id").alias("_idb")
    )
    out = (
        name_pairs.join(ia, ["blk", "txt_a"])
        .join(ib, ["blk", "txt_b"])
        # a duplicate id carried under both texts must not self-pair
        # (the old id-level join excluded it via a.id < b.id)
        .where(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "dist",
        )
    )
    if min_distance == 0:
        x, y = keyed.alias("x"), keyed.alias("y")
        same = (
            x.join(
                y,
                (F.col("x.blk") == F.col("y.blk"))
                & (F.col("x.txt") == F.col("y.txt"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(
                F.col("x.id").alias("id_a"),
                F.col("y.id").alias("id_b"),
                F.lit(0).alias("dist"),
            )
        )
        out = out.unionAll(same)
    return out
