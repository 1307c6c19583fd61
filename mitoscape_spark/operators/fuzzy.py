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

from mitoscape_spark.pins import pin


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
    keyed = _keyed(df, id_col, text_col, block)
    name_pairs = _distinct_text_pairs(
        keyed, min_distance, max_distance, n_salts, n_partitions
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
        # salted like the kernel join (round-11 ADVICE item 4): a
        # heavily duplicated text is one hot (blk, txt) join key whose
        # O(dups²) same-text pair emission would otherwise concentrate
        # in a single task. The probe side keeps one deterministic salt
        # per id, the build side replicates across n_salts, so the hot
        # key splits into n_salts parallel tasks and each unordered
        # pair is still emitted exactly once (via the build replica
        # whose salt equals the probe row's).
        x = keyed.withColumn(
            "_salt", F.pmod(F.hash("id"), F.lit(n_salts)).cast("int")
        ).alias("x")
        y = keyed.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")
            ),
        ).alias("y")
        same = (
            x.join(
                y,
                (F.col("x.blk") == F.col("y.blk"))
                & (F.col("x.txt") == F.col("y.txt"))
                & (F.col("x._salt") == F.col("y._salt"))
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


def _keyed(
    df: DataFrame, id_col: str, text_col: str, block: Column | None
) -> DataFrame:
    """(id, txt, blk) projection shared by the fuzzy operators."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        (block if block is not None else first_token_block(text_col)).alias(
            "blk"
        ),
    )


def _distinct_text_pairs(
    keyed: DataFrame,
    min_distance: int,
    max_distance: int,
    n_salts: int,
    n_partitions: int | None,
) -> DataFrame:
    """(blk, txt_a, txt_b, dist): the blocked+salted Levenshtein kernel
    over DISTINCT (block, text) values — the shared core of
    ``fuzzy_pairs`` (which expands ids back afterwards) and
    ``fuzzy_dedup_keep_canonical`` (which clusters at text level and
    never expands). ``txt_a < txt_b`` strictly; dist ∈
    [max(min_distance, 1), max_distance] (the dist-0 same-text branch
    is the caller's concern — texts here are distinct by construction).
    """
    # distinct (block, text) values — the DP kernel's true domain.
    # Pinned (§20 doctrine: reduced form consumed ≥2 times — the
    # partition-count probe plus both self-join sides) so the corpus
    # scan + distinct shuffle run once.
    uniq = keyed.select("blk", "txt").distinct().transform(pin)
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
    return name_pairs


def fuzzy_dedup_keep_canonical(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_distance: int = 1,
    max_distance: int = 3,
    n_salts: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Entity-resolution fusion of ``fuzzy_pairs`` →
    ``dedup.dedup_keep_canonical``: drop every row whose id is a
    non-minimal member of a fuzzy-linkage cluster, WITHOUT ever
    materializing the id-level pair set.

    Why (round 11, guide §8 — decide with small rows): the id-level
    edge set is the bipartite expansion of the text-level edge set —
    on corpora with repeated values that expansion is O(rows²) per
    linked text pair (measured at sf0.1: 64 distinct names over 20k
    parts → 1.5M id pairs, all of which the generic path distincts,
    collects, and union-finds on the driver). Connectivity, though, is
    decidable entirely at text level:

    - Every id-level edge (i, j) comes from a text edge (tᵃ, tᵇ) with
      i ∈ ids(tᵃ), j ∈ ids(tᵇ) (``min_distance ≥ 1`` — no same-text
      edges), so ids attached to one connected text component form one
      id component (every text carries ≥ 1 id, so adjacent texts'
      id sets chain transitively).
    - The ONLY other id-level connectivity is an id carried under two
      edge-bearing texts, which merges their text components; adding a
      per-id text-chain bridge to the text graph reproduces it.
    - Texts with no fuzzy edge contribute no id pairs at all — their
      ids never appear in any component and survive untouched, exactly
      the generic path's anti-join behaviour.

    So: components over (text edges ∪ same-id bridges), labels joined
    back to ids, keep min(id) per component — provably the same
    survivor set (pinned by
    ``test_fuzzy_dedup_canonical_matches_generic_path``), with the CC
    running on ≤ distinct-text-sized input.

    Node identity is the text itself, which requires the block key to
    be a function of the text — true of the built-in first-token
    block; callers needing an out-of-band block column (or
    ``min_distance=0`` semantics, whose same-text edges make every
    duplicated text a cluster) should use the generic
    ``fuzzy_pairs`` → ``dedup_keep_canonical`` composition.
    """
    if min_distance < 1:
        raise ValueError(
            "fuzzy_dedup_keep_canonical requires min_distance >= 1 "
            "(min_distance=0 links same-text ids: use fuzzy_pairs + "
            "dedup_keep_canonical)"
        )
    from pyspark.sql import Window

    from mitoscape_spark.operators.dedup import connected_components

    keyed = _keyed(docs, id_col, text_col, None)
    tp = _distinct_text_pairs(
        keyed, min_distance, max_distance, n_salts, n_partitions
    )
    # §20 pin: the kernel lineage feeds the node-set derivation AND the
    # CC input — reduced (pair-level) form, never row-level
    tedges = (
        tp.select(F.col("txt_a").alias("u"), F.col("txt_b").alias("v"))
        .transform(pin)
    )
    tnodes = (
        tedges.select(F.col("u").alias("txt"))
        .unionAll(tedges.select(F.col("v").alias("txt")))
        .distinct()
    )
    # ids attached to edge-bearing texts; distinct (id, txt) — consumed
    # by the bridge derivation and the label join (§20 pin)
    in_t = (
        keyed.join(tnodes, "txt", "left_semi")
        .select("id", "txt")
        .distinct()
        .transform(pin)
    )
    # an id under several edge-bearing texts merges their components:
    # chain each id's texts (consecutive pairs ≡ full clique for
    # connectivity, linear not quadratic in texts-per-id)
    w_id = Window.partitionBy("id").orderBy("txt")
    bridges = (
        in_t.withColumn("_prev", F.lag("txt").over(w_id))
        .where(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("u"), F.col("txt").alias("v"))
    )
    comp = connected_components(
        tedges.unionAll(bridges), id_a="u", id_b="v"
    ).select(F.col("id").alias("_t"), "component")
    lab = in_t.join(comp, in_t["txt"] == comp["_t"]).select(
        "id", "component"
    )
    # min id per component via one window (a groupBy+join would shuffle
    # lab twice); bridges guarantee one component per id, so the
    # min-window sees every id exactly once per (id, txt) attachment
    w_c = Window.partitionBy("component")
    losers = (
        lab.withColumn("_keep", F.min("id").over(w_c))
        .where(F.col("id") != F.col("_keep"))
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return docs.join(losers, on=id_col, how="left_anti")
