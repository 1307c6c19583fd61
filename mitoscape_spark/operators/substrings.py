"""Repeated-substring (span) deduplication — remove token spans that
recur across documents.

The LLM-corpus counterpart of ExactSubstr dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): boilerplate
headers, license blocks, and navigation chrome repeat VERBATIM across
documents even when whole-document near-dedup keeps every page. The
suffix-array formulation is inherently single-machine; this re-expresses
the semantics at n-gram granularity as pure relational algebra so the
whole pipeline is shuffle-partitioned joins + aggregations that scale
horizontally:

1. one row per n-gram OCCURRENCE (doc, start-position, gram key) —
   linear in corpus tokens, the same explode the inverted-index dedups
   use;
2. global document-frequency per gram key (two-phase hash agg); grams
   in >= ``min_docs`` documents are "common";
3. occurrences of common grams expand to their covered token
   positions (distinct (doc, position));
4. an anti-join drops covered positions from the token stream and the
   surviving tokens are re-assembled in order.

Every join keys on a hash-partitionable column (gram string, then
(doc, position)); nothing is collected, nothing is quadratic — corpus
cost is O(total tokens) rows through two shuffles. A 100 TB run would
additionally hash the gram key to a fixed-width long (xxhash64) to
shrink the exchanged payload; kept as the raw string here so the DuckDB
oracle can reproduce keys byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_occurrences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """(id, start, gram): every n-token span, 1-based start position.

    Guard: Spark's ``sequence(1, k)`` DESCENDS when k < 1, so short
    documents must map to an empty start list, not [1, 0].
    """
    from mitoscape_spark.plans import ensure_min_parallelism

    toks = F.split(F.lower(F.col(text_col)), " ")
    starts = F.when(
        F.size("t") >= n, F.sequence(F.lit(1), F.size("t") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    # the span explode is the map-heavy stage; single-row-group inputs
    # plan it as ONE task (PERF.md §23) — spread rows first (no-op on
    # real layouts)
    return ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), toks.alias("t"))
    ).select(
        "id", "t", F.explode(starts).alias("i")
    ).select(
        "id", "i", F.array_join(F.slice("t", F.col("i"), n), " ").alias("g")
    )


def common_span_removal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """(id, clean_text, n_removed): documents with every token span
    that appears in >= ``min_docs`` distinct documents removed.

    ``clean_text`` is the ordered join of surviving tokens ('' when the
    whole document was boilerplate); ``n_removed`` counts dropped
    tokens. Overlapping common spans union their positions (step 3's
    distinct), so removal is maximal, not greedy.
    """
    grams = gram_occurrences(docs, id_col, text_col, n)

    # global doc-frequency per gram — partial aggregation happens
    # map-side; only (gram, partial-count) rows shuffle
    common = (
        grams.groupBy("g")
        .agg(F.countDistinct("id").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("g")
    )

    covered = (
        grams.join(common, "g")
        .select(
            "id", F.explode(F.sequence("i", F.col("i") + (n - 1))).alias("tokpos")
        )
        .distinct()
    )

    toks = F.split(F.lower(F.col(text_col)), " ")
    alltoks = docs.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos0", "tok")
    ).select("id", (F.col("pos0") + 1).alias("tokpos"), "tok")

    kept = alltoks.join(covered, ["id", "tokpos"], "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tokpos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )

    totals = docs.select(
        F.col(id_col).alias("id"), F.size(toks).cast("long").alias("n_total")
    )
    return totals.join(reassembled, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )
