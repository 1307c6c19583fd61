"""Deduplication operators over document corpora.

Five families, all expressed as Catalyst plans (no Python in any hot
path):

* exact            — hash groupBy / dropDuplicates
* MinHash + LSH    — shingle → k seeded MinHashes → banded bucket join
* SimHash          — per-token hash bits → majority vote → integer hash
* n-gram Jaccard   — inverted-index shingle join → exact set overlap
* embedding cosine — near-duplicate pairs above a cosine threshold

Portability note: hashes are built on ``md5`` (identical hex output in
Spark and DuckDB), so every operator here is oracle-checkable
cross-engine. Taking the *lexicographic* min of md5 hex strings is a
valid MinHash (uniform hash ⇒ uniform order statistics); seeds are
prefixed into the hashed string.

Scale: shingle explosion is a flatMap (no shuffle); signatures are one
hash-agg per (doc, seed); the LSH band join buckets candidates so the
pair space is bands × bucket², never O(n²); the only O(n²)-risk
operator is embedding_near_duplicates' block-nested join, which is why
its blocked (LSH) variant lives in operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.functions.vectors import cosine_similarity

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2
DEFAULT_SHINGLE = 3


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact deduplication — distributed hash aggregation on the key
    columns (Catalyst plans partial+final HashAggregate, so the shuffle
    carries unique keys only)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + toks array<string>: lowercase, whitespace split."""
    return docs.select(
        "doc_id", F.split(F.lower(F.col(text_col)), " ").alias("toks")
    )


def shingles(docs: DataFrame, n: int = DEFAULT_SHINGLE) -> DataFrame:
    """doc_id + exploded n-token shingles (distinct per doc).

    Built with JVM higher-order functions: transform over an index
    sequence — a generate + project, no shuffle.
    """
    idx_expr = " ".join(
        f"toks[i+{j}]," for j in range(n)
    ).rstrip(",")
    return (
        tokenize(docs)
        .where(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(0, size(toks)-{n}),"
                        f" i -> concat_ws(' ', {idx_expr}))"
                    )
                )
            ).alias("shingle"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_size: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(doc_id, seed, minhash): k independent MinHashes per document.

    One shingle explosion feeds all k hashes (seed cross join before
    the hash-agg); the aggregation is a single shuffle keyed on
    (doc_id, seed).
    """
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(num_hashes)])
    ).alias("seed")
    return (
        shingles(docs, shingle_size)
        .select("doc_id", "shingle", seeds)
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(
                    F.concat_ws("|", F.col("seed").cast("string"), "shingle")
                )
            ).alias("minhash")
        )
    )


def minhash_candidate_pairs(
    signatures: DataFrame, band_size: int = DEFAULT_BAND_SIZE
) -> DataFrame:
    """LSH banding: docs agreeing on ALL hashes within any band are
    candidate duplicate pairs (doc_a < doc_b, distinct).

    The band signature join is an equi-join on (band, band_key) — hash
    partitioned, no cross product; at 100 TB the band tables bucket
    evenly because md5 keys are uniform.
    """
    bands = (
        # integer DIV: DuckDB's CAST(x/2 AS INT) rounds while Spark's
        # cast truncates — both sides use explicit integer division
        signatures.withColumn("band", F.expr(f"seed DIV {band_size}"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seed", "minhash"))
                    ),
                    lambda s: s.minhash,
                ),
                ",",
            ).alias("band_key")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    shingle_size: int = DEFAULT_SHINGLE,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every doc pair sharing ≥1
    shingle (inverted-index join — pairs that share nothing are never
    materialized, which is what makes this feasible at scale).

    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold, rounded
    to 6 dp for cross-engine determinism.
    """
    sh = shingles(docs, shingle_size)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


_HEX = "0123456789abcdef"


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): majority-vote fingerprint of token md5 bits.

    bits ≤ 16 (reads the first 4 hex chars of each token's md5).
    Pure integer arithmetic — portable bit extraction via
    floor(v / 2^k) % 2 so the DuckDB oracle computes bit-identically.
    """
    assert bits <= 16
    toks = tokenize(docs).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    bit_ids = F.explode(
        F.array(*[F.lit(i) for i in range(bits)])
    ).alias("b")
    per_bit = (
        toks.withColumn(
            "hval",
            F.expr(
                f"instr('{_HEX}', substring(md5(tok), 1, 1)) - 1"
            )
            * 4096
            + F.expr(f"instr('{_HEX}', substring(md5(tok), 2, 1)) - 1")
            * 256
            + F.expr(f"instr('{_HEX}', substring(md5(tok), 3, 1)) - 1")
            * 16
            + F.expr(f"instr('{_HEX}', substring(md5(tok), 4, 1)) - 1"),
        )
        .select("doc_id", "hval", bit_ids)
        .withColumn(
            "contrib",
            (
                F.expr("CAST(FLOOR(hval / POW(2, b)) AS INT) % 2") * 2 - 1
            ),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("contrib").alias("vote"))
    )
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("vote") > 0, F.expr("CAST(POW(2, b) AS BIGINT)")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) for pairs with cosine ≥ threshold.

    Brute-force all-pairs — correct baseline, O(n²) join; use
    operators.similarity LSH bucketing for the 100 TB path. Embeddings
    are cast to double so the sequential dot product matches the
    oracle bit-for-bit before rounding.
    """
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_similarity("a.v", "b.v"), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """(id, component): connected components over candidate-pair edges —
    the step that turns near-dup PAIRS into dedup GROUPS. Min-label
    propagation: every node repeatedly adopts the smallest id reachable
    over one hop until a fixpoint (checked with a distributed count, no
    driver-side collect of the edge set).

    Scale: each iteration is one self-equi-join + min-agg (shuffle on
    node id); iterations grow with component *diameter*, not graph
    size — near-dup clusters are shallow (stars/cliques), so 2-3
    iterations in practice. For adversarial long chains, switch to the
    large-star/small-star variant (same join primitive).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # undirected: both directions + self-loops seed each node's label
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        ).cache()
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .where(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels.unpersist() if hasattr(labels, "unpersist") else None
        labels = updated
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop near-duplicates: for every connected component of candidate
    pairs keep only the smallest id (the canonical doc); docs in no
    pair survive untouched. Anti-join keeps the corpus side streaming —
    only the (small) duplicate-id set shuffles."""
    components = connected_components(pairs)
    losers = components.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")
