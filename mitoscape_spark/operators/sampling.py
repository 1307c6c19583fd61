"""Deterministic sampling and data-mixing operators.

Training-data pipelines need *reproducible* subsampling: the same
document must make the same keep/drop decision on every run, on every
cluster size, in every engine. ``DataFrame.sample`` cannot promise that
(its output depends on partition layout), so these operators hash a key
column instead: md5 produces identical lowercase hex in every engine,
and comparing a fixed-width hex prefix against a threshold string is
equivalent to comparing the number it encodes (lexicographic order on
fixed-width lowercase hex == numeric order).

``fraction`` maps to a 4-hex-digit threshold ``floor(fraction * 16^4)``
— a resolution of 1/65536, plenty for mixing weights. ``fraction >= 1``
uses the sentinel threshold ``"g"`` which every hex prefix sorts below.

Scale shape: a narrow ``filter`` on a hash of one column — no shuffle,
no state, evaluated inside the scan stage; at 100 TB it costs one md5
per row and prunes immediately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_LEN = 4  # 16^4 = 65536 buckets


def hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 4-hex-digit threshold string ('g' = keep all)."""
    if fraction >= 1.0:
        return "g"  # sorts above every hex digit => keeps everything
    if fraction <= 0.0:
        return "0000"  # nothing sorts strictly below "0000"
    return format(int(fraction * 65536), "04x")


def _hash_prefix(key_col: str, salt: str) -> Column:
    # NULL keys hash as a fixed sentinel instead of propagating NULL
    # (md5(NULL)=NULL would make every keep/drop predicate NULL and
    # silently drop the rows at ANY fraction — even 1.0)
    key = F.coalesce(
        F.col(key_col).cast("string"), F.lit("__null_key__")
    )
    if salt:
        key = F.concat(F.lit(salt), key)
    return F.substring(F.md5(key), 1, _PREFIX_LEN)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided purely by ``md5(salt || key)``.

    Distinct ``salt`` values give INDEPENDENT samples — two salted
    samples overlap ~f1·f2 of the corpus. For DISJOINT splits use
    complementary bands on the SAME hash (``assign_splits``); different
    salts can never guarantee disjointness.
    """
    return df.where(_hash_prefix(key_col, salt) < F.lit(hex_threshold(fraction)))


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: partition the hash space
    into contiguous bands, one per split, in the given dict order.
    Fractions must sum to <= 1; any hash above the last band gets NULL
    (i.e. held out). Same scale shape as sampling: a narrow projection,
    no shuffle, identical assignment on every run and engine."""
    h = _hash_prefix(key_col, salt)
    expr: Column = F.lit(None).cast("string")
    hi = 0.0
    bands = []
    items = list(fractions.items())
    for i, (name, fraction) in enumerate(items):
        lo, hi = hi, hi + fraction
        # float accumulation: fractions summing to 1.0 can land at
        # 0.999…9, turning the last band's cap into 'ffff' and
        # NULL-splitting the 1/65536 of keys whose prefix is 'ffff'
        # — snap the final band to the keep-all sentinel instead
        if i == len(items) - 1 and abs(hi - 1.0) < 1e-9:
            hi = 1.0
        bands.append((name, hex_threshold(lo), hex_threshold(hi)))
    for name, lo_t, hi_t in reversed(bands):
        expr = F.when((h >= lo_t) & (h < hi_t), name).otherwise(expr)
    return df.withColumn(out_col, expr)


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
    salt: str = "",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """CONTENT-level leakage-safe train/val/test assignment: rows
    connected by near-duplicate ``pairs`` are forced into the SAME
    split, so a test document can never have a near-copy in train —
    the standard eval-contamination guard for LLM training corpora
    (``assign_splits`` above guards at the ENTITY level; this guards at
    the content level, where leakage actually happens after dedup
    finds transitive near-copy chains).

    Composition: connected components over the pair edges (alternating
    star, O(log n) rounds — operators/dedup.py) label every row with
    its near-dup group (singletons group as themselves), then the
    group key — not the row key — hashes into the split bands. One
    component ⇒ one hash ⇒ one split, by construction; determinism and
    proportions inherit from ``assign_splits``. Scale shape: the CC
    state is |rows in any pair| (near-dup rows only), the labeling is
    one left join, and the band assignment stays shuffle-free.
    """
    from mitoscape_spark.operators.dedup import connected_components

    comp = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("id").alias("_cc_id"), F.col("component").alias("_cc")
    )
    grouped = (
        df.join(comp, df[id_col] == comp["_cc_id"], "left")
        .drop("_cc_id")
        .withColumn("_grp", F.coalesce(F.col("_cc"), F.col(id_col)))
        .drop("_cc")
    )
    return assign_splits(
        grouped, "_grp", fractions, out_col=out_col, salt=salt
    ).drop("_grp")


def weighted_mix(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic downsampling — the data-mixing primitive
    (e.g. keep 25% of the dominant language, 100% of the rest).

    Compiles the weight table to a CASE expression over ``stratum_col``,
    so the whole mix is still one shuffle-free filter.
    """
    thr: Column = F.lit(hex_threshold(default))
    for value, fraction in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(hex_threshold(fraction))
        ).otherwise(thr)
    return df.where(_hash_prefix(key_col, salt) < thr)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_rows: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-key row cap — the "max N documents per domain/source" corpus
    primitive (dominant sources otherwise drown the mixture no matter
    how good the per-document quality filter is).

    Deterministic and engine-portable: rows rank within their key by
    ``md5(salt || id)`` (a stable pseudo-random order — no RNG state,
    identical across engines and reruns), ties broken by id; only rank
    ≤ ``max_rows`` survives. One window over (key, hash-order) = one
    shuffle partitioned by key; skew note: a single enormous key sorts
    within one partition — cap such keys in two passes (pre-filter by
    hash threshold ≈ max_rows/count) if one key exceeds a partition.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(key_col)
        .orderBy(order, F.col(id_col))
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= max_rows)
        .drop("_rank")
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    total: int,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted stratum sampling — the multilingual-corpus
    balancing rule (sample stratum s with probability ∝ n_s^alpha;
    alpha < 1 flattens the head, boosts the tail — the exponent-
    smoothed sampling popularized by multilingual pretraining recipes).

    Per-stratum budget k_s = floor(total * n_s^alpha / Σ n^alpha),
    filled by the deterministic md5 order (same primitive as
    cap_per_key). The stratum-count table is tiny (one row per source/
    language), so the budget join broadcasts; the only real shuffle is
    the per-stratum ranking window — identical cost to cap_per_key at
    any corpus size.
    """
    from pyspark.sql import Window

    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    wsum = Window.partitionBy()  # strata table is tiny; global sum OK
    budgets = counts.select(
        stratum_col,
        F.floor(
            F.lit(float(total))
            * F.pow("_n", alpha)
            / F.sum(F.pow("_n", alpha)).over(wsum)
        ).alias("_budget"),
    )
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(order, F.col(id_col))
    # null-safe budget join: a NULL stratum is a real group (groupBy
    # produced a budget row for it); a plain equi-join would silently
    # drop every NULL-stratum document from the mix
    b = budgets.withColumnRenamed(stratum_col, "_stratum_b")
    return (
        df.join(
            F.broadcast(b),
            F.col(stratum_col).eqNullSafe(F.col("_stratum_b")),
        )
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= F.col("_budget"))
        .drop("_rank", "_budget", "_stratum_b")
    )


def top_fraction_per_key(
    df: DataFrame,
    key_col: str,
    score_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Keep the top ``fraction`` of each key's rows by score — the
    per-source quality-percentile filter (a global score cutoff would
    empty low-scoring sources entirely; per-source percentiles preserve
    the mixture while dropping each source's worst tail).

    percent_rank (deterministic: score desc, id tiebreak) <= fraction.
    One window shuffle partitioned by key; same skew caveat as
    cap_per_key.

    Small-key bias, documented: percent_rank keeps
    floor(fraction·(n−1))+1 rows, so tiny keys over-keep (a 3-row key
    at 0.5 keeps 2 = 67%) and every key keeps ≥1 row for any
    fraction > 0 — the desirable behavior for "don't empty weak
    sources". ``fraction <= 0`` keeps nothing (explicitly special-
    cased: the top row's percent_rank is 0.0 and would otherwise
    always pass).
    """
    from pyspark.sql import Window

    if fraction <= 0.0:
        return df.where(F.lit(False))
    w = Window.partitionBy(key_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .where(F.col("_pr") <= fraction)
        .drop("_pr")
    )
