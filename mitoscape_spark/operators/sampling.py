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

from mitoscape_spark.pins import pin

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


def stratified_exact_split(
    df: DataFrame,
    stratum_cols: list[str] | str,
    id_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """EXACT-quota stratified split: within each stratum, rank rows by
    ``md5(salt || id)`` and cut at cumulative boundaries
    ``k_j = floor(n_s · cum_j + 0.5)`` — so every (stratum, split) cell
    gets its exact quota (``assign_splits``'s hash bands are only
    binomially close, ±sqrt(n) per cell, and a skewed stratum inherits
    the full error). The classic use: per-language / per-source
    train-val-test cuts where an eval set must have EXACTLY its share
    of every stratum.

    100 TB design — the naive plan (``row_number`` over
    ``partitionBy(stratum)``) serializes each stratum through ONE
    reducer; this instead finds the k_j-th smallest hash per stratum by
    distributed filter-and-refine order statistics:

    1. one agg: per-stratum counts (tiny);
    2. md5 prefixes are UNIFORM on [0, 16^13), so no quantile sketch is
       needed: the k-th order statistic of n_s uniforms concentrates at
       (k/n_s)·16^13 with rank fluctuation O(√n_s) (binomial), giving
       an ANALYTIC boundary band per stratum. One filter collects only
       the bands (O(√n_s) rows per boundary — ~10^6 ids at 10^11 rows,
       driver-trivial) and one exact conditional agg counts the base
       rank strictly below each band;
    3. driver: exact k_j-th hash = (k_j − base)-th smallest inside the
       tiny sorted band; thresholds broadcast back and assignment is a
       map-side ``h <= T_j`` case expression — no shuffle of the data
       itself, same scale shape as ``assign_splits``.

    The 13-hex (52-bit, double-exact) numeric proxy is order-consistent
    with the full hex string for ANY real cut point (equal-prefix
    strings stay together on one side), so strict-< base counts and
    in-band string sorting compose to the exact global order statistic.
    If a band misses its target rank (>5σ fluctuation — ~never), it
    retries 8× wider once, then fails loudly rather than mis-splitting.

    Contract: ``id_col`` unique per row (duplicate ids share a hash and
    move as one unit, so a quota landing mid-group shifts by the
    duplicate count); fractions > 0 summing to <= 1 (short sums leave a
    NULL-split holdout). Cumulative boundaries are rounded to 12
    decimals so an engine restating them as plain literals (0.8, 0.9)
    computes bit-identical cuts.

    Cardinality bound: strata are DRIVER-SIZED state here (per-stratum
    counts collect, and the base-rank agg builds |strata|·|splits|
    conditional sums — expression count, not data, scales with strata).
    Languages × sources × quality tiers is hundreds — fine; for a
    high-cardinality stratum (user_id-grade), pre-bucket it or use
    ``assign_splits`` (hash bands, approximate quotas, O(1) state).
    """
    import math

    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    strata = (
        [stratum_cols] if isinstance(stratum_cols, str) else list(stratum_cols)
    )
    if not fractions:
        raise ValueError("stratified_exact_split: empty fractions")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("stratified_exact_split: fractions must be > 0")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("stratified_exact_split: fractions sum to > 1")
    names, cums = [], []
    cum = 0.0
    for name, frac in fractions.items():
        cum = round(cum + frac, 12)
        names.append(name)
        cums.append(1.0 if abs(cum - 1.0) < 1e-9 else cum)

    # temp hash/threshold/key names must not collide with caller columns
    # — a caller column literally named `_h` (or `_t_0`/`_s_0`) would be
    # silently clobbered by withColumn and then eaten by the final
    # drop(); deepen the underscore prefix until ALL reserved tags are
    # clear of the input schema (round-6 advice item 2 for t_/s_;
    # round-7 advice item 1 extends the scan to h/hd)
    tmp = "_"
    taken = set(df.columns)
    n_idx = max(len(fractions), len(strata))
    while any(f"{tmp}{tag}" in taken for tag in ("h", "hd")) or any(
        f"{tmp}{tag}{i}" in taken for tag in ("t_", "s_") for i in range(n_idx)
    ):
        tmp += "_"
    h_col, hd_col = f"{tmp}h", f"{tmp}hd"

    key = F.coalesce(F.col(id_col).cast("string"), F.lit("__null_key__"))
    if salt:
        key = F.concat(F.lit(salt), key)
    hashed = df.withColumn(h_col, F.md5(key)).withColumn(
        hd_col, F.conv(F.substring(h_col, 1, 13), 16, 10).cast("double")
    )

    _M = float(16**13)  # hd range; md5 prefixes are uniform on [0, _M)

    counts = {
        tuple(r[c] for c in strata): r["_n"]
        for r in hashed.groupBy(*strata)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }

    def _thresholds(widen: float):
        # analytic bands: target rank k_j sits at p=k_j/n_s; the k-th
        # order statistic of n uniforms has rank-stddev ~sqrt(n·p(1-p)),
        # so ±5σ in p-space (+2/n slack for tiny strata) contains it
        # with overwhelming probability
        stats = {}
        for skey, n_s in counts.items():
            los, his = [], []
            for c in cums:
                k = n_s if c == 1.0 else int(math.floor(n_s * c + 0.5))
                p = k / n_s if n_s else 0.0
                delta = widen * (5.0 / math.sqrt(max(n_s, 1))) + 2.0 / max(
                    n_s, 1
                )
                los.append(max(0.0, p - delta) * _M)
                his.append(min(1.0, p + delta) * _M)
            stats[skey] = (n_s, los, his)
        # exact base rank below each band + the band members themselves,
        # one conditional agg + one filtered collect (band-sized)
        conds = []
        cond_index: dict[tuple, int] = {}
        for skey, (_n, los, his) in stats.items():
            match = None
            for c, v in zip(strata, skey):
                eq = F.col(c).eqNullSafe(F.lit(v))
                match = eq if match is None else (match & eq)
            for j in range(len(cums)):
                cond_index[(skey, j)] = len(conds)
                conds.append((skey, j, match, los[j], his[j]))
        base_aggs = [
            F.sum(
                (match & (F.col(hd_col) < F.lit(lo))).cast("long")
            ).alias(f"_b_{i}")
            for i, (_s, _j, match, lo, hi) in enumerate(conds)
        ]
        base_row = hashed.agg(*base_aggs).first()
        band_pred = None
        for _s, _j, match, lo, hi in conds:
            p = match & (F.col(hd_col) >= F.lit(lo)) & (
                F.col(hd_col) <= F.lit(hi)
            )
            band_pred = p if band_pred is None else (band_pred | p)
        band_rows = (
            hashed.where(band_pred).select(*strata, h_col, hd_col).collect()
        )
        bands: dict[tuple, list] = {}
        for r in band_rows:
            bands.setdefault(tuple(r[c] for c in strata), []).append(r)
        out: dict[tuple, list[str] | None] = {}
        for skey, (n_s, los, his) in stats.items():
            rows = bands.get(skey, [])
            ts: list[str] = []
            for j, c in enumerate(cums):
                k = n_s if c == 1.0 else int(math.floor(n_s * c + 0.5))
                if k <= 0:
                    ts.append("")  # no 32-hex string sorts <= ""
                    continue
                if k >= n_s:
                    ts.append("g")  # every hex string sorts < "g"
                    continue
                base = base_row[f"_b_{cond_index[(skey, j)]}"]
                band = sorted(
                    r[h_col]
                    for r in rows
                    if los[j] <= r[hd_col] <= his[j]
                )
                idx = k - base - 1
                if 0 <= idx < len(band):
                    ts.append(band[idx])
                else:
                    out[skey] = None  # retry signal
                    break
            else:
                out[skey] = ts
                continue
        return out

    thresholds = _thresholds(1.0)
    if any(v is None for v in thresholds.values()):
        thresholds = _thresholds(8.0)
        if any(v is None for v in thresholds.values()):
            raise RuntimeError(
                "stratified_exact_split: boundary band missed its target "
                "rank twice — uniform-hash concentration violated"
            )

    spark = df.sparkSession
    t_cols = [f"{tmp}t_{j}" for j in range(len(cums))]
    t_rows = [
        tuple(list(skey) + ts) for skey, ts in thresholds.items()
    ]
    t_schema = ", ".join(
        [f"`{c}` string" for c in strata] + [f"{t} string" for t in t_cols]
    )
    # strata values are read back as strings for the join key only when
    # the source column is string; preserve original types by building
    # the frame from the collected rows' native Python values instead
    t_df = spark.createDataFrame(
        t_rows, schema=strata + t_cols
    ) if t_rows else spark.createDataFrame([], schema=t_schema)
    expr: Column = F.lit(None).cast("string")
    for name, tc in zip(reversed(names), reversed(t_cols)):
        expr = F.when(F.col(h_col) <= F.col(tc), name).otherwise(expr)
    # null-safe threshold join: NULL strata are real groups — the band
    # predicates above already use eqNullSafe, so quotas and thresholds
    # exist for them; a plain `on=strata` equi-join would leave every
    # NULL-stratum row with split=NULL even when fractions sum to 1.0
    # (same contract as temperature_mix's budget join)
    s_cols = [f"{tmp}s_{i}" for i in range(len(strata))]
    t_side = t_df
    for c, sc in zip(strata, s_cols):
        t_side = t_side.withColumnRenamed(c, sc)
    cond: Column | None = None
    for c, sc in zip(strata, s_cols):
        eq = F.col(c).eqNullSafe(F.col(sc))
        cond = eq if cond is None else (cond & eq)
    return (
        hashed.join(F.broadcast(t_side), cond, how="left")
        .withColumn(out_col, expr)
        .drop(h_col, hd_col, *t_cols, *s_cols)
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    group_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis one-pass scheme: each row draws a uniform
    u ∈ (0, 1] from ``md5(salt || id)`` and ranks by the key
    ``ln(u) / w`` (the monotone log of u^(1/w)); the top-k keys ARE a
    weighted sample without replacement. The importance-sampling
    primitive for quality-weighted corpus selection: P(row in sample)
    rises with weight, no row repeats, and — unlike ``DataFrame.sample``
    — the same rows are chosen on every run, engine, and partitioning.

    Per ``group_col`` (one window shuffle, groups partition the work)
    or global (``TakeOrdered`` top-k, no full sort). Rows with NULL or
    non-positive weight are excluded (zero weight = never sampled, and
    ln(u)/0 is undefined — documented contract, mirrored by oracles).

    Cross-engine note: ``ln`` may differ in the last ulp between JVM
    and DuckDB libms; two keys would have to collide within ~1e-16 for
    a rank to flip (P ≈ n²·1e-16 — the sign-LSH class of negligible),
    and the key itself is never emitted.
    """
    if k < 1:
        raise ValueError("weighted_sample_without_replacement: k >= 1")
    u = (
        F.conv(
            F.substring(_full_hash(id_col, salt), 1, 13), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4503599627370497.0)  # (0, 1]; 16^13 + 1
    keyed = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_wk", F.log(u) / F.col(weight_col))
    if group_col is None:
        return (
            keyed.orderBy(F.col("_wk").desc(), F.col(id_col))
            .limit(k)
            .drop("_wk")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("_wk").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_wk", "_rk")
    )


def _full_hash(key_col: str, salt: str) -> Column:
    """Full 32-hex md5 of (salt || key) with the same NULL-sentinel
    contract as ``_hash_prefix``."""
    key = F.coalesce(
        F.col(key_col).cast("string"), F.lit("__null_key__")
    )
    if salt:
        key = F.concat(F.lit(salt), key)
    return F.md5(key)


def sample_negatives(
    positives: DataFrame,
    corpus: DataFrame,
    qid_col: str,
    did_col: str,
    k: int,
    oversample: int = 3,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: for every query in ``positives``, ``k`` corpus documents
    that are NOT among its positives (and not itself) — drawn by the
    engine-portable md5 primitive, so the same negatives come out on
    every run, engine, and partitioning.

    Scale shape — the naive formulation (query × corpus cross join,
    then sample) is quadratic in ROWS. This one is linear: the corpus
    gets a dense 1..N index once (two-phase ``ranking.global_rank`` —
    no single-partition window), each query mints ``oversample·k``
    pseudo-random indices as a generate (md5(salt:qid:j) mod N — a
    flatMap, no shuffle), and candidates resolve through ONE equi-join
    on the index. Collisions with positives/self/duplicate draws are
    rejected afterwards; survivors keep draw order, truncated to k.

    With P positives out of N corpus docs, a query under-fills only if
    > (oversample−1)·k of its oversample·k draws reject — vanishing
    for oversample ≥ 3 unless P/N is large; under-filled queries are
    returned short (count them if the contract matters downstream).
    """
    from pyspark.sql import Window

    from mitoscape_spark.operators.ranking import global_rank

    if k < 1 or oversample < 1:
        raise ValueError("sample_negatives: k >= 1, oversample >= 1")
    idx = global_rank(
        corpus.select(F.col(did_col).alias("_did")).distinct(),
        score_col="_did",
        id_col="_did",
        out_col="_idx",
    )
    # count + the candidate join both act on idx, and global_rank's
    # own internal actions already ran the distinct scan twice — pin
    # the (corpus-id-sized) index so nothing re-derives it again
    idx = idx.transform(pin)
    n = idx.count()  # 1-scalar driver state, like the bucket bounds
    n_draws = oversample * k
    qids = positives.select(F.col(qid_col).alias("_qid")).distinct()
    draws = qids.select(
        "_qid",
        F.explode(
            F.array(*[F.lit(j) for j in range(n_draws)])
        ).alias("_j"),
    ).withColumn(
        "_idx",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"),
                            F.col("_qid").cast("string"),
                            F.lit(":"),
                            F.col("_j").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(n)
        )
        + 1,
    )
    cand = (
        draws.join(idx, "_idx")
        .where(F.col("_did") != F.col("_qid"))
        .join(
            positives.select(
                F.col(qid_col).alias("_qid"),
                F.col(did_col).alias("_did"),
            ).distinct(),
            ["_qid", "_did"],
            "left_anti",
        )
    )
    # duplicate draws of one candidate keep the earliest j; then the
    # first k surviving draws in j order are the sample
    w_dup = Window.partitionBy("_qid", "_did").orderBy("_j")
    w_take = Window.partitionBy("_qid").orderBy("_j")
    return (
        cand.withColumn("_dup", F.row_number().over(w_dup))
        .where(F.col("_dup") == 1)
        .withColumn("_take", F.row_number().over(w_take))
        .where(F.col("_take") <= k)
        .select(
            F.col("_qid").alias(qid_col),
            F.col("_did").alias("neg_id"),
            F.col("_take").cast("int").alias("draw_order"),
        )
    )


def weighted_sample_with_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "wr",
) -> DataFrame:
    """Deterministic weighted sampling WITH replacement — k independent
    categorical draws by cumulative-weight inversion (the multinomial
    resampling primitive: bootstrap replicas, importance resampling,
    epoch mixing where one document may legitimately repeat).
    Complements ``weighted_sample_without_replacement`` (E–S keys
    cannot produce repeats by construction).

    Plan shape: each row gets its cumulative-weight interval
    [lower, lower+w) from the two-phase prefix sum (no global window);
    the k draw targets derive from ``md5(salt:j)`` scaled by the total
    weight (one collected scalar, like the corpus size in
    ``sample_negatives``) and ship BROADCAST as a literal array — each
    row checks membership map-side, so the cost is one linear pass,
    never a k × n join. Integer weights keep every interval bound and
    target exact cross-engine; float weights work but put draws within
    one ulp of a boundary at (negligible) cross-engine risk.

    Returns (draw_order 0..k-1, id, weight); rows with NULL or
    non-positive weight are excluded, mirroring the E–S contract.
    """
    if k < 1:
        raise ValueError("weighted_sample_with_replacement: k >= 1")
    from mitoscape_spark.operators.orderstats import running_prefix

    rows = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        F.col(id_col).alias("_id"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    cum = running_prefix(
        rows, "_id", {"_lo": ("_w", "sum")}, strict=True
    ).select(
        "_id", "_w", F.coalesce("_lo", F.lit(0.0)).alias("_lo")
    )
    total = rows.agg(F.sum("_w")).first()[0]
    if total is None:
        return cum.select(
            F.lit(0).cast("int").alias("draw_order"),
            F.col("_id").alias(id_col),
            F.col("_w").alias(weight_col),
        ).where(F.lit(False))
    targets = []
    import hashlib

    for j in range(k):
        h = hashlib.md5(f"{salt}:{j}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / 4503599627370497.0  # (0, 1]
        # map u in (0,1] onto [0, total): flip to 1-u in [0,1)
        targets.append((j, (1.0 - u) * float(total)))
    draws = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.lit(t).alias("t")
            )
            for j, t in targets
        ]
    )
    hits = F.filter(
        draws,
        lambda d: (d["t"] >= F.col("_lo"))
        & (d["t"] < F.col("_lo") + F.col("_w")),
    )
    return (
        cum.select(
            F.explode(hits).alias("d"), "_id", "_w"
        )
        .select(
            F.col("d.j").cast("int").alias("draw_order"),
            F.col("_id").alias(id_col),
            F.col("_w").alias(weight_col),
        )
        .orderBy("draw_order")
    )
