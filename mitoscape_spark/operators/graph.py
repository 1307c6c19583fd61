"""Iterative graph algorithms beyond connected components (which live
in operators/dedup.py next to their dedup use-case): PageRank over an
edge DataFrame.

Scale shape per iteration: one join (edges ⋈ ranks on src — both
hash-partitioned on the node id) + one grouped sum on dst. Rank state
is |nodes| rows; edges never materialize to the driver; per-round
lineage is truncated with localCheckpoint (same discipline as
connected_components — iterative Catalyst plans otherwise grow without
bound). Convergence is an L1 delta computed as a 1-row aggregate —
the only driver-side scalar per round.

Dangling nodes (no out-edges) donate their damped mass uniformly, the
standard stochastic-matrix correction, so ranks sum to 1 every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mitoscape_spark.pins import pin, pin_eager


def _driver_pagerank_ranks(
    e: DataFrame,
    nodes: DataFrame,
    damping: float,
    max_iter: int,
    tol: float,
) -> DataFrame:
    """Bounded SMALL-GRAPH finisher for ``pagerank``: collect the
    (already distinct, already checkpointed) edge list and run the
    power iteration in numpy on the driver, returning the same
    (id, rank) contract as the distributed loop (unrounded — the
    caller applies the shared ROUND(8), so half-up rounding semantics
    stay identical on both paths).

    Why (round-11 optimization; same doctrine as the CC finisher,
    PERF.md §23/§24): each distributed round costs two joins + a
    grouped sum + a lineage-truncating checkpoint — ~0.27 s/round of
    pure driver/AQE scheduling floor on graphs any single node solves
    in microseconds. ext_pagerank's fixed 30 rounds over a ~6-node
    event-type transition graph measured 8.49 s at sf0.1, ~85% of it
    this floor. The caller gates on the ALREADY NEEDED distinct edge
    count with the same measured ~300 B/edge Python-peak byte model as
    ``connected_components``; above the bound the distributed loop
    runs unchanged.

    Float expression shapes mirror the distributed path exactly:
    per-edge contribution ``rank/deg`` (float64 division), new rank
    ``(1-d)/n + d*(inflow + dangling/n)``. Summation order inside
    ``inflow`` differs (bincount vs partial hash agg), which moves
    results by ulps only — absorbed by the shared ROUND(8) exactly as
    the cross-engine DuckDB oracle comparison already absorbs
    engine-order differences.
    """
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    id_type = nodes.schema["id"].dataType
    ids = nodes.toPandas()["id"].tolist()
    n = len(ids)  # round 12: no separate nodes.count() job
    out_schema = T.StructType(
        [
            T.StructField("id", id_type, True),
            T.StructField("rank", T.DoubleType(), True),
        ]
    )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    idx = {v: i for i, v in enumerate(ids)}
    epdf = e.toPandas()
    m = len(epdf)
    src_i = np.fromiter(
        (idx[v] for v in epdf["s"].tolist()), dtype=np.int64, count=m
    )
    dst_i = np.fromiter(
        (idx[v] for v in epdf["d"].tolist()), dtype=np.int64, count=m
    )
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    dangling_mask = deg == 0.0
    has_dangling = bool(dangling_mask.any())
    ranks = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        inflow = np.bincount(
            dst_i, weights=ranks[src_i] / deg[src_i], minlength=n
        )
        dangling = (
            float(ranks[dangling_mask].sum()) if has_dangling else 0.0
        )
        new_ranks = (1.0 - damping) / n + damping * (
            inflow + dangling / n
        )
        if tol > 0:
            delta = float(np.abs(ranks - new_ranks).sum())
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    out = pd.DataFrame({"id": ids, "rank": ranks})
    return spark.createDataFrame(out, schema=out_schema)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    src: str = "src",
    dst: str = "dst",
    driver_finish_max_edges: int = 2_000_000,
) -> DataFrame:
    """(id, rank) for every node appearing in ``edges`` (directed).

    Edges with a NULL endpoint are dropped in the shared
    canonicalization (round 12, ADVICE r11): the distributed loop's
    equi-joins never matched a null id anyway (a null-src edge
    contributed no inflow and null was always classified dangling),
    while the numpy finisher would have indexed null as an ordinary
    node — filtering makes both paths agree; null node ids are
    unsupported.

    ``tol`` caveat (ADVICE r11): in convergence mode (tol > 0) the
    finisher and the distributed loop compute the L1 delta with
    different summation orders, so near the tol boundary the early
    break can fire one iteration apart — results can then differ by
    more than the shared ROUND(8) absorbs. Path-independent results
    need tol=0 (fixed iterations; ext_pagerank's oracle mode) or a
    pinned path via ``driver_finish_max_edges=0``.
    """
    # canonicalize + pin the loop-invariant edge set ONCE — LAZILY
    # (round 12): the gate probe below is the first action and
    # materializes it, so the old eager pin's separate job (plus the
    # separate nodes job + nodes.count() job) collapses; without a pin
    # every iteration re-runs the edge scan + distinct shuffle from
    # source lineage (~2 redundant full shuffles per round)
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .transform(pin)
    )
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .transform(pin)
    )
    if driver_finish_max_edges > 0:
        # bounded driver finisher (round 11; the CC-finisher doctrine —
        # see _driver_pagerank_ranks). The probe materializes the edge
        # checkpoint the loop needed anyway; the byte model is the
        # measured Python-process peak from connected_components
        # (round 10): ~300 B/edge for integral ids, plus character
        # data ×4 for strings. Pass driver_finish_max_edges=0 to force
        # the distributed loop (tests/probes).
        from mitoscape_spark.operators.dedup import _INTEGRAL_TYPES

        integral = isinstance(
            e.schema["s"].dataType, _INTEGRAL_TYPES
        ) and isinstance(e.schema["d"].dataType, _INTEGRAL_TYPES)
        per_edge_overhead = F.count(F.lit(1)) * F.lit(300)
        payload = (
            per_edge_overhead
            if integral
            else per_edge_overhead
            + F.coalesce(
                F.sum(
                    (
                        F.octet_length(F.col("s").cast("string"))
                        + F.octet_length(F.col("d").cast("string"))
                    )
                    * F.lit(4)
                ),
                F.lit(0),
            )
        )
        probe = e.agg(
            F.count(F.lit(1)).alias("n"), payload.alias("b")
        ).first()
        if (
            probe["n"] <= driver_finish_max_edges
            and probe["b"] <= 640 * 1024 * 1024
        ):
            # the finisher reads n from its own nodes collect — no
            # separate count job on this path
            return _driver_pagerank_ranks(
                e, nodes, damping, max_iter, tol
            ).select("id", F.round("rank", 8).alias("rank"))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(pin_eager)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    # the SET of dangling nodes (no out-edges) is loop-invariant — only
    # its rank MASS changes per round. Materialize it once; when empty
    # (common for transition/co-occurrence graphs) the per-round
    # dangling aggregation is skipped outright — previously a driver
    # action per round, ~45% of wall-clock on a dangling-free graph
    dangling_nodes = (
        nodes.join(out_deg, nodes["id"] == out_deg["s"], "left_anti")
        .transform(pin_eager)
    )
    has_dangling = bool(dangling_nodes.head(1))

    for _ in range(max_iter):
        contrib = (
            e.join(ranks, e["s"] == ranks["id"])
            .join(out_deg, "s")
            .select("d", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by nodes with no out-edges (an
        # equi-join against the tiny invariant set, not a per-round
        # anti-join against out_deg)
        dangling = (
            ranks.join(dangling_nodes.select("id"), "id")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .head()[0]
            if has_dangling
            else 0.0
        )
        new_ranks = (
            nodes.join(contrib, nodes["id"] == contrib["d"], "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            # lazy: the delta agg below is the first action, so one job
            # per round materializes checkpoint + convergence check
            # (tol<=0 = fixed-iteration mode: no delta job, eager
            # checkpoint materializes the round — deterministic
            # iteration count makes the run SQL-restatable, which is
            # how ext_pagerank carries a DuckDB oracle)
            .transform(lambda d: pin(d, eager=tol <= 0))
        )
        if tol > 0:
            delta = (
                ranks.join(new_ranks.withColumnRenamed("rank", "r2"), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("r2"))))
                .head()[0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("id", F.round("rank", 8).alias("rank"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, n_triangles) for every node in ≥1 triangle — SPARSE
    output: triangle-free nodes are absent (left-join + coalesce(0)
    against your node set to densify), via degree-ordered orientation.

    The MapReduce-classic trick (Suri & Vassilvitskii 2011, "Counting
    Triangles and the Curse of the Last Reducer"): canonicalize the
    undirected edge set, then orient every edge from its lower-degree
    endpoint to the higher ((deg, id) lexicographic break). Each
    triangle then has exactly ONE wedge node whose two oriented
    out-edges span it, so wedges = join of the oriented edge list with
    itself on the source — and a node's wedge count is C(outdeg, 2)
    with outdeg bounded by O(sqrt(m)) under this orientation. That
    bound is the whole point at scale: a celebrity node with 10^7
    followers produces no 10^14-wedge reducer, because its edges all
    orient INTO it.

    Plan: 3 shuffles (distinct edges, degree agg, wedge self-join) +
    one semi-ish join to close wedges against the oriented edges.
    Everything partial-aggregates; no driver state.
    """
    # canonical undirected edges, self-loops dropped
    a, b = F.least(F.col("s"), F.col("d")), F.greatest(F.col("s"), F.col("d"))
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s") != F.col("d"))
        .select(a.alias("u"), b.alias("v"))
        .distinct()
        # pin: `e` feeds the degree union (twice) and the rank join —
        # an expensive caller edge derivation (ext_triangle_count's
        # co-purchase self-join) must not re-execute per occurrence
        # (round-7; same discipline as connected_components)
        .transform(pin)
    )
    # §20 pin: the degree table attaches to BOTH edge endpoints (du/dv
    # are different projections — no ReuseExchange)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(pin)
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    # Edge-iterator with adjacency intersection (the shuffle-lean form
    # of the wedge join): per ORIENTED edge (a→b), the triangles
    # through it are |N⁺(a) ∩ N⁺(b)|. The naive wedge self-join
    # materializes and SHUFFLES every wedge (Σ C(outdeg,2) rows — 35M
    # at a mere 1.2M edges, measured); here the intersection runs
    # JVM-side per edge row and only actual triangle closures explode
    # out. Same O(m^1.5) work bound from the orientation.
    #
    # Round 11 (guide §2.4): the a-side adjacency attach needs NO join
    # — exploding each adjacency list regenerates exactly the oriented
    # edge rows with the source's own list already attached, removing
    # one m-row shuffle join (plan: 2 closure joins → 1). The b-side
    # attach stays a join; its shuffle carries the exploded rows with
    # their a-lists (wedge-mass bytes) exactly as the two-join form's
    # second shuffle did.
    # §20 pin: adj feeds the exploded a-side AND the b-side attach
    # with different projections — without it the orientation join +
    # collect_list agg execute twice
    adj = (
        oriented.groupBy("lo")
        .agg(F.collect_list("hi").alias("nbrs"))
        .transform(pin)
    )
    b_adj = adj.select(F.col("lo").alias("b"), F.col("nbrs").alias("nb"))
    closed = (
        adj.select(
            F.col("lo").alias("a"),
            F.explode("nbrs").alias("b"),
            F.col("nbrs").alias("na"),
        )
        .join(b_adj, "b")
        .select(
            "a",
            "b",
            F.array_intersect(F.col("na"), F.col("nb")).alias("ws"),
        )
        .where(F.size("ws") > 0)
        # §20 pin: the per-node credit below unions three projections
        # of closed — without it the whole adjacency pipeline executes
        # once per union branch
        .transform(pin)
    )
    # per-node credit: the edge endpoints once per closure, every
    # closing node once
    per_node = (
        closed.select(F.col("a").alias("id"), F.size("ws").alias("w"))
        .unionAll(closed.select(F.col("b").alias("id"), F.size("ws").alias("w")))
        .unionAll(
            closed.select(
                F.explode("ws").alias("id"), F.lit(1).alias("w")
            )
        )
        .groupBy("id")
        .agg(F.sum("w").cast("long").alias("n_triangles"))
    )
    return per_node


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, community) via deterministic synchronous label propagation.

    Classic LPA (Raghavan et al. 2007) with the randomness removed so
    runs are reproducible and cross-engine comparable: every round a
    node adopts its neighborhood's most frequent label, ties broken by
    the SMALLEST label; the node's own current label participates with
    weight 1 (self-vote damps the 2-cycle oscillation synchronous LPA
    is prone to). Stops early when no label changes.

    Per round: one edge⋈label join (both sides hash-partitioned on the
    node id) + one (node, label) count agg + one max_by selection —
    all partial-aggregating, label state is |nodes| rows, lineage
    truncated per round (localCheckpoint, same discipline as pagerank
    above). Convergence check is a 1-row count aggregate.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.where(F.col("a") != F.col("b"))
        .select("a", "b")
        .union(e.where(F.col("a") != F.col("b")).select(
            F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        # loop-invariant: materialize once, not per round
        .transform(pin_eager)
    )
    nodes = und.select(F.col("a").alias("id")).distinct()
    labels = nodes.withColumn("lbl", F.col("id")).transform(pin_eager)

    for _ in range(max_iter):
        neigh = (
            und.join(labels, und["b"] == labels["id"])
            .select(F.col("a").alias("node"), "lbl")
        )
        votes = (
            neigh.union(
                labels.select(F.col("id").alias("node"), "lbl")
            )
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # most frequent label, smallest label on ties: min_by over a
        # (-count, label) struct — type-generic (a cast-to-long
        # tie-break would NULL out string labels and silently turn
        # the deterministic pick arbitrary)
        new_labels = (
            votes.groupBy("node")
            .agg(
                F.min_by(
                    "lbl",
                    F.struct(
                        (-F.col("n")).alias("_neg_n"), F.col("lbl")
                    ),
                ).alias("lbl")
            )
            .select(F.col("node").alias("id"), "lbl")
            # lazy: the changed-count below materializes it (one job
            # per round instead of two)
            .transform(pin)
        )
        changed = (
            labels.withColumnRenamed("lbl", "old")
            .join(new_labels, "id")
            .where(F.col("old") != F.col("lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("community"))

def shortest_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, dist): minimum hop count from any node in ``sources``
    (single column ``id``) over DIRECTED edges, bounded by ``max_hops``
    — distributed frontier BFS.

    Per round: one equi-join frontier ⋈ edges on the node id + one
    anti-join against the settled set — both hash-partitioned on node
    id, state is O(|reached nodes|), edges never leave the cluster.
    The frontier SHRINKS monotonically (only newly-settled nodes
    advance), so unlike the naive "min over k-hop paths expansion"
    formulation the work per round is bounded by new nodes, not path
    count — path-based formulations explode combinatorially on dense
    graphs (the sf0.01 oracle states exactly that unrolled form; it
    must agree because hop-minimality is join-order independent).
    Lineage is truncated per round (localCheckpoint, same discipline as
    pagerank above); rounds stop early when the frontier empties.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .transform(pin_eager)
    )
    settled = (
        sources.select(F.col("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .transform(pin_eager)
    )
    frontier = settled
    for hop in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier["id"] == e["s"])
            .select(F.col("d").alias("id"))
            .distinct()
        )
        fresh = (
            reached.join(settled, "id", "left_anti")
            .withColumn("dist", F.lit(hop))
            .transform(pin_eager)
        )
        if fresh.isEmpty():
            break
        settled = settled.unionByName(fresh).transform(pin_eager)
        frontier = fresh
    return settled


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, core_degree): the k-core of the undirected simple graph —
    the maximal subgraph where every surviving node keeps degree ≥ k —
    by iterative peeling (repeatedly drop sub-k nodes and their edges
    until a fixpoint). The standard graph-mining density primitive:
    spam/bot rings, community cores, graph sparsification before
    expensive all-pairs work.

    Input edges may be directed/duplicated; they canonicalize to
    distinct (least, greatest) pairs, self-loops dropped. Per round:
    one degree aggregation (union of endpoints, map-side combined) +
    two semi-joins filtering edges to surviving endpoints — all
    hash-partitioned on node id, per-round state is the shrinking edge
    set itself, lineage truncated per round (localCheckpoint, the same
    discipline as ``pagerank``/``shortest_hops``). Rounds needed =
    peeling depth (11 at the bench graph; pathological chains can
    reach O(n) — ``max_rounds`` fails LOUDLY rather than returning a
    non-fixpoint, because the result would silently contain sub-k
    nodes).
    """
    if k < 1:
        raise ValueError("k_core: k must be >= 1")
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .transform(pin_eager)
    )
    n_edges = e.count()
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("u").alias("id"))
            .unionAll(e.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id")
        e2 = (
            e.join(keep.withColumnRenamed("id", "u"), "u", "semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "semi")
            .select("u", "v")
            .transform(pin_eager)
        )
        n2 = e2.count()
        if n2 == n_edges:
            return (
                e.select(F.col("u").alias("id"))
                .unionAll(e.select(F.col("v").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("core_degree"))
            )
        e, n_edges = e2, n2
    raise RuntimeError(
        f"k_core: no fixpoint within {max_rounds} rounds "
        f"(peeling depth exceeds the budget — raise max_rounds)"
    )


def adamic_adar_scores(
    edges: DataFrame, min_common: int = 2
) -> DataFrame:
    """Link prediction over an undirected graph: Adamic–Adar score
    AA(u, v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg(z)) for node pairs NOT yet
    connected — the recommender/graph-completion primitive (rare shared
    neighbors say more than celebrity hubs, hence the 1/ln damping).

    Input: (u, v) edges, u < v, one row per undirected edge. Pairs
    with fewer than ``min_common`` shared neighbors are dropped —
    that floor is what bounds the candidate space (same wedge-cost
    shape as triangle counting: fan-out per hub z is deg(z)², so a
    degree cap or the Suri–Vassilvitskii orientation applies to
    hub-heavy graphs before this).

    Plan: symmetrize → degree agg (broadcast back) → wedge self-join
    on the shared neighbor z → pair agg → anti-join existing edges.
    Scores round to 6 dp (sums of 1/ln terms — summation-order jitter
    is last-ulp only).
    """
    # §20 pin: the caller's edge derivation is referenced by the
    # symmetric union (twice) and the existing-edge anti-join below —
    # without the checkpoint an expensive upstream lineage (e.g. the
    # co-purchase self-join) re-executes per occurrence
    edges = edges.transform(pin)
    # §20 pin: sym feeds the degree agg AND the adjacency projection
    # (whose self-join reads it twice more)
    sym = (
        edges.selectExpr("u", "v")
        .union(edges.selectExpr("v AS u", "u AS v"))
        .transform(pin)
    )
    deg = sym.groupBy(F.col("u").alias("z")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    adj = sym.select(F.col("u").alias("z"), F.col("v").alias("n"))
    wedges = (
        adj.alias("a")
        .join(adj.alias("b"), "z")
        .where(F.col("a.n") < F.col("b.n"))
        .select(
            "z", F.col("a.n").alias("u"), F.col("b.n").alias("v")
        )
        .join(F.broadcast(deg), "z")
    )
    scored = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.round(
                F.sum(F.lit(1.0) / F.log(F.col("_deg"))), 6
            ).alias("aa_score"),
        )
        .where(F.col("n_common") >= min_common)
    )
    return scored.join(
        edges.select("u", "v"), ["u", "v"], "left_anti"
    )
