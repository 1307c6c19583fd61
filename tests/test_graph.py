"""PageRank (operators/graph.py) vs a numpy power-iteration oracle."""

from __future__ import annotations

import numpy as np

from mitoscape_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping=0.85, iters=60):
    M = np.zeros((n, n))
    out = np.zeros(n)
    for s, d in edge_list:
        M[d, s] += 1.0
        out[s] += 1.0
    for s in range(n):
        if out[s]:
            M[:, s] /= out[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    edge_list = [
        (0, 1), (1, 2), (2, 0), (0, 2), (3, 2),  # 3 is upstream-only
    ]  # node 4 dangling via (2, 4)? keep 4 out for the base case
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, max_iter=60).collect()}
    want = _numpy_pagerank(4, edge_list)
    for i in range(4):
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_dangling_mass_redistributed(spark):
    # 0 -> 1, 1 has NO out-edges: without the dangling correction the
    # total mass leaks each round
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, max_iter=60).collect()}
    want = _numpy_pagerank(2, [(0, 1)])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for i in range(2):
        assert abs(got[i] - want[i]) < 1e-6
    assert got[1] > got[0]  # the sink accumulates rank


def test_pagerank_symmetric_cycle_is_uniform(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = [r["rank"] for r in pagerank(df).collect()]
    assert all(abs(r - 1 / 3) < 1e-6 for r in got)


def test_pagerank_driver_finisher_matches_distributed(spark):
    """Round-11 routing: small edge sets take the bounded numpy driver
    finisher; driver_finish_max_edges=0 forces the distributed star of
    joins. Both paths must agree to the shared ROUND(8) contract on a
    seeded random graph with dangling nodes, string ids, duplicate
    input edges, and a fixed-iteration (tol=0) run — the exact
    configuration ext_pagerank oracles."""
    import random

    rng = random.Random(11)
    nodes = [f"t{i}" for i in range(17)]
    edge_list = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
    ] + [("t0", "t1")] * 3  # duplicates: the distinct must dedupe both paths
    df = spark.createDataFrame(edge_list, "src string, dst string")
    fast = {
        r["id"]: r["rank"]
        for r in pagerank(df, max_iter=25, tol=0.0).collect()
    }
    slow = {
        r["id"]: r["rank"]
        for r in pagerank(
            df, max_iter=25, tol=0.0, driver_finish_max_edges=0
        ).collect()
    }
    assert fast == slow
    # and with convergence-mode tol (early break must agree too)
    fast_tol = {
        r["id"]: r["rank"] for r in pagerank(df, max_iter=60).collect()
    }
    slow_tol = {
        r["id"]: r["rank"]
        for r in pagerank(df, max_iter=60, driver_finish_max_edges=0).collect()
    }
    assert fast_tol == slow_tol


# ---------------------------------------------------------- triangles
from itertools import combinations

from mitoscape_spark.operators.graph import triangle_counts


def _brute_triangles(edge_list):
    """Per-node triangle counts by enumerating all node triples."""
    adj = set()
    nodes = set()
    for s, d in edge_list:
        if s == d:
            continue
        adj.add((min(s, d), max(s, d)))
        nodes.update((s, d))
    counts = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (b, c), (a, c)} <= adj:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r.id: r.n_triangles for r in triangle_counts(df).collect()
    }


def test_triangle_counts_k4(spark):
    # K4: 4 triangles total, every node in exactly 3
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _run(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_triangle_free(spark):
    # a 6-cycle has no triangles -> empty result
    edges = [(i, (i + 1) % 6) for i in range(6)]
    assert _run(spark, edges) == {}


def test_triangle_counts_duplicate_and_reversed_edges(spark):
    # duplicates, reversed duplicates, and self-loops must not inflate
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    assert _run(spark, edges) == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(12), rng.randrange(12)) for _ in range(60)
    ]
    assert _run(spark, edges) == _brute_triangles(edges)


# ------------------------------------------------- label propagation
from mitoscape_spark.operators.graph import label_propagation


def _py_lpa(edge_list, max_iter=10):
    """Pure-python twin of the deterministic synchronous LPA."""
    adj = {}
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lbl = {v: v for v in adj}
    for _ in range(max_iter):
        votes = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            counts[lbl[v]] = counts.get(lbl[v], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            votes[v] = best[0]
        if votes == lbl:
            break
        lbl = votes
    return lbl


def test_lpa_two_cliques_one_bridge(spark):
    from itertools import combinations

    edges = list(combinations(range(5), 2)) + [
        (a + 10, b + 10) for a, b in combinations(range(5), 2)
    ] + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.community for r in label_propagation(df).collect()}
    comm_a = {got[i] for i in range(5)}
    comm_b = {got[i + 10] for i in range(5)}
    assert len(comm_a) == 1 and len(comm_b) == 1
    assert comm_a != comm_b


def test_lpa_matches_python_twin(spark):
    import random

    rng = random.Random(13)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.community for r in label_propagation(df).collect()}
    assert got == _py_lpa(edges)


def test_pagerank_empty_edges_returns_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).collect() == []


def test_lpa_deterministic_with_string_ids(spark):
    from itertools import combinations

    edges = [
        (f"u{a}", f"u{b}") for a, b in combinations(range(4), 2)
    ] + [(f"v{a}", f"v{b}") for a, b in combinations(range(4), 2)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got1 = {r.id: r.community for r in label_propagation(df).collect()}
    got2 = {r.id: r.community for r in label_propagation(df).collect()}
    assert got1 == got2
    # each clique converges to its smallest label
    assert {got1[f"u{i}"] for i in range(4)} == {"u0"}
    assert {got1[f"v{i}"] for i in range(4)} == {"v0"}


def test_shortest_hops_hand_graph(spark):
    from mitoscape_spark.operators.graph import shortest_hops

    # 1->2->3->4->5 chain plus shortcut 1->4; node 9 unreachable
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (8, 9)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(1,)], "id long")
    got = {
        (r.id, r.dist)
        for r in shortest_hops(edges, sources, max_hops=10).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (4, 1), (5, 2)}


def test_shortest_hops_bounded_and_isolated_source(spark):
    from mitoscape_spark.operators.graph import shortest_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    # source 7 touches no edge: still settled at dist 0
    sources = spark.createDataFrame([(1,), (7,)], "id long")
    got = {
        (r.id, r.dist)
        for r in shortest_hops(edges, sources, max_hops=2).collect()
    }
    assert got == {(1, 0), (7, 0), (2, 1), (3, 2)}  # 4 is beyond the bound


def test_k_core_peels_chain_keeps_clique(spark):
    """A 4-clique with a pendant chain: the 3-core is exactly the
    clique (the chain peels away over multiple rounds — depth > 1
    exercises the iteration, not just one filter); edge direction and
    duplicates must not matter."""
    from itertools import combinations

    from mitoscape_spark.operators.graph import k_core

    clique = list(combinations([1, 2, 3, 4], 2))
    chain = [(4, 5), (5, 6), (6, 7)]
    # reversed duplicates + a self-loop: canonicalization under test
    edges = spark.createDataFrame(
        clique + chain + [(b, a) for a, b in clique] + [(3, 3)],
        "src long, dst long",
    )
    got = {
        (r.id, r.core_degree) for r in k_core(edges, k=3).collect()
    }
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_k_core_empty_core_and_max_rounds(spark):
    """A bare chain has an empty 2-core (everything peels); a chain
    long enough to out-peel max_rounds must raise, never return a
    non-fixpoint."""
    import pytest

    from mitoscape_spark.operators.graph import k_core

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    assert k_core(chain, k=2).count() == 0
    with pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(chain, k=2, max_rounds=2)
