"""adamic_adar_scores vs hand-computed scores on a known graph."""

import math

import pytest

from mitoscape_spark.operators.graph import adamic_adar_scores


def test_adamic_adar_hand_graph(spark):
    # path graph 1-2-3 plus hub 9 connected to 1, 3, 4:
    # pair (1,3): common {2 (deg 2), 9 (deg 3)} -> 1/ln2 + 1/ln3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 9), (3, 9), (4, 9)], "u long, v long"
    )
    got = {
        (r["u"], r["v"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar_scores(edges, min_common=2).collect()
    }
    # (1,3): common {2 (deg 2), 9 (deg 3)}; (2,9): common {1, 3} (deg 2)
    want_13 = round(1 / math.log(2) + 1 / math.log(3), 6)
    want_29 = round(2 / math.log(2), 6)
    assert got == {
        (1, 3): (2, pytest.approx(want_13, abs=1e-6)),
        (2, 9): (2, pytest.approx(want_29, abs=1e-6)),
    }


def test_existing_edges_excluded(spark):
    # triangle + pendant: (1,2),(2,3),(1,3) all exist — the pair
    # (1,3) has a common neighbor but IS an edge, so nothing scores
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "u long, v long"
    )
    assert adamic_adar_scores(edges, min_common=1).count() == 0


def test_min_common_floor(spark):
    # star: center 0 with leaves 1..4 — every leaf pair shares only
    # the center, so min_common=2 drops all candidates
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "u long, v long"
    )
    assert adamic_adar_scores(edges, min_common=2).count() == 0
    assert adamic_adar_scores(edges, min_common=1).count() == 6
