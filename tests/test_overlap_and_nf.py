"""ReverseBFS, NeighborhoodFunctionHeuristic, HashingOverlapper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.bfs import (
    bfs,
    neighborhood_function_heuristic,
    reverse_bfs,
)
from networkit_spark.operators.overlap import hashing_overlapper


def test_reverse_bfs_directed_path(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = EdgeGraph.from_edges(e, directed=True)
    fwd = {r["node"]: r["dist"] for r in bfs(g, 0).collect()}
    rev = {r["node"]: r["dist"] for r in reverse_bfs(g, 3).collect()}
    assert fwd == {0: 0, 1: 1, 2: 2, 3: 3}
    assert rev == {3: 0, 2: 1, 1: 2, 0: 3}


def test_reverse_bfs_undirected_equals_bfs(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    a = sorted(map(tuple, bfs(g, 2).collect()))
    b = sorted(map(tuple, reverse_bfs(g, 2).collect()))
    assert a == b


@pytest.fixture(scope="module")
def ring(spark):
    n = 12
    e = spark.createDataFrame(
        [(i, (i + 1) % n, 1.0) for i in range(n)],
        "src long, dst long, weight double",
    )
    return EdgeGraph.from_edges(e)


def test_nf_heuristic_full_sample_matches_exact(ring):
    """With nsamples = n the sampled middle counts are exact, so the
    heuristic agrees with the exact neighborhood function everywhere
    except its anchored endpoints (which are exact by construction)."""
    heur = {
        r["h"]: r["reachable_pairs"]
        for r in neighborhood_function_heuristic(ring, nsamples=12).collect()
    }
    n = 12
    # ring of 12: at h, each node reaches 2h others (h <= 5), 11 at h=6
    # (the heuristic, like the reference, excludes self-pairs)
    for h in range(1, 6):
        assert heur[h] == n * 2 * h
    assert heur[6] == n * (n - 1)


def test_nf_heuristic_random_strategy(ring):
    heur = {
        r["h"]: r["reachable_pairs"]
        for r in neighborhood_function_heuristic(
            ring, nsamples=6, strategy="random", seed=7
        ).collect()
    }
    # monotone cumulative, anchored at 2m and n(n-1)
    vals = [heur[h] for h in sorted(heur)]
    assert vals == sorted(vals)
    assert vals[0] == 2 * 12
    assert vals[-1] == 12 * 11


def test_nf_heuristic_rejects_bad_strategy(ring):
    with pytest.raises(ValueError):
        neighborhood_function_heuristic(ring, nsamples=2, strategy="bogus")


def test_hashing_overlapper_common_refinement(spark):
    p1 = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20)],
        "node long, label long",
    )
    p2 = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 2), (4, 3), (5, 3)],
        "node long, label long",
    )
    out = {r["node"]: r["label"] for r in hashing_overlapper([p1, p2]).collect()}
    # blocks: {0,1}, {2}, {3}, {4,5}
    assert out[0] == out[1]
    assert out[4] == out[5]
    groups = {out[0], out[2], out[3], out[4]}
    assert len(groups) == 4
    # dense ids 0..3
    assert set(out.values()) == {0, 1, 2, 3}


def test_hashing_overlapper_three_inputs_and_missing_nodes(spark):
    p1 = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "node long, label long")
    p2 = spark.createDataFrame([(0, 5), (1, 6), (2, 6)], "node long, label long")
    p3 = spark.createDataFrame([(0, 9), (1, 9)], "node long, label long")
    out = {r["node"]: r["label"] for r in hashing_overlapper([p1, p2, p3]).collect()}
    # node 2 missing from p3 -> dropped; 0 and 1 differ in p2
    assert set(out) == {0, 1}
    assert out[0] != out[1]


def test_hashing_overlapper_single_input_passthrough(spark):
    p1 = spark.createDataFrame([(0, 3), (1, 4)], "node long, label long")
    out = {r["node"]: r["label"] for r in hashing_overlapper([p1]).collect()}
    assert out == {0: 3, 1: 4}
