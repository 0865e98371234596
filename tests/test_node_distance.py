"""AlgebraicDistance vs an exact NumPy replay (same hash init) and
CommuteTimeDistance vs the Laplacian pseudo-inverse."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.node_distance import (
    algebraic_distance_edge_scores,
    algebraic_distance_loads,
    commute_time_distance,
)

from .conftest import edges_df

EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]


def _u01(*parts):
    s = ":".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / float(16**13)


def test_algebraic_distance_matches_numpy_replay(spark):
    n, K, iters, omega, seed = 7, 4, 12, 0.5, 42
    g = EdgeGraph.from_edges(edges_df(spark, EDGES))
    adj = {i: set() for i in range(n)}
    for a, b in EDGES:
        adj[a].add(b)
        adj[b].add(a)

    loads = np.array([[_u01(seed, "ad", u, s) for s in range(K)] for u in range(n)])
    for _ in range(iters):
        new = np.empty_like(loads)
        for u in range(n):
            avg = np.mean([loads[v] for v in adj[u]], axis=0)
            new[u] = (1 - omega) * loads[u] + omega * avg
        loads = new
    mn, mx = loads.min(axis=0), loads.max(axis=0)
    loads = (mn - loads) / (mn - mx)

    got = algebraic_distance_loads(
        g, num_systems=K, num_iterations=iters, omega=omega, seed=seed
    ).collect()
    for r in got:
        assert r["load"] == pytest.approx(loads[r["node"], r["sys"]], abs=1e-12)

    scores = {
        (r["src"], r["dst"]): r["score"]
        for r in algebraic_distance_edge_scores(
            g, num_systems=K, num_iterations=iters, omega=omega, seed=seed
        ).collect()
    }
    for a, b in EDGES:
        want = np.max(np.abs(loads[a] - loads[b]))
        assert scores[(a, b)] == pytest.approx(want, abs=1e-12)


def test_algebraic_distance_dense_cluster_closer(spark):
    # two triangles joined by one bridge: intra-triangle distances are
    # smaller than the bridge distance (the operator's defining property)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    s = {
        (r["src"], r["dst"]): r["score"]
        for r in algebraic_distance_edge_scores(g, num_systems=8, num_iterations=30).collect()
    }
    intra = max(v for k, v in s.items() if k != (2, 3))
    assert s[(2, 3)] > intra


def test_commute_time_distance_vs_pinv(spark):
    n = 7
    g = EdgeGraph.from_edges(edges_df(spark, EDGES))
    L = np.zeros((n, n))
    for a, b in EDGES:
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    Lp = np.linalg.pinv(L)
    vol = 2.0 * len(EDGES)

    pairs = [(0, 6), (1, 4), (0, 2), (2, 5)]
    pdf = spark.createDataFrame(pairs, "u long, v long")
    got = {(r["u"], r["v"]): r["ectd"] for r in commute_time_distance(g, pdf).collect()}
    for u, v in pairs:
        reff = Lp[u, u] - 2 * Lp[u, v] + Lp[v, v]
        want = np.sqrt(reff * vol)
        assert got[(u, v)] == pytest.approx(want, rel=1e-6), (u, v)


def test_distance_family_wrappers(spark):
    from networkit_spark.operators.node_distance import (
        adamic_adar_distance,
        graph_distance,
        hop_plot,
        jaccard_distance,
    )
    import math

    # K3 + pendant (2-3): edge (0,1) has common neighbor 2 (deg 3)
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)]))
    jd = {(r["src"], r["dst"]): r["distance"] for r in jaccard_distance(g).collect()}
    assert abs(jd[(0, 1)] - (1.0 - 1.0 / 3.0)) < 1e-12
    aad = {(r["src"], r["dst"]): r["distance"] for r in adamic_adar_distance(g).collect()}
    assert abs(aad[(0, 1)] - math.log(3)) < 1e-12  # 1 / (1/ln 3)
    assert aad[(2, 3)] is None  # no common neighbor → reference's 1/0
    assert graph_distance(g, 0, 3) == 2.0
    assert graph_distance(g, 0, 3, weighted=True) == 2.0
    hp = {r["h"]: r["fraction"] for r in hop_plot(g, max_h=4).collect()}
    assert abs(hp[0] - 4.0 / 16.0) < 1e-12
    assert abs(hp[2] - 1.0) < 1e-12  # diameter 2: everything reached


def test_incomplete_dijkstra_ball(spark):
    """IncompleteDijkstra ≡ sssp restricted to dist < bound (path graph
    with weights: 0-1-2-3-4, w=1 each, bound 2.5 → {0,1,2})."""
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.bfs import incomplete_dijkstra, sssp

    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(6)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    got = {r["node"]: r["dist"] for r in incomplete_dijkstra(g, [0], 2.5).collect()}
    ref = {
        r["node"]: r["dist"]
        for r in sssp(g, 0).collect()
        if r["dist"] < 2.5
    }
    assert got == ref == {0: 0.0, 1: 1.0, 2: 2.0}
    # multi-source: min over sources
    got2 = {r["node"]: r["dist"] for r in incomplete_dijkstra(g, [0, 6], 1.5).collect()}
    assert got2 == {0: 0.0, 1: 1.0, 6: 0.0, 5: 1.0}


def test_all_simple_paths_diamond(spark):
    """Diamond 0-{1,2}-3 plus chord 1-2: paths 0→3 with cutoff 3."""
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.bfs import all_simple_paths

    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (1, 2, 1.0)],
        "src long, dst long, weight double",
    )
    g = EdgeGraph.from_edges(e)
    paths = {tuple(r["path"]) for r in all_simple_paths(g, 0, 3, cutoff=3).collect()}
    assert paths == {
        (0, 1, 3),
        (0, 2, 3),
        (0, 1, 2, 3),
        (0, 2, 1, 3),
    }
    short = {tuple(r["path"]) for r in all_simple_paths(g, 0, 3, cutoff=2).collect()}
    assert short == {(0, 1, 3), (0, 2, 3)}


def test_dfs_preorder(spark):
    """DFSfrom preorder on a small tree + cross edge: matches the
    recursive smallest-neighbor-first walk."""
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.bfs import dfs_from

    #    0 - 1 - 3
    #    |   |
    #    2   4      plus cross edge 3-4, isolated-from-source node pair 8-9
    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (1, 4, 1.0), (3, 4, 1.0),
         (8, 9, 1.0)],
        "src long, dst long, weight double",
    )
    g = EdgeGraph.from_edges(e)
    rows = sorted(dfs_from(g, 0).collect(), key=lambda r: r["ord"])
    walk = [(r["node"], r["parent"]) for r in rows]
    # recursive preorder, smallest neighbor first:
    # 0 → 1 → 3 → 4 (via 3), backtrack, → 2
    assert walk == [(0, None), (1, 0), (3, 1), (4, 3), (2, 0)]
