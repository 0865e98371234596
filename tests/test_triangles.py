"""Triangle counting tests (FIXTURES.md F3) — exact integer counts."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.triangles import (
    global_clustering_coefficient,
    local_clustering_coefficient,
    node_triangle_counts,
    total_triangles,
    triangle_counts,
)

from .conftest import edges_df
from .oracles import lcc_oracle, triangles_oracle

K4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
TWO_TRI = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]


def test_k4(spark):
    g = EdgeGraph.from_edges(edges_df(spark, K4))
    assert total_triangles(g) == 4
    per = {(r["src"], r["dst"]): r["triangles"] for r in triangle_counts(g).collect()}
    assert all(v == 2 for v in per.values()) and len(per) == 6


def test_two_triangles_sharing_edge(spark):
    g = EdgeGraph.from_edges(edges_df(spark, TWO_TRI))
    per = {(r["src"], r["dst"]): r["triangles"] for r in triangle_counts(g).collect()}
    assert per[(1, 2)] == 2
    assert per[(0, 1)] == per[(0, 2)] == per[(1, 3)] == per[(2, 3)] == 1
    assert total_triangles(g) == 2


def test_self_loops_ignored(spark):
    g = EdgeGraph.from_edges(edges_df(spark, TWO_TRI + [(1, 1), (3, 3)]))
    assert total_triangles(g) == 2


def test_oracle_random_graph(spark):
    """Deterministic pseudo-random graph vs brute-force oracle."""
    rng = np.random.RandomState(42)
    n = 40
    edges = list({tuple(sorted(p)) for p in rng.randint(0, n, size=(220, 2)) if p[0] != p[1]})
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    per_edge, per_node, total = triangles_oracle(n, edges)
    assert total_triangles(g) == total
    got_edge = {(r["src"], r["dst"]): r["triangles"] for r in triangle_counts(g).collect()}
    assert got_edge == per_edge
    got_node = {r["node"]: r["triangles"] for r in node_triangle_counts(g).collect()}
    for v, t in got_node.items():
        assert t == per_node[v]


def test_lcc_golden(spark):
    """c(u) = 2·tri(u)/(deg(u)(deg(u)-1)) (LocalClusteringCoefficient.cpp:81-82)."""
    g = EdgeGraph.from_edges(edges_df(spark, TWO_TRI))
    got = {r["node"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    want = lcc_oracle(4, TWO_TRI)
    for v in range(4):
        assert abs(got[v] - want[v]) < 1e-12
    # K4: every LCC = 1, global = 1
    k4 = EdgeGraph.from_edges(edges_df(spark, K4))
    assert all(abs(r["lcc"] - 1.0) < 1e-12 for r in local_clustering_coefficient(k4).collect())
    assert abs(global_clustering_coefficient(k4) - 1.0) < 1e-12


def test_no_triangles(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    assert total_triangles(g) == 0
    assert all(r["triangles"] == 0 for r in triangle_counts(g).collect())
