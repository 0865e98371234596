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


def test_approx_avg_local_cc_within_ci(spark):
    """approxAvgLocal (ClusteringCoefficient.cpp:133-165): the sampled
    closed-wedge fraction must sit within a 4-sigma binomial CI of the
    exact eligible-node average on fixtures at both extremes."""
    from networkit_spark.operators.triangles import approx_avg_local_cc

    # K4: every wedge closes → exact 1.0, estimator must be exactly 1.0
    g = EdgeGraph.from_edges(edges_df(spark, K4))
    assert approx_avg_local_cc(g, trials=200, seed=1) == pytest.approx(1.0)
    # star: no wedge closes → exactly 0.0
    star = [(0, i) for i in range(1, 9)]
    gs = EdgeGraph.from_edges(edges_df(spark, star))
    assert approx_avg_local_cc(gs, trials=200, seed=1) == pytest.approx(0.0)
    # mixed fixture: CI check against the exact avg over deg>=2 nodes
    g2 = EdgeGraph.from_edges(edges_df(spark, TWO_TRI + [(3, 4), (4, 5)]))
    exact = {r["node"]: r["lcc"] for r in local_clustering_coefficient(g2).collect()}
    deg = {}
    for u, v in TWO_TRI + [(3, 4), (4, 5)]:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    elig = [n for n, d in deg.items() if d >= 2]
    mean = sum(exact[n] for n in elig) / len(elig)
    trials = 3000
    est = approx_avg_local_cc(g2, trials=trials, seed=7)
    sigma = (mean * (1 - mean) / trials) ** 0.5
    assert abs(est - mean) <= 4 * sigma + 1e-9


def test_approx_global_cc_within_ci(spark):
    """approxGlobal (ClusteringCoefficient.cpp:221-281): wedge-weighted
    sampling estimates 3·triangles/wedges; CI check on a skewed fixture
    (hub wedges dominate, so uniform sampling would be biased — this
    asserts the weighted sampler specifically)."""
    from networkit_spark.operators.triangles import approx_global_cc

    # hub 0 with 10 leaves (open wedges) + a triangle 10-11-12
    edges = [(0, i) for i in range(1, 11)] + [(10, 11), (11, 12), (10, 12)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    exact = global_clustering_coefficient(g)
    trials = 4000
    est = approx_global_cc(g, trials=trials, seed=11)
    sigma = (exact * (1 - exact) / trials) ** 0.5
    assert abs(est - exact) <= 4 * sigma + 1e-9
    # determinism: same seed, same estimate
    assert approx_global_cc(g, trials=500, seed=3) == approx_global_cc(g, trials=500, seed=3)


def test_maximal_cliques_brute_force_oracle(spark):
    """Distributed ELS vs an itertools brute force on a mixed graph."""
    import itertools

    from networkit_spark.operators.cliques import max_clique, maximal_cliques

    # K4 (0-3) + pendant (3,4) + square (5,6,7,8) + bridging edge (4,5)
    ed = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    ed += [(3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (5, 8)]
    g = EdgeGraph.from_edges(edges_df(spark, ed))

    got = {tuple(r["nodes"]) for r in maximal_cliques(g).collect()}

    nodes = sorted({x for e in ed for x in e})
    eset = {tuple(sorted(e)) for e in ed}

    def is_clique(c):
        return all(tuple(sorted(p)) in eset for p in itertools.combinations(c, 2))

    want = set()
    for k in range(1, len(nodes) + 1):
        for c in itertools.combinations(nodes, k):
            if is_clique(c) and not any(
                is_clique(tuple(sorted(set(c) | {x}))) for x in nodes if x not in c
            ):
                want.add(c)
    assert got == want
    mc = max_clique(g).collect()[0]
    assert mc["size"] == 4 and sorted(mc["nodes"]) == [0, 1, 2, 3]
    # every clique appears exactly once (no duplicate emission)
    all_rows = maximal_cliques(g).collect()
    assert len(all_rows) == len(got)


def test_maximal_cliques_hub_star(spark):
    """Hub of degree 200 with an attached K5: the triangle-based ego
    rows keep the hub task LINEAR in degree (no N(v)×N(v) wedge join),
    and the output is still exact."""
    from networkit_spark.operators.cliques import maximal_cliques

    ed = [(0, i) for i in range(1, 201)]
    ed += [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]  # K5 on 1..5
    g = EdgeGraph.from_edges(edges_df(spark, ed))
    got = {tuple(r["nodes"]) for r in maximal_cliques(g).collect()}
    want = {tuple(range(0, 6))} | {(0, i) for i in range(6, 201)}
    assert got == want


def test_bron_kerbosch_iterative_depth():
    """Clique depth beyond the Python recursion limit: K1200 — the old
    recursive BK would RecursionError, the explicit stack must not."""
    from networkit_spark.operators.cliques import _bron_kerbosch_pivot

    n = 1200  # > the CPython default recursion limit of 1000
    full = frozenset(range(n))
    adj = {v: full - {v} for v in range(n)}
    out = []
    _bron_kerbosch_pivot(adj, {0}, set(range(1, n)), set(), out)
    assert out == [list(range(n))]
