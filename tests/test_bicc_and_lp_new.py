"""BiconnectedComponents / articulation points + OLP + LPPotts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.bicc import (
    articulation_points,
    biconnected_components,
    biconnected_edge_components,
    component_count_per_node,
)
from networkit_spark.operators.lp_variants import lp_potts, olp

from tests.conftest import edges_df


# ---------------------------------------------------------------------------
# brute-force oracles (driver-side, test-only)
# ---------------------------------------------------------------------------


def _bicc_oracle(edges):
    """Hopcroft-Tarjan (iterative) over a python adjacency — returns the
    set of frozensets of edges per biconnected component."""
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    comps = []
    counter = [0]
    for root in sorted(adj):
        if root in disc:
            continue
        estack: list[tuple[int, int]] = []
        stack = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = counter[0]
        counter[0] += 1
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v not in disc:
                    estack.append((u, v))
                    disc[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append((v, u, iter(adj[v])))
                    advanced = True
                    break
                elif v != parent and disc[v] < disc[u]:
                    estack.append((u, v))
                    low[u] = min(low[u], disc[v])
            if advanced:
                continue
            stack.pop()
            if stack:
                p = stack[-1][0]
                low[p] = min(low[p], low[u])
                if low[u] >= disc[p]:
                    comp = set()
                    while estack and disc[estack[-1][0]] >= disc[u]:
                        a, b = estack.pop()
                        comp.add((min(a, b), max(a, b)))
                    if estack and {estack[-1][0], estack[-1][1]} == {p, u}:
                        a, b = estack.pop()
                        comp.add((min(a, b), max(a, b)))
                    if comp:
                        comps.append(frozenset(comp))
    return set(comps)


def _edge_partition(spark_rows):
    by_comp: dict[int, set] = {}
    for r in spark_rows:
        by_comp.setdefault(r["comp"], set()).add((r["a"], r["b"]))
    return {frozenset(s) for s in by_comp.values()}


FIXTURES = [
    # two triangles sharing node 2 → articulation {2}
    [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)],
    # path: every edge a bridge
    [(0, 1), (1, 2), (2, 3)],
    # single cycle: one component, no articulation
    [(0, 1), (1, 2), (2, 3), (0, 3)],
    # K4 + pendant
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4)],
    # two disconnected pieces (multi-root forest)
    [(0, 1), (1, 2), (0, 2), (10, 11)],
    # barbell: triangle - bridge - triangle
    [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
    # theta graph: two vertices joined by three internally disjoint paths
    [(0, 1), (1, 5), (0, 2), (2, 3), (3, 5), (0, 4), (4, 5)],
]


@pytest.mark.parametrize("edges", FIXTURES)
def test_bicc_matches_tarjan(spark, edges):
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _edge_partition(biconnected_edge_components(g).collect())
    want = _bicc_oracle(edges)
    assert got == want


def test_articulation_points_and_cover(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    arts = sorted(r["node"] for r in articulation_points(g).collect())
    assert arts == [2]
    cnt = {r["node"]: r["n_bicomps"] for r in component_count_per_node(g).collect()}
    assert cnt == {0: 1, 1: 1, 2: 2, 3: 1, 4: 1}
    cover = biconnected_components(g).collect()
    # node 2 appears in both components, everyone else in one
    per_node = {}
    for r in cover:
        per_node.setdefault(r["node"], set()).add(r["comp"])
    assert len(per_node[2]) == 2 and all(
        len(per_node[u]) == 1 for u in (0, 1, 3, 4)
    )


def test_bicc_brute_force_random(spark):
    """Deterministic pseudo-random sparse graph vs the Tarjan oracle."""
    n = 40
    edges = []
    x = 12345
    for i in range(90):
        x = (x * 1103515245 + 12345) % (1 << 31)
        u = x % n
        x = (x * 1103515245 + 12345) % (1 << 31)
        v = x % n
        if u != v:
            edges.append((min(u, v), max(u, v)))
    edges = sorted(set(edges))
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _edge_partition(biconnected_edge_components(g).collect())
    assert got == _bicc_oracle(edges)


# ---------------------------------------------------------------------------
# LPPotts
# ---------------------------------------------------------------------------


def test_lp_potts_two_cliques(spark):
    edges = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    edges += [(u, v) for u in range(4, 8) for v in range(u + 1, 8)]
    edges.append((3, 4))
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    lab = {r["node"]: r["label"] for r in lp_potts(g, alpha=0.3, max_iter=10).collect()}
    assert len({lab[u] for u in range(4)}) == 1
    assert len({lab[u] for u in range(4, 8)}) == 1
    assert lab[0] != lab[4]


def test_lp_potts_alpha_zero_is_plain_lp(spark):
    """alpha=0 removes the global penalty → one sweep equals PLP's
    neighbor-majority with smallest-label tie-break."""
    edges = [(0, 1), (0, 2), (0, 3)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    lab = {
        r["node"]: r["label"]
        for r in lp_potts(g, alpha=0.0, theta=0.0, max_iter=1).collect()
    }
    # hub 0: neighbors all distinct → smallest label 1; leaves adopt 0
    assert lab == {0: 1, 1: 0, 2: 0, 3: 0}


def test_lp_potts_global_penalty_changes_argmax(spark):
    """A label that is globally popular loses to a locally-tied rarer
    one once alpha is large enough — the Potts discriminator."""
    # star around 9 with two neighbor labels after sweep 1 is fiddly;
    # instead hand-build via base_clustering: node 0 sees 2×label A and
    # 2×label B, but A has 4 global carriers, B has 2.
    edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    base = g.spark.createDataFrame(
        [(0, 0), (1, 100), (2, 100), (3, 200), (4, 200), (5, 100), (6, 100)],
        "node long, label long",
    )
    # alpha=0: tie between 100 and 200 → smallest label 100 wins
    lab0 = {
        r["node"]: r["label"]
        for r in lp_potts(
            g, alpha=0.0, theta=0.0, max_iter=1, base_clustering=base
        ).collect()
    }
    assert lab0[0] == 100
    # alpha=0.5: w(100) = 2 − 0.5·(4−2) = 1 < w(200) = 2 − 0.5·(2−2) = 2
    lab = {
        r["node"]: r["label"]
        for r in lp_potts(
            g, alpha=0.5, theta=0.0, max_iter=1, base_clustering=base
        ).collect()
    }
    assert lab[0] == 200


# ---------------------------------------------------------------------------
# OLP
# ---------------------------------------------------------------------------


def test_olp_two_cliques_overlap(spark):
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    edges += [(u, v) for u in range(5, 10) for v in range(u + 1, 10)]
    edges.append((4, 5))
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    cover = olp(g, k=2, max_iter=6, min_size=3).collect()
    per_node: dict[int, set] = {}
    for r in cover:
        per_node.setdefault(r["node"], set()).add(r["label"])
    # every node covered, ≤ k labels each
    assert set(per_node) == set(range(10))
    assert all(len(s) <= 2 for s in per_node.values())
    # each clique shares a dominant label, and they differ
    left = set.intersection(*(per_node[u] for u in range(4)))
    right = set.intersection(*(per_node[u] for u in range(6, 10)))
    assert left and right and left != right


def test_olp_deterministic_and_min_size(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    a = sorted((r["node"], r["label"]) for r in olp(g, k=3, max_iter=4, min_size=1).collect())
    b = sorted((r["node"], r["label"]) for r in olp(g, k=3, max_iter=4, min_size=1).collect())
    assert a == b
    # a min_size larger than any community empties the cover
    assert olp(g, k=3, max_iter=4, min_size=10).count() == 0
