"""Group centralities + Kadabra — pure-Python greedy oracles on hand
graphs (same clean marginal-gain definitions, smallest-id tie-break)."""

from __future__ import annotations

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.group_centrality import (
    approx_group_betweenness,
    group_closeness,
    group_degree,
    kadabra_betweenness,
)

BARBELL = [
    # K4 on 0-3, K4 on 8-11, path 3-4-5-8
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (8, 9), (8, 10), (8, 11), (9, 10), (9, 11), (10, 11),
    (3, 4), (4, 5), (5, 8),
]


@pytest.fixture(scope="module")
def barbell(spark):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in BARBELL], "src long, dst long, weight double"
    )
    return EdgeGraph.from_edges(e)


def _adj(edges, directed=False):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set())
        if not directed:
            adj[b].add(a)
    return adj


def _py_group_degree(edges, k, count_group_nodes=True):
    adj = _adj(edges)
    group, covered = [], set()
    for _ in range(k):
        best = None
        for u in sorted(adj):
            if u in group:
                continue
            gain = len(adj[u] - covered)
            if count_group_nodes:
                gain += 0 if u in covered else 1
            else:
                gain -= 1 if any(v in group for v in adj[u]) else 0
            if best is None or gain > best[0]:
                best = (gain, u)
        group.append(best[1])
        covered |= adj[best[1]] | {best[1]}
    score = len(covered - set(group)) + (k if count_group_nodes else 0)
    return sorted(group), score


def _py_bfs(adj, sources):
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def _py_group_closeness(edges, k):
    adj = _adj(edges)
    n = len(adj)
    # seed: top closeness (exact), smallest id on ties
    best = None
    for u in sorted(adj):
        dist = _py_bfs(adj, [u])
        far = sum(dist.values())
        score = (n - 1) / far if far else 0.0
        if best is None or score > best[0]:
            best = (score, u)
    group = [best[1]]
    d_s = _py_bfs(adj, group)
    for _ in range(1, k):
        best = None
        for x in sorted(adj):
            if x in group:
                continue
            dx = _py_bfs(adj, [x])
            gain = sum(
                max(0, d_s.get(v, n) - dx[v]) for v in dx
            )
            if best is None or gain > best[0]:
                best = (gain, x)
        group.append(best[1])
        dx = _py_bfs(adj, [best[1]])
        for v, dv in dx.items():
            d_s[v] = min(d_s.get(v, n), dv)
    return sorted(group), float(sum(d_s.values()))


def test_group_degree_star_plus_edge(spark):
    edges = [(0, i) for i in range(1, 6)] + [(6, 7)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    res = group_degree(g, k=2, count_group_nodes=True)
    assert res.group == [0, 6]
    # covered \ group = {1..5, 7} = 6, +k
    assert res.score == 8


def test_group_degree_matches_python_greedy(barbell):
    res = group_degree(barbell, k=3, count_group_nodes=True)
    og, os_ = _py_group_degree(BARBELL, 3, True)
    assert res.group == og
    assert res.score == os_


def test_group_degree_without_group_nodes(barbell):
    res = group_degree(barbell, k=2, count_group_nodes=False)
    og, os_ = _py_group_degree(BARBELL, 2, False)
    assert res.group == og
    assert res.score == os_


def test_group_closeness_path_graph(spark):
    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(6)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    res = group_closeness(g, k=1)
    assert res.group == [3]
    assert res.farness == pytest.approx(1 + 2 + 3 + 1 + 2 + 3)


def test_group_closeness_matches_python_greedy(barbell):
    res = group_closeness(barbell, k=3)
    og, ofar = _py_group_closeness(BARBELL, 3)
    assert res.group == og
    assert res.farness == pytest.approx(ofar)
    # 10 nodes in the fixture (0-5, 8-11)
    assert res.score == pytest.approx((10 - 3) / ofar)


def test_group_closeness_depth_cap(spark):
    # H-capped variant seeds from the max-degree node and still returns
    # a k-group
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in BARBELL], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    res = group_closeness(g, k=2, H=2)
    assert len(res.group) == 2
    assert res.farness > 0


def test_approx_group_betweenness_covers_bridge(barbell):
    res = approx_group_betweenness(barbell, k=2, epsilon=0.35, seed=3)
    assert len(res.group) == 2
    assert res.samples > 0
    # separators carry every cross-clique path; the 2-group must hit them
    assert set(res.group) & {3, 4, 5, 8}
    # deterministic under the same seed
    res2 = approx_group_betweenness(barbell, k=2, epsilon=0.35, seed=3)
    assert res2.group == res.group and res2.covered_paths == res.covered_paths


def test_kadabra_separates_bridge_from_corners(barbell):
    scores = {
        r["node"]: (r["score"], r["half_width"])
        for r in kadabra_betweenness(
            barbell, err=0.35, delta=0.3, seed=11, batch=12
        ).collect()
    }
    assert set(scores) == {0, 1, 2, 3, 4, 5, 8, 9, 10, 11}
    # clique corners have exactly zero betweenness; the RB estimator is
    # exactly zero for them in every sample
    for c in (0, 1, 2, 9, 10, 11):
        assert scores[c][0] == pytest.approx(0.0)
    # the central bridge nodes see most path mass
    assert scores[4][0] > 0.1
    assert scores[5][0] > 0.1
    # scores are normalized fractions with finite bounds
    for s, hw in scores.values():
        assert 0.0 <= s <= 1.0
        assert hw > 0.0
