"""AffectedNodes vs a pure-Python oracle replicating the reference
(``cpp/distance/AffectedNodes.cpp``) queue algorithm verbatim."""

from collections import deque

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.streaming.affected import affected_nodes
from tests.conftest import edges_df

INF = float("inf")


def _adj(edges, directed, reverse=False):
    adj = {}
    for u, v in edges:
        if reverse and directed:
            u, v = v, u
        adj.setdefault(u, []).append(v)
        if not directed:
            adj.setdefault(v, []).append(u)
    return adj


def _bfs_skip(adj, source, skip):
    dist = {source: 0}
    q = deque()
    for v in adj.get(source, []):
        if v == skip or v in dist:
            continue
        dist[v] = 1
        q.append(v)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _pruned(adj, source, old, extra=None):
    new = {source: 0}
    affected = []
    q = deque([source])
    if extra is not None:
        new[extra] = 1
        affected.append(extra)
        q.append(extra)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in new:
                new[v] = new[u] + 1
                if new[v] < old.get(v, INF):
                    q.append(v)
                    affected.append(v)
    return affected, new


def _oracle_addition_undirected(edges, u, v):
    adj = _adj(edges, directed=False)
    old_u = _bfs_skip(adj, u, v)
    old_v = _bfs_skip(adj, v, u)
    aff_u, new_u = _pruned(adj, u, old_u)
    aff_v, new_v = _pruned(adj, v, old_v)
    for w in adj:
        new_u[w] = min(new_u.get(w, INF), old_u.get(w, INF))
        new_v[w] = min(new_v.get(w, INF), old_v.get(w, INF))

    def hist(d):
        h = {}
        for x in d.values():
            if x < INF:
                h[x] = h.get(x, 0) + 1
        return h

    h_old_u, h_new_u = hist(old_u), hist(new_u)
    h_old_v, h_new_v = hist(old_v), hist(new_v)

    def level_imp(new_h, old_h):
        mx = max((j for j in new_h if j >= 1), default=0)

        def f(i):
            return sum(
                (new_h.get(j, 0) - old_h.get(j, 0)) / float(i + j)
                for j in range(1, mx + 1)
            )

        return f

    imp_u = level_imp(h_new_v, h_old_v)
    imp_v = level_imp(h_new_u, h_old_u)
    improvements = {}
    for w in aff_u:
        improvements[w] = imp_u(int(new_v[w])) if new_v[w] >= 1 else 0.0
    for w in aff_v:  # second loop overwrites, like the reference
        improvements[w] = imp_v(int(new_u[w])) if new_u[w] >= 1 else 0.0
    nodes = sorted(set(aff_u) | set(aff_v))
    dists = {w: min(old_u.get(w, INF), old_v.get(w, INF)) for w in nodes}
    return nodes, dists, improvements


def _oracle_removal_undirected(edges, u, v):
    adj = _adj(edges, directed=False)
    old_u = _bfs_skip(adj, u, None)
    old_v = _bfs_skip(adj, v, None)
    aff_u, _ = _pruned(adj, u, old_u, extra=v)
    aff_v, _ = _pruned(adj, v, old_v, extra=u)
    nodes = sorted(set(aff_u) | set(aff_v))
    dists = {w: min(old_u.get(w, INF), old_v.get(w, INF)) for w in nodes}
    return nodes, dists


EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # path
    (0, 7), (7, 8), (8, 9),                           # branch
    (2, 9), (6, 9),                                   # shortcuts
    (0, 6),                                           # the event edge
]


def test_affected_addition_undirected_matches_oracle(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(a, b, 1.0) for a, b in EDGES]))
    got, info = affected_nodes(g, "EDGE_ADDITION", 0, 6)
    rows = {r["node"]: (r["dist"], r["improvement"]) for r in got.collect()}
    nodes, dists, imps = _oracle_addition_undirected(EDGES, 0, 6)
    assert sorted(rows) == nodes
    for w in nodes:
        assert rows[w][0] == dists[w], f"dist mismatch at {w}"
        assert rows[w][1] == pytest.approx(imps[w]), f"improvement mismatch at {w}"
    assert info["closenessU"] > 0 and info["closenessV"] > 0


def test_affected_removal_undirected_matches_oracle(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(a, b, 1.0) for a, b in EDGES]))
    got, _ = affected_nodes(g, "EDGE_REMOVAL", 2, 9)
    rows = {r["node"]: r["dist"] for r in got.collect()}
    nodes, dists = _oracle_removal_undirected(EDGES, 2, 9)
    assert sorted(rows) == nodes
    for w in nodes:
        assert rows[w] == dists[w]


def test_affected_addition_directed(spark):
    # chain 0->1->2->3 plus new edge 3->0: every node's distance TO 0
    # improves through 3
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    g = EdgeGraph.from_edges(
        edges_df(spark, [(a, b, 1.0) for a, b in edges]), directed=True
    )
    got, info = affected_nodes(g, "EDGE_ADDITION", 3, 0)
    rows = {r["node"]: r["dist"] for r in got.collect()}
    # reverse-pruned from v=0 (skipping u=3 as first in-hop gives old
    # in-distances): 3 improves 0->...(new dist 1), then 2, then 1
    assert set(rows) == {1, 2, 3}
    assert "closenessU" in info


def test_affected_rejects_unknown_kind(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0)]))
    with pytest.raises(ValueError):
        affected_nodes(g, "NODE_ADDITION", 0, 1)
