"""CutClustering — Flake–Tarjan min-cut communities.

Reference: ``cpp/community/CutClustering.{h,cpp}`` (Flake, Tarjan,
Tsioutsiouliklis, *Graph Clustering and Minimum Cut Trees*, Internet
Math. 1(4), 2003).  Semantics reproduced:

* Augment the graph with an artificial sink ``t`` connected to every
  node by an edge of weight ``alpha`` (``CutClustering.cpp:21-30``).
* Visit nodes in decreasing-degree order (ties: ascending id — the
  reference's bucket sort is stable over ``forNodes`` order,
  ``CutClustering.cpp:36-60``); for each still-unclustered node ``u``,
  compute the min ``u``–``t`` cut with Edmonds–Karp and assign every
  node of the source side to cluster rep ``u``, absorbing earlier
  assignments exactly like ``CutClustering.cpp:62-75``.
* ``alpha = 0`` yields one cluster per connected component;
  ``alpha >=`` max edge weight yields singletons.

Spark shape: one connected-components pass partitions the problem, then
each component's induced subgraph runs the sequential Flake–Tarjan loop
inside a single ``applyInPandas`` task — components are processed in
parallel, and all flow arithmetic stays in one Arrow batch per
component.  SCALE BOUND (documented, same class as exact betweenness):
a component must fit one task.  Real deployments run this on moderate
subgraphs (the reference itself is a single-node in-memory loop and
warns the implementation "hasn't been optimized for performance",
``CutClustering.h:40-48``); for web-scale graphs with a giant
component, sparsify or restrict to a community first.
"""

from __future__ import annotations

import sys
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.components import connected_components

_T = -1  # artificial sink id (node ids are non-negative longs)


def _min_cut_source_set(cap: dict, s: int) -> set:
    """Edmonds–Karp max flow s→t on the residual dict-of-dicts ``cap``
    (mutated), then the residual-reachable set from ``s``."""
    while True:
        # BFS for a shortest augmenting path
        parent = {s: None}
        q = deque([s])
        found = False
        while q and not found:
            u = q.popleft()
            for v, c in cap[u].items():
                if c > 1e-12 and v not in parent:
                    parent[v] = u
                    if v == _T:
                        found = True
                        break
                    q.append(v)
        if not found:
            break
        # bottleneck + augment
        path = []
        v = _T
        while parent[v] is not None:
            u = parent[v]
            path.append((u, v))
            v = u
        bottleneck = min(cap[u][v] for u, v in path)
        for u, v in path:
            cap[u][v] -= bottleneck
            cap[v][u] = cap[v].get(u, 0.0) + bottleneck
    # residual reachability from s = minimal source side
    seen = {s}
    q = deque([s])
    while q:
        u = q.popleft()
        for v, c in cap[u].items():
            if c > 1e-12 and v not in seen and v != _T:
                seen.add(v)
                q.append(v)
    return seen


def _flake_tarjan_component(pdf: pd.DataFrame) -> pd.DataFrame:
    alpha = float(pdf["alpha"].iloc[0])
    adj: dict[int, dict[int, float]] = {}
    deg: dict[int, int] = {}

    def ensure(u):
        if u not in adj:
            adj[u] = {_T: alpha}
            deg[u] = 0

    for u, v, w in zip(pdf["src"], pdf["dst"], pdf["weight"]):
        u, v, w = int(u), int(v), float(w)
        ensure(u)
        ensure(v)
        if u == v:
            continue  # self-loops never affect a u-t cut
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
        deg[u] += 1
        deg[v] += 1
    adj[_T] = {}  # sink: no outgoing capacity needed for s→t flow

    result: dict[int, int] = {}
    for u in sorted(adj, key=lambda x: (-deg.get(x, 0), x)):
        if u == _T or u in result:
            continue
        # fresh residual copy per flow run (reference re-runs EdmondsKarp
        # on the pristine augmented graph each time)
        cap = {x: dict(nbrs) for x, nbrs in adj.items()}
        for v in _min_cut_source_set(cap, u):
            result[v] = u
    return pd.DataFrame(
        {"node": list(result.keys()), "label": list(result.values())}
    )


def cut_clustering(graph: EdgeGraph, alpha: float) -> DataFrame:
    """(node, label) — label = highest-degree representative of the
    min-cut cluster containing the node."""
    g = graph.to_undirected() if graph.directed else graph
    comp = connected_components(g).withColumnRenamed("label", "comp")
    tagged = (
        g.edges.join(comp.withColumnRenamed("node", "src"), "src")
        .withColumn("alpha", F.lit(float(alpha)))
        .select("comp", "src", "dst", "weight", "alpha")
    )
    return tagged.groupBy("comp").applyInPandas(
        _flake_tarjan_component, "node long, label long"
    )
