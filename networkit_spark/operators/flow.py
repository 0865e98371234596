"""EdmondsKarp max-flow / min-cut — SURVEY §2.7's one flow surface
(``cpp/flow/EdmondsKarp.{h,cpp}``), previously a documented non-goal.

Augmenting-path search is inherently sequential (each augmentation
depends on the last), so the Spark shape mirrors CutClustering's
stance (``cutclustering.py:18-27``): the DISTRIBUTED part is scoping —
one frontier-BFS restricts the problem to the source's connected
component and ships only that induced subgraph into a single Arrow
batch — and the flow arithmetic runs driver-side over dicts, exactly
the reference's in-memory loop.  SCALE BOUND (documented): the
component must fit the driver; at web scale run it on a community or
sparsified subgraph, as with exact betweenness.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


class EdmondsKarpResult:
    """``EdmondsKarp`` accessors: ``max_flow`` (``getMaxFlow``),
    ``source_set()`` (``getSourceSet``), ``flows()`` (``getFlow`` per
    canonical edge, signed src→dst)."""

    def __init__(self, spark, max_flow: float, source_side: set, flows: list):
        self._spark = spark
        self.max_flow = max_flow
        self._source_side = sorted(source_side)
        self._flows = flows

    def source_set(self) -> DataFrame:
        return self._spark.createDataFrame(
            [(int(n),) for n in self._source_side], "node long"
        )

    def flows(self) -> DataFrame:
        return self._spark.createDataFrame(
            [(int(u), int(v), float(f)) for u, v, f in self._flows],
            "src long, dst long, flow double",
        )


def edmonds_karp(graph: EdgeGraph, source: int, sink: int) -> EdmondsKarpResult:
    """Max s–t flow on the (undirected-capacity) graph, reference
    semantics: each undirected edge carries its weight as capacity in
    BOTH directions (``EdmondsKarp.cpp`` residual init)."""
    from networkit_spark.operators.bfs import bfs

    # capacities are bidirectional (reference residual init), so the
    # relevant component is the UNDIRECTED one — a directed-BFS scope
    # would drop back-edges like 2->1 when only 0->1 is forward-reachable
    und = (
        EdgeGraph(graph.edges, directed=False, weighted=graph.weighted)
        if graph.directed
        else graph
    )
    reach = bfs(und, source).select("node")
    comp_edges = (
        graph.edges.join(reach.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "weight")
        .collect()
    )
    cap: dict[int, dict[int, float]] = {}
    orig: dict[tuple[int, int], float] = {}

    def add(u, v, w):
        cap.setdefault(u, {})[v] = cap.setdefault(u, {}).get(v, 0.0) + w

    for r in comp_edges:
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if u == v:
            continue
        add(u, v, w)
        add(v, u, w)
        orig[(u, v)] = orig.get((u, v), 0.0) + w
    cap.setdefault(int(source), {})
    if int(sink) not in cap:
        return EdmondsKarpResult(graph.spark, 0.0, set(cap), [])

    s, t = int(source), int(sink)
    max_flow = 0.0
    while True:
        parent: dict[int, int | None] = {s: None}
        q = deque([s])
        found = False
        while q and not found:
            u = q.popleft()
            for v, c in cap[u].items():
                if c > 1e-12 and v not in parent:
                    parent[v] = u
                    if v == t:
                        found = True
                        break
                    q.append(v)
        if not found:
            break
        path = []
        v = t
        while parent[v] is not None:
            u = parent[v]
            path.append((u, v))
            v = u
        bottleneck = min(cap[u][v] for u, v in path)
        max_flow += bottleneck
        for u, v in path:
            cap[u][v] -= bottleneck
            cap.setdefault(v, {})[u] = cap[v].get(u, 0.0) + bottleneck
    seen = {s}
    q = deque([s])
    while q:
        u = q.popleft()
        for v, c in cap.get(u, {}).items():
            if c > 1e-12 and v not in seen:
                seen.add(v)
                q.append(v)
    flows = [
        (u, v, orig[(u, v)] - cap.get(u, {}).get(v, 0.0)) for (u, v) in sorted(orig)
    ]
    return EdmondsKarpResult(graph.spark, max_flow, seen, flows)
