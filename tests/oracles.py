"""Pure-NumPy oracles transcribing the reference C++ loops verbatim.

These define bit-level semantics for the Spark kernels:
- PageRank:   cpp/centrality/PageRank.cpp:20-71
- CC:         cpp/components/ParallelConnectedComponents.cpp:20-95
              (min-label fixpoint; canonical labels = min node id)
- PLP:        cpp/community/PLP.cpp:28-121 (synchronous variant, heaviest
              label with smallest-id tie-break — SURVEY.md §2.5.3)
- Triangles:  cpp/edgescores/TriangleEdgeScore.cpp:18-110 (brute force
              enumeration here; counts are exact integers)
"""

from __future__ import annotations

import math

import numpy as np


def _sym_rows(edges, directed):
    """(u, v, w) sender→receiver rows; undirected: both directions for
    u!=v, self-loops once (NetworKit adjacency stores a self-loop once)."""
    rows = []
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        rows.append((u, v, w))
        if not directed and u != v:
            rows.append((v, u, w))
    return rows


def weighted_degrees(n, edges, directed):
    """cpp/graph/Graph.cpp:497-524 — undirected wdeg double-counts self-loops."""
    wdeg = np.zeros(n)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        if directed:
            wdeg[u] += w
        elif u == v:
            wdeg[u] += 2 * w
        else:
            wdeg[u] += w
            wdeg[v] += w
    return wdeg


def pagerank_oracle(n, edges, damp=0.85, tol=1e-8, directed=False, max_iter=None):
    """Exact transcription of PageRank.cpp:20-71 (incl. dangling-mass loss,
    L2 tol check, final normalization)."""
    wdeg = weighted_degrees(n, edges, directed)
    rows = _sym_rows(edges, directed)
    pr = np.full(n, 1.0 / n)
    it = 0
    while True:
        it += 1
        new = np.zeros(n)
        for u, v, w in rows:
            new[v] += pr[u] * w / wdeg[u]
        new = damp * new + (1.0 - damp) / n
        delta = math.sqrt(((pr - new) ** 2).sum())
        pr = new
        if delta <= tol or (max_iter is not None and it >= max_iter):
            break
    return pr / pr.sum()


def cc_oracle(n, edges):
    """Min-label fixpoint (ParallelConnectedComponents.cpp:20-95): final
    label of every node = min node id of its component."""
    label = np.arange(n)
    rows = _sym_rows(edges, directed=False)
    changed = True
    while changed:
        changed = False
        for u, v, _ in rows:
            if label[u] < label[v]:
                label[v] = label[u]
                changed = True
    return label


def plp_oracle(n, edges, theta=None, max_iter=None):
    """Synchronous PLP (PLP.cpp:28-121): every sweep, each non-isolated
    node adopts the label with the largest incident weight sum; ties go
    to the SMALLEST label id (std::map + max_element keeps first of
    equals, PLP.cpp:92-95).  Stop when nUpdated <= theta (= n/1e5)."""
    if theta is None:
        theta = n / 1e5
    label = np.arange(n, dtype=np.int64)
    rows = _sym_rows(edges, directed=False)
    nbrs: dict[int, list[tuple[int, float]]] = {}
    for u, v, w in rows:
        nbrs.setdefault(v, []).append((u, w))
    it = 0
    while True:
        it += 1
        new = label.copy()
        updated = 0
        for v in range(n):
            inc = nbrs.get(v)
            if not inc:
                continue  # isolated nodes stay singletons (PLP.cpp:54-58)
            acc: dict[int, float] = {}
            for u, w in inc:
                acc[label[u]] = acc.get(label[u], 0.0) + w
            best = max(sorted(acc.items()), key=lambda kv: kv[1])[0]
            # sorted → ascending label; max keeps FIRST of equal weights
            if best != label[v]:
                new[v] = best
                updated += 1
        label = new
        if updated <= theta or (max_iter is not None and it >= max_iter):
            break
    return label


def triangles_oracle(n, edges):
    """Per-edge triangle participation counts + total (exact).
    Self-loops excluded (LocalClusteringCoefficient.cpp:8)."""
    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    eset = set()
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        adj[a].add(b)
        adj[b].add(a)
        eset.add((a, b))
    per_edge = {}
    for (a, b) in sorted(eset):
        per_edge[(a, b)] = len(adj[a] & adj[b])
    total = sum(per_edge.values()) // 3
    # per-node triangle count: triangles containing the node
    per_node = np.zeros(n, dtype=np.int64)
    for v in range(n):
        ns = sorted(adj[v])
        t = 0
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (min(ns[i], ns[j]), max(ns[i], ns[j])) in eset:
                    t += 1
        per_node[v] = t
    return per_edge, per_node, total


def lcc_oracle(n, edges):
    """Local clustering coefficient: c(u)=2·tri(u)/(deg(u)(deg(u)-1)),
    c=0 for deg<2 (LocalClusteringCoefficient.cpp:50-82)."""
    _, per_node, _ = triangles_oracle(n, edges)
    deg = np.zeros(n, dtype=np.int64)
    seen = set()
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        deg[a] += 1
        deg[b] += 1
    out = np.zeros(n)
    for v in range(n):
        if deg[v] >= 2:
            out[v] = 2.0 * per_node[v] / (deg[v] * (deg[v] - 1))
    return out


def betweenness_oracle(n, edges, directed=False):
    """Brandes exact betweenness (unweighted) — raw scores, NOT halved
    for undirected (cpp/centrality/Betweenness.cpp accumulates the
    dependency from every source; only normalized scores divide the
    (n-1)(n-2) pair count by 2 when undirected)."""
    from collections import deque

    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u == v:
            continue
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    bc = np.zeros(n)
    for s in range(n):
        sigma = np.zeros(n); sigma[s] = 1
        dist = np.full(n, -1); dist[s] = 0
        order = []
        q = deque([s])
        preds: dict[int, list[int]] = {i: [] for i in range(n)}
        while q:
            u = q.popleft(); order.append(u)
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = np.zeros(n)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc
