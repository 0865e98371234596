"""LPDegreeOrdered + SLPA (SURVEY §2.5.3 variants) vs NumPy oracles /
reference invariants."""

import numpy as np

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.lp_variants import (
    lp_degree_ordered,
    slpa,
    slpa_partition,
)

from .conftest import edges_df
from .test_plp import CLUSTERED, _labels


def lp_degord_oracle(n, edges, max_iter):
    """Synchronous LPDegreeOrdered rule (see lp_variants module doc):
    most frequent neighbor label (unweighted counts, LPDegreeOrdered.cpp:
    42), ties → lowest carrier degree, then smallest label."""
    adj = [[] for _ in range(n)]
    for e in edges:
        u, v = int(e[0]), int(e[1])
        adj[u].append(v)
        if u != v:
            adj[v].append(u)
    deg = np.array([len(a) for a in adj])
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not adj[v]:
                continue
            stats = {}
            for w in adj[v]:
                l = labels[w]
                c, d = stats.get(l, (0, 1 << 60))
                stats[l] = (c + 1, min(d, deg[w]))
            new[v] = min(stats, key=lambda l: (-stats[l][0], stats[l][1], l))
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def test_lp_degord_oracle_exact(spark):
    # mixed-degree fixture: two blocks + a chain tail forces tie-breaks
    edges = CLUSTERED + [(7, 8, 1.0), (8, 9, 1.0), (9, 10, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _labels(lp_degree_ordered(g, max_iter=8), 11)
    want = lp_degord_oracle(11, edges, max_iter=8)
    assert np.array_equal(got, want)


def test_lp_degord_ignores_weights(spark):
    """LPDegreeOrdered.cpp:42 counts each neighbor once regardless of
    weight — unlike PLP.  A heavy edge must NOT dominate the count."""
    # node 0: two light edges into block A (1,2 labeled together after
    # sweep 1) vs one heavy edge to 3 — counts 2 vs 1 → block A wins
    edges = [(1, 2, 1.0), (0, 1, 1.0), (0, 2, 1.0), (0, 3, 100.0), (3, 4, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _labels(lp_degree_ordered(g, max_iter=8), 5)
    want = lp_degord_oracle(5, edges, max_iter=8)
    assert np.array_equal(got, want)
    assert got[0] in (got[1], got[2])


def test_lp_degord_two_communities(spark):
    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    got = _labels(lp_degree_ordered(g, max_iter=10), 8)
    assert len(set(got[:4])) == 1 and len(set(got[4:])) == 1
    assert got[0] != got[4]


def test_slpa_invariants_and_cliques(spark):
    """SLPA.cpp:95-122 invariants: every node appears in the cover with
    ≥1 label; labels are node ids; disjoint cliques are recovered as
    separate communities; the run is deterministic (hash RNG)."""
    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    cov = slpa(g, threshold=0.1, num_iterations=15).collect()
    by_node = {}
    for r in cov:
        by_node.setdefault(r["node"], set()).add(r["label"])
    assert set(by_node) == set(range(8))  # every node covered
    assert all(0 <= l < 8 for ls in by_node.values() for l in ls)
    # dominant labels separate the two blocks
    part = {r["node"]: r["label"] for r in slpa_partition(g, num_iterations=15).collect()}
    assert len({part[i] for i in range(4)}) == 1
    assert len({part[i] for i in range(4, 8)}) == 1
    assert part[0] != part[4]
    # determinism: same seed → same cover
    cov2 = slpa(g, threshold=0.1, num_iterations=15).collect()
    assert sorted((r["node"], r["label"]) for r in cov) == sorted(
        (r["node"], r["label"]) for r in cov2
    )


def test_slpa_overlap_on_bridge(spark):
    """A node tied equally into two cliques retains both labels — the
    overlapping-cover behavior the fork adds SLPA for."""
    k1 = [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b, 1.0) for a in range(5, 9) for b in range(a + 1, 9)]
    bridge = [(4, a, 1.0) for a in range(4)] + [(4, a, 1.0) for a in range(5, 9)]
    g = EdgeGraph.from_edges(edges_df(spark, k1 + k2 + bridge))
    cov = slpa(g, threshold=0.15, num_iterations=25).collect()
    labels4 = {r["label"] for r in cov if r["node"] == 4}
    side1 = {r["label"] for r in cov if r["node"] in (0, 1, 2, 3)}
    side2 = {r["label"] for r in cov if r["node"] in (5, 6, 7, 8)}
    # the bridge node's memory straddles both cliques
    assert labels4 & side1 and labels4 & side2
