"""Local (per-cluster) partition evaluation measures vs a NumPy oracle.

Oracle mirrors ``cpp/community/{PartitionHubDominance,
IntrapartitionDensity,IsolatedInterpartitionConductance,
IsolatedInterpartitionExpansion,PartitionFragmentation,
StablePartitionNodes}.cpp`` exactly (see each test's docstring).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.quality import (
    evaluation_summary,
    hub_dominance,
    intrapartition_density,
    isolated_interpartition_conductance,
    isolated_interpartition_expansion,
    partition_fragmentation,
    stable_partition_nodes,
    subset_sizes,
)

from .conftest import edges_df


# --- NumPy oracle (undirected; edges each once; labels: node -> label) ----


def _nbrs(edges, n):
    adj = [[] for _ in range(n)]
    for u, v, w in edges:
        adj[u].append((v, w))
        if u != v:
            adj[v].append((u, w))
    return adj


def o_hub_dominance(edges, labels, n):
    adj = _nbrs(edges, n)
    out = {}
    sizes = {}
    for u in range(n):
        c = labels[u]
        sizes[c] = sizes.get(c, 0) + 1
        ideg = sum(1 for v, _ in adj[u] if labels[v] == c)
        out[c] = max(out.get(c, 0), ideg)
    return {
        c: 1.0 if sizes[c] <= 1 else out.get(c, 0) / (sizes[c] - 1) for c in sizes
    }


def o_intra_density(edges, labels, n):
    sizes = {}
    for u in range(n):
        sizes[labels[u]] = sizes.get(labels[u], 0) + 1
    intra = {c: 0 for c in sizes}
    for u, v, w in edges:
        if labels[u] == labels[v]:
            intra[labels[u]] += 1
    out = {}
    for c, s in sizes.items():
        poss = s * (s - 1) / 2
        out[c] = 1.0 if poss <= 0 else intra[c] / poss
    return out


def o_iic(edges, labels, n):
    sizes = {}
    for u in range(n):
        sizes[labels[u]] = sizes.get(labels[u], 0) + 1
    cut = {c: 0.0 for c in sizes}
    vol = {c: 0.0 for c in sizes}
    tot = 0.0
    for u, v, w in edges:
        if labels[u] != labels[v]:
            cut[labels[u]] += w
            cut[labels[v]] += w
        vol[labels[u]] += w
        vol[labels[v]] += w
        tot += 2 * w
    out = {}
    for c in sizes:
        den = min(vol[c], tot - vol[c])
        out[c] = cut[c] / den if den > 0 else 0.0
    return out


def o_iie(edges, labels, n):
    sizes = {}
    for u in range(n):
        sizes[labels[u]] = sizes.get(labels[u], 0) + 1
    cut = {c: 0.0 for c in sizes}
    for u, v, w in edges:
        if labels[u] != labels[v]:
            cut[labels[u]] += w
            cut[labels[v]] += w
    return {c: cut[c] / min(s, n - s) for c, s in sizes.items()}


def o_components(edges, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    return [find(u) for u in range(n)]


def o_fragmentation(edges, labels, n):
    comp = o_components(edges, n)
    sizes, pieces = {}, {}
    for u in range(n):
        c = labels[u]
        sizes[c] = sizes.get(c, 0) + 1
        key = (c, comp[u])
        pieces[key] = pieces.get(key, 0) + 1
    out = {}
    for c, s in sizes.items():
        mx = max(p for (cc, _), p in pieces.items() if cc == c)
        out[c] = 1.0 - mx / s
    return out


def o_stable(edges, labels, n):
    adj = _nbrs(edges, n)
    sizes, stab = {}, {}
    for u in range(n):
        c = labels[u]
        sizes[c] = sizes.get(c, 0) + 1
        if not adj[u]:
            stable = True  # isolated nodes are stable
        else:
            lw = {}
            for v, w in adj[u]:
                lw[labels[v]] = lw.get(labels[v], 0.0) + w
            own = lw.get(c, 0.0)
            stable = own > 0 and all(
                w < own for l, w in lw.items() if l != c
            )
        stab[c] = stab.get(c, 0) + (1 if stable else 0)
    return {c: stab[c] / sizes[c] for c in sizes}


# --- fixtures --------------------------------------------------------------

# mixed graph: two blocks + bridge + dangle + self-loop + two isolated
# nodes (7, 8 — in the label frame but absent from the edge set); labels
# deliberately misaligned with the blocks so every measure is non-trivial
MIXED_EDGES = [
    (0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (2, 3, 1.0),   # block A + bridge
    (3, 4, 1.0), (4, 5, 2.0), (3, 5, 1.0),                # block B
    (5, 6, 0.5),                                          # dangle
    (6, 6, 1.5),                                          # self-loop
]
MIXED_N = 9
MIXED_LABELS = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 2, 7: 2, 8: 1}


def _setup(spark, edges, labels, n):
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    # include every node 0..n-1 (isolated ones too) in the label frame
    lab = spark.createDataFrame(
        [(u, labels[u]) for u in range(n)], "node long, label long"
    )
    return g, lab


def _vals(df):
    return {r["label"]: r["value"] for r in df.collect()}


@pytest.fixture(scope="module")
def mixed(spark):
    return _setup(spark, MIXED_EDGES, MIXED_LABELS, MIXED_N)


def _close(got, want):
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], abs=1e-9), (c, got[c], want[c])


def test_hub_dominance(spark, mixed):
    g, lab = mixed
    _close(_vals(hub_dominance(g, lab)), o_hub_dominance(MIXED_EDGES, MIXED_LABELS, MIXED_N))


def test_intrapartition_density(spark, mixed):
    g, lab = mixed
    _close(_vals(intrapartition_density(g, lab)), o_intra_density(MIXED_EDGES, MIXED_LABELS, MIXED_N))


def test_isolated_interpartition_conductance(spark, mixed):
    g, lab = mixed
    _close(_vals(isolated_interpartition_conductance(g, lab)), o_iic(MIXED_EDGES, MIXED_LABELS, MIXED_N))


def test_isolated_interpartition_expansion(spark, mixed):
    g, lab = mixed
    _close(_vals(isolated_interpartition_expansion(g, lab)), o_iie(MIXED_EDGES, MIXED_LABELS, MIXED_N))


def test_partition_fragmentation(spark, mixed):
    g, lab = mixed
    # labels 1 and 2 straddle the two components / the isolated node →
    # nonzero fragmentation; supply components including isolated node 7
    comp_o = o_components(MIXED_EDGES, MIXED_N)
    comp = spark.createDataFrame(
        [(u, comp_o[u]) for u in range(MIXED_N)], "node long, label long"
    )
    _close(
        _vals(partition_fragmentation(g, lab, components=comp)),
        o_fragmentation(MIXED_EDGES, MIXED_LABELS, MIXED_N),
    )
    want = o_fragmentation(MIXED_EDGES, MIXED_LABELS, MIXED_N)
    assert any(v > 0 for v in want.values())  # fixture exercises the measure


def test_stable_partition_nodes(spark, mixed):
    g, lab = mixed
    _close(_vals(stable_partition_nodes(g, lab)), o_stable(MIXED_EDGES, MIXED_LABELS, MIXED_N))


def test_evaluation_summary(spark, mixed):
    g, lab = mixed
    vals = intrapartition_density(g, lab)
    sizes = subset_sizes(lab)
    s = evaluation_summary(vals, sizes, MIXED_N)
    want = o_intra_density(MIXED_EDGES, MIXED_LABELS, MIXED_N)
    wsizes = {}
    for u in range(MIXED_N):
        wsizes[MIXED_LABELS[u]] = wsizes.get(MIXED_LABELS[u], 0) + 1
    assert s["unweighted_average"] == pytest.approx(sum(want.values()) / len(want))
    assert s["weighted_average"] == pytest.approx(
        sum(want[c] * wsizes[c] for c in want) / MIXED_N
    )
    assert s["min"] == pytest.approx(min(want.values()))
    assert s["max"] == pytest.approx(max(want.values()))


def test_permanence_centrality(spark):
    """Two triangles + bridge, hand-computed permanence values."""
    from networkit_spark.operators.quality import permanence_centrality

    g = EdgeGraph.from_edges(
        edges_df(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    )
    part = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long"
    )
    got = {r["node"]: r["score"] for r in permanence_centrality(g, part).collect()}
    # node 0: I=2, Emax=1, deg=2, c_in=1 → 2/1/2 − 0 = 1.0
    assert abs(got[0] - 1.0) < 1e-12
    # node 2: I=2, Emax=1, deg=3, c_in=1 → 2/3
    assert abs(got[2] - 2.0 / 3.0) < 1e-12
    assert abs(got[3] - 2.0 / 3.0) < 1e-12
    assert abs(got[5] - 1.0) < 1e-12


def test_pagerank_nibble_recovers_planted_block(spark):
    """Two dense K5 blocks joined by one bridge: nibbling from a node in
    block A returns exactly block A (the min-conductance sweep set)."""
    from networkit_spark.operators.scd import pagerank_nibble, personalized_pagerank

    ed = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    ed += [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    ed += [(4, 5)]
    g = EdgeGraph.from_edges(edges_df(spark, ed))
    got = {r["node"] for r in pagerank_nibble(g, seed=0).collect()}
    assert got == {0, 1, 2, 3, 4}
    got_b = {r["node"] for r in pagerank_nibble(g, seed=9).collect()}
    assert got_b == {5, 6, 7, 8, 9}
    # ppr mass sums to ~1 and concentrates near the seed
    ppr = {r["node"]: r["ppr"] for r in personalized_pagerank(g, [0]).collect()}
    assert abs(sum(ppr.values()) - 1.0) < 1e-6
    assert ppr[0] > ppr[9]


def test_approximate_pagerank_support_bound(spark):
    """ACL locality: the push-PPR support stays ≤ 1/(ε·α) regardless of
    graph size — the property that makes PageRankNibble local at 100 TB.
    Two RMAT-ish graphs 4× apart in size, same (ε, α): support must not
    grow with n, and total mass p+r is conserved at 1."""
    from networkit_spark.operators.generators import rmat
    from networkit_spark.operators.scd import approximate_pagerank

    alpha, eps = 0.15, 1e-3
    cap = 1.0 / (eps * alpha)
    supports = []
    for scale in (8, 10):
        g = rmat(spark, scale=scale, edge_factor=4, seed=3)
        seed_node = g.vertices().agg(F.min("id")).collect()[0][0]
        p = approximate_pagerank(g, [int(seed_node)], alpha=alpha, eps=eps)
        supports.append(p.count())
    assert all(s <= cap for s in supports)
    # support is a function of (eps, alpha), not n: the 4×-larger graph
    # may not blow the support up
    assert supports[1] <= cap

    # mass conservation on a small graph where pushes drain fully
    ed = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    g2 = EdgeGraph.from_edges(edges_df(spark, ed))
    p2 = approximate_pagerank(g2, [0], alpha=alpha, eps=1e-8, max_iter=400)
    assert abs(sum(r["ppr"] for r in p2.collect()) - 1.0) < 1e-4
