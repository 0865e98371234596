"""Union/Random maximum spanning forests + ParallelAgglomerativeClusterer
(+ edge-score transforms) vs brute-force Python oracles."""

import itertools

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.coarsening import parallel_agglomerative
from networkit_spark.operators.forest import (
    minimum_spanning_forest,
    random_maximum_spanning_forest,
    union_maximum_spanning_forest,
)
from networkit_spark.operators.sparsification import (
    edge_score_as_weight,
    edge_score_blender,
    prefix_jaccard_score,
)

from .conftest import edges_df

# weighted graph with TIES: two parallel max-weight paths between blocks
WEIGHTED = [
    (0, 1, 5.0), (1, 2, 5.0), (0, 2, 3.0),
    (2, 3, 2.0), (2, 4, 2.0), (3, 4, 2.0),
    (4, 5, 7.0), (5, 6, 1.0),
]


def _umsf_oracle(n, edges):
    """Edge ∈ union of max spanning forests ⟺ endpoints disconnected in
    the strictly-heavier subgraph (Kruskal level batching)."""
    out = set()
    for u, v, w in edges:
        heavier = [(a, b) for a, b, w2 in edges if w2 > w]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in heavier:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        if find(u) != find(v):
            out.add((u, v))
    return out


def test_umsf_matches_oracle(spark):
    g = EdgeGraph.from_edges(edges_df(spark, WEIGHTED))
    got = {(r["src"], r["dst"]) for r in union_maximum_spanning_forest(g).collect()}
    want = _umsf_oracle(7, WEIGHTED)
    assert got == want
    # the tied triangle 2-3-4 (all 2.0): every edge is in SOME max forest
    assert {(2, 3), (2, 4), (3, 4)} <= got


def test_rmsf_is_a_maximum_forest(spark):
    g = EdgeGraph.from_edges(edges_df(spark, WEIGHTED))
    got = random_maximum_spanning_forest(g, seed=4).collect()
    edges = {(r["src"], r["dst"]): r["weight"] for r in got}
    # spanning: 7 nodes, 1 component → 6 edges, acyclic by construction
    assert len(edges) == 6
    # max total weight: brute force over all spanning trees
    best = 0.0
    nodes = set()
    for u, v, w in WEIGHTED:
        nodes |= {u, v}
    for comb in itertools.combinations(WEIGHTED, 6):
        parent = {x: x for x in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ok = True
        for u, v, w in comb:
            ru, rv = find(u), find(v)
            if ru == rv:
                ok = False
                break
            parent[ru] = rv
        if ok:
            best = max(best, sum(w for _, _, w in comb))
    assert sum(edges.values()) == pytest.approx(best)
    # subset of the union of max forests
    assert set(edges) <= _umsf_oracle(7, WEIGHTED)
    # deterministic per seed
    again = {(r["src"], r["dst"]) for r in random_maximum_spanning_forest(g, seed=4).collect()}
    assert set(edges) == again


def test_parallel_agglomerative_two_blocks(spark):
    """Two dense blocks + weak bridge agglomerate into 2 communities
    (ParallelAgglomerativeClusterer.cpp:18-84 contract)."""
    edges = (
        [(a, b, 4.0) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b, 4.0) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4, 0.1)]
    )
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    lab = {r["node"]: r["label"] for r in parallel_agglomerative(g).collect()}
    assert len(lab) == 8
    assert len({lab[i] for i in range(4)}) == 1
    assert len({lab[i] for i in range(4, 8)}) == 1
    assert lab[0] != lab[4]


def test_edge_score_transforms(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)]))
    s0 = g.edges.select("src", "dst", F.lit(0.25).alias("score"))
    s1 = g.edges.select("src", "dst", F.lit(0.75).alias("score"))
    sel = g.edges.select("src", "dst", (F.col("src") == 0).alias("sel"))
    blended = {(r["src"], r["dst"]): r["score"] for r in edge_score_blender(s0, s1, sel).collect()}
    assert blended[(0, 1)] == 0.75 and blended[(1, 2)] == 0.25
    gw = edge_score_as_weight(g, s1, squared=True, offset=1.0, factor=2.0)
    w = {(r["src"], r["dst"]): r["weight"] for r in gw.edges.collect()}
    assert all(v == pytest.approx(1.0 + 2.0 * 0.75**2) for v in w.values())


def test_prefix_jaccard_triangle_vs_bridge(spark):
    """PrefixJaccardScore: a triangle edge (shared neighbor at rank 1)
    scores high; a bridge with disjoint neighborhoods scores 0."""
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    att = g.edges.select("src", "dst", F.col("weight").alias("score"))
    got = {(r["src"], r["dst"]): r["score"] for r in prefix_jaccard_score(g, att).collect()}
    assert got[(0, 1)] > 0  # share neighbor 2
    assert got[(3, 4)] == 0.0  # no common neighbor at any prefix
    assert got[(0, 1)] <= 1.0
