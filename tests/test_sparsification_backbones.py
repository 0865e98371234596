"""Backbone sparsifier scores vs Python oracles of the reference
algorithms (SCAN, ChanceCorrected, Multiscale, LocalSimilarity,
SimmelianOverlap, ForestFire)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.sparsification import (
    chance_corrected_triangle_score,
    forest_fire_score,
    local_similarity_score,
    multiscale_score,
    scan_score,
    simmelian_overlap_score,
)

from .conftest import edges_df


def _fixture_edges(n=18, frac=30, tag="sp"):
    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            h = int(hashlib.md5(f"{tag}:{a}:{b}".encode()).hexdigest()[:8], 16)
            if h % 100 < frac:
                edges.append((a, b))
    return edges


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _tri(edges, adj):
    return {(a, b): len(adj[a] & adj[b]) for a, b in edges}


def test_scan_and_chance_corrected(spark):
    edges = _fixture_edges()
    adj = _adj(edges)
    tri = _tri(edges, adj)
    n = len(adj)
    g = EdgeGraph.from_edges(edges_df(spark, edges))

    got = {(r["src"], r["dst"]): r["score"] for r in scan_score(g).collect()}
    for (a, b), t in tri.items():
        want = (t + 1) / math.sqrt((len(adj[a]) + 1) * (len(adj[b]) + 1))
        assert got[(a, b)] == pytest.approx(want), (a, b)

    got = {
        (r["src"], r["dst"]): r["score"]
        for r in chance_corrected_triangle_score(g).collect()
    }
    for (a, b), t in tri.items():
        da, db = len(adj[a]), len(adj[b])
        if t > 0:
            want = t * (n - 2) / ((da - 1) * (db - 1))
        elif da == 1 or db == 1:
            want = 1.0
        else:
            want = 0.0
        assert got[(a, b)] == pytest.approx(want), (a, b)


def test_multiscale_score(spark):
    # weighted star + triangle; weights distinct so the oracle is exact
    edges = [(0, 1, 3.0), (0, 2, 1.0), (0, 3, 2.0), (1, 2, 5.0), (3, 4, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    wmap = {}
    for a, b, w in edges:
        wmap.setdefault(a, {})[b] = w
        wmap.setdefault(b, {})[a] = w

    def side(u, v):
        s = sum(wmap[u].values())
        k = len(wmap[u])
        p = wmap[u][v] / s
        return 1.0 - (1.0 - p) ** (k - 1)

    got = {(r["src"], r["dst"]): r["score"] for r in multiscale_score(g).collect()}
    for a, b, _ in edges:
        assert got[(a, b)] == pytest.approx(max(side(a, b), side(b, a))), (a, b)


def test_local_similarity_score(spark):
    edges = _fixture_edges(tag="ls")
    adj = _adj(edges)
    tri = _tri(edges, adj)
    g = EdgeGraph.from_edges(edges_df(spark, edges))

    def sim(a, b):
        t = tri[(min(a, b), max(a, b))]
        return t / (len(adj[a]) + len(adj[b]) - t)

    exp = {}
    for i in adj:
        d = len(adj[i])
        # same ordering as the engine: sim desc, neighbor id asc
        ordered = sorted(adj[i], key=lambda j: (-sim(i, j), j))
        for rank, j in enumerate(ordered, start=1):
            e = 1.0 if d <= 1 else 1.0 - math.log(rank) / math.log(d)
            key = (min(i, j), max(i, j))
            exp[key] = max(exp.get(key, 0.0), e)

    got = {(r["src"], r["dst"]): r["score"] for r in local_similarity_score(g).collect()}
    for k, want in exp.items():
        assert got[k] == pytest.approx(want), k


def test_simmelian_overlap_score(spark):
    edges = _fixture_edges(tag="sim", frac=35)
    adj = _adj(edges)
    tri = _tri(edges, adj)
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    max_rank = 3

    def tcount(a, b):
        return tri[(min(a, b), max(a, b))]

    def top(u):
        ranked = sorted(adj[u], key=lambda v: -tcount(u, v))
        out, rank, cur, equals = set(), 0, None, 0
        for v in ranked:
            t = tcount(u, v)
            if t != cur:
                rank += equals
                cur, equals = t, 1
            else:
                equals += 1
            if rank <= max_rank:
                out.add(v)
        return out

    got = {
        (r["src"], r["dst"]): r["score"]
        for r in simmelian_overlap_score(g, max_rank=max_rank).collect()
    }
    for a, b in tri:
        want = float(len((top(a) - {b}) & (top(b) - {a})))
        assert got[(a, b)] == want, (a, b)


def test_forest_fire_score(spark):
    # K6 core with a pendant path hanging off it: each extra hop down
    # the path needs another geometric success, so burn frequency decays
    # along the path — the fire-simulation property the score measures
    edges = []
    for a in range(6):
        for b in range(a + 1, 6):
            edges.append((a, b))
    edges += [(5, 6), (6, 7), (7, 8), (8, 9), (9, 10)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    s = forest_fire_score(g, pf=0.6, target_burnt_ratio=20.0, fires_per_round=16, seed=3)
    rows = {(r["src"], r["dst"]): r["score"] for r in s.collect()}
    assert set(rows) == set(edges)
    assert max(rows.values()) == 1.0
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert all(v > 0.0 for v in rows.values())  # enough fires to touch all
    # low-degree path edges are must-pass for any fire reaching them, so
    # they out-burn the core (where each fire's geometric budget spreads
    # over 5 alternatives); within the path, frequency decays outward
    # from the core-adjacent hop, which sees fires from both directions
    core_max = max(v for k, v in rows.items() if k[0] < 6 and k[1] < 6)
    assert rows[(6, 7)] > core_max
    assert rows[(9, 10)] < rows[(6, 7)]
    # determinism at a different partitioning
    s2 = forest_fire_score(
        g, pf=0.6, target_burnt_ratio=20.0, fires_per_round=16, seed=3
    )
    rows2 = {(r["src"], r["dst"]): r["score"] for r in s2.repartition(16).collect()}
    assert rows == rows2
