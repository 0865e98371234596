"""LouvainMapEquation + map equation scorer.

Oracle: a direct Python evaluation of the two-level map equation
(``cpp/community/LouvainMapEquation.cpp:520-545``) on the same
adjacency, and structural recovery on planted-clique fixtures.
"""

import math

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.mapequation import louvain_map_equation, map_equation
from tests.conftest import edges_df


def _py_map_equation(edges, labels):
    """Pure-Python L(M): vol counts loops twice, cuts exclude loops."""
    vol, cut, cvol, ccut = {}, {}, {}, {}
    total_vol = 0.0
    for u, v, w in edges:
        if u == v:
            vol[u] = vol.get(u, 0.0) + 2 * w
            total_vol += 2 * w
        else:
            for a, b in ((u, v), (v, u)):
                vol[a] = vol.get(a, 0.0) + w
                total_vol += w
                if labels[a] != labels[b]:
                    ccut[labels[a]] = ccut.get(labels[a], 0.0) + w
    for u, w in vol.items():
        cvol[labels[u]] = cvol.get(labels[u], 0.0) + w

    def plogp(x):
        if x <= 0:
            return 0.0
        p = x / total_vol
        return p * math.log(p)

    q = sum(ccut.values())
    return (
        plogp(q)
        - 2 * sum(plogp(c) for c in ccut.values())
        + sum(plogp(ccut.get(l, 0.0) + cv) for l, cv in cvol.items())
        - sum(plogp(w) for w in vol.values())
    )


def _two_cliques(bridge_weight=1.0):
    e = []
    for base in (0, 10):
        for i in range(base, base + 6):
            for j in range(i + 1, base + 6):
                e.append((i, j, 1.0))
    e.append((0, 10, bridge_weight))
    return e


def test_map_equation_scorer_matches_python_oracle(spark):
    edges = _two_cliques() + [(3, 3, 2.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    labels = {u: (0 if u < 10 else 1) for u in range(16)}
    ldf = spark.createDataFrame(list(labels.items()), "node long, label long")
    got = map_equation(g, ldf)
    want = _py_map_equation(edges, labels)
    assert got == pytest.approx(want, rel=1e-9)


def test_lme_recovers_planted_cliques(spark):
    g = EdgeGraph.from_edges(edges_df(spark, _two_cliques()))
    res = {r["node"]: r["label"] for r in louvain_map_equation(g).collect()}
    assert len(res) == 12
    left = {res[u] for u in range(0, 6)}
    right = {res[u] for u in range(10, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_lme_improves_map_equation_over_singletons(spark):
    edges = _two_cliques()
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    part = louvain_map_equation(g)
    singletons = g.vertices().selectExpr("id as node", "id as label")
    assert map_equation(g, part) < map_equation(g, singletons) - 0.1


def test_lme_keeps_connected_pair_together(spark):
    # a single edge: both endpoints end in one cluster (cut term vanishes)
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0)]))
    res = {r["node"]: r["label"] for r in louvain_map_equation(g).collect()}
    assert res[0] == res[1]
