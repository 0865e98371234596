"""Dyn* distances: dyn ≡ static equivalence after event batches —
the reference's test contract for every Dyn* algorithm
(``ConnectedComponentsGTest.cpp:257-328`` pattern; ``DynBFS``/
``DynDijkstra``/``DynApproxBetweenness``)."""

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.bfs import bfs, sssp
from networkit_spark.streaming.dyndist import (
    betweenness_state,
    incremental_betweenness,
    incremental_sssp,
)
from tests.conftest import edges_df


def _events(spark, rows):
    return spark.createDataFrame(rows, "batch long, kind string, u long, v long, w double")


def _path_graph(spark, n=8):
    return EdgeGraph.from_edges(edges_df(spark, [(i, i + 1) for i in range(n - 1)]))


def test_dynbfs_shortcut_matches_static(spark):
    g = _path_graph(spark)
    d0 = bfs(g, 0)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 6, 1.0)])
    new_g, d1 = incremental_sssp(g, 0, d0, ev, hops=True)
    want = {r["node"]: float(r["dist"]) for r in bfs(new_g, 0).collect()}
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == want
    assert got[7] == 2.0  # 0 -> 6 -> 7


def test_dynbfs_attach_new_component(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (5, 6)]))
    d0 = bfs(g, 0)
    assert 5 not in {r["node"] for r in d0.collect()}
    ev = _events(spark, [(1, "EDGE_ADDITION", 1, 5, 1.0)])
    _, d1 = incremental_sssp(g, 0, d0, ev, hops=True)
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == {0: 0.0, 1: 1.0, 5: 2.0, 6: 3.0}


def test_dyndijkstra_weighted_shortcut(spark):
    edges = [(0, 1, 4.0), (1, 2, 4.0), (2, 3, 4.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    d0 = sssp(g, 0)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 2, 1.5)])
    new_g, d1 = incremental_sssp(g, 0, d0, ev, hops=False)
    want = {r["node"]: r["dist"] for r in sssp(new_g, 0).collect()}
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == pytest.approx(want)
    assert got[3] == pytest.approx(5.5)  # 0 -(1.5)-> 2 -(4)-> 3


def test_dynsssp_removal_falls_back_to_static(spark):
    g = _path_graph(spark, 5)
    d0 = bfs(g, 0)
    ev = _events(spark, [(1, "EDGE_REMOVAL", 2, 3, 0.0)])
    new_g, d1 = incremental_sssp(g, 0, d0, ev, hops=True)
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}  # 3,4 unreachable now


def test_dynsssp_directed_takes_static_path(spark):
    """On a directed graph the symmetric warm-start seed would relax
    through the REVERSE of the canonicalized insertion — incremental_sssp
    must fall back to the static recompute and match static sssp exactly.
    Adversarial fixture: the batch adds (5, 2), canonicalized to stored
    edge 2→5; a symmetric seed would claim dist(2) = dist(5)+1 = 2 and
    then relax 2→7, but 2 and 7 stay unreachable from 0."""
    e = edges_df(spark, [(0, 5, 1.0), (2, 7, 1.0)])
    g = EdgeGraph.from_edges(e, directed=True)
    d0 = sssp(g, 0)
    assert {r["node"] for r in d0.collect()} == {0, 5}
    ev = _events(spark, [(1, "EDGE_ADDITION", 5, 2, 1.0)])
    new_g, d1 = incremental_sssp(g, 0, d0, ev, hops=False)
    want = {r["node"]: r["dist"] for r in sssp(new_g, 0).collect()}
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == pytest.approx(want)
    assert 2 not in got and 7 not in got  # no reverse-edge leakage


def test_dynbetweenness_matches_static_recompute(spark):
    g = _path_graph(spark, 7)
    st = betweenness_state(g)  # all sources: exact
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 5, 1.0), (1, "EDGE_ADDITION", 2, 6, 1.0)])
    st2 = incremental_betweenness(st, ev)
    got = {r["node"]: r["score"] for r in st2.scores().collect()}
    want = {
        r["node"]: r["score"]
        for r in betweenness(st2.graph, sources=st.sources).collect()
    }
    assert got == pytest.approx(want)


def test_dynbetweenness_unaffected_sources_keep_cached_tables(spark):
    # two far components; an edge inside one leaves the other's sources alone
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    st = betweenness_state(g)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 3, 1.0)])
    st2 = incremental_betweenness(st, ev)
    want = {
        r["node"]: r["score"]
        for r in betweenness(st2.graph, sources=st.sources).collect()
    }
    got = {r["node"]: r["score"] for r in st2.scores().collect()}
    assert got == pytest.approx(want)
    # the 10-11-12 path's middle node keeps its exact dependency (2 = both
    # orderings of the endpoint pair)
    assert got[11] == pytest.approx(2.0)
