"""Dyn* distances: dyn ≡ static equivalence after event batches —
the reference's test contract for every Dyn* algorithm
(``ConnectedComponentsGTest.cpp:257-328`` pattern; ``DynBFS``/
``DynDijkstra``/``DynApproxBetweenness``)."""

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.bfs import bfs, sssp
from networkit_spark.streaming.dyndist import (
    betweenness_one_node_state,
    incremental_betweenness_one_node,
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


# ---------------------------------------------------------------------------
# DynAPSP + DynTopHarmonicCloseness
# ---------------------------------------------------------------------------


def _apsp_dict(state):
    return {(r["src"], r["dst"]): r["dist"] for r in state.dist.collect()}


def test_apsp_state_matches_per_source_bfs(spark):
    from networkit_spark.streaming.dyndist import apsp_state

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3), (0, 4), (5, 6)]))
    got = _apsp_dict(apsp_state(g, hops=True))
    for s in [0, 1, 2, 3, 4, 5, 6]:
        want = {r["node"]: float(r["dist"]) for r in bfs(g, s).collect()}
        for t, d in want.items():
            assert got[(s, t)] == d
    # unreachable pairs are absent (sparse convention)
    assert (0, 5) not in got


def test_dynapsp_insertion_matches_static(spark):
    from networkit_spark.streaming.dyndist import apsp_state, incremental_apsp

    g = _path_graph(spark, n=8)
    st = apsp_state(g, hops=True)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 6, 1.0)])
    st2 = incremental_apsp(st, ev)
    want = _apsp_dict(apsp_state(st2.graph, hops=True))
    assert _apsp_dict(st2) == pytest.approx(want)
    assert _apsp_dict(st2)[(0, 7)] == 2.0  # 0 -> 6 -> 7


def test_dynapsp_batch_uses_both_new_edges(spark):
    """A shortest path through TWO batch edges needs the fixpoint loop:
    one candidate pass composes only a single new edge."""
    from networkit_spark.streaming.dyndist import apsp_state, incremental_apsp

    g = _path_graph(spark, n=12)
    st = apsp_state(g, hops=True)
    ev = _events(
        spark,
        [(1, "EDGE_ADDITION", 0, 5, 1.0), (1, "EDGE_ADDITION", 5, 10, 1.0)],
    )
    st2 = incremental_apsp(st, ev)
    got = _apsp_dict(st2)
    assert got[(0, 10)] == 2.0  # 0 -> 5 -> 10, both edges new
    assert got[(0, 11)] == 3.0
    want = _apsp_dict(apsp_state(st2.graph, hops=True))
    assert got == pytest.approx(want)


def test_dynapsp_connects_components_and_new_nodes(spark):
    from networkit_spark.streaming.dyndist import apsp_state, incremental_apsp

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (5, 6)]))
    st = apsp_state(g, hops=True)
    ev = _events(
        spark,
        [(1, "EDGE_ADDITION", 1, 5, 1.0), (1, "EDGE_ADDITION", 6, 9, 1.0)],
    )
    st2 = incremental_apsp(st, ev)
    got = _apsp_dict(st2)
    assert got[(0, 6)] == 3.0
    assert got[(0, 9)] == 4.0  # node 9 is new in the batch
    assert got[(9, 9)] == 0.0
    want = _apsp_dict(apsp_state(st2.graph, hops=True))
    assert got == pytest.approx(want)


def test_dynapsp_weighted_decrease_path(spark):
    from networkit_spark.streaming.dyndist import apsp_state, incremental_apsp

    edges = [(0, 1, 4.0), (1, 2, 4.0), (2, 3, 4.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    st = apsp_state(g, hops=False)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 2, 1.5)])
    st2 = incremental_apsp(st, ev)
    got = _apsp_dict(st2)
    assert got[(0, 3)] == pytest.approx(5.5)
    assert got[(3, 0)] == pytest.approx(5.5)
    want = _apsp_dict(apsp_state(st2.graph, hops=False))
    assert got == pytest.approx(want)


def test_dyn_top_harmonic_matches_static_closeness(spark):
    from networkit_spark.operators.closeness import closeness
    from networkit_spark.streaming.dyndist import DynTopHarmonicCloseness

    g = _path_graph(spark, n=8)
    dyn = DynTopHarmonicCloseness(g, k=4)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 7, 1.0)])
    dyn.update(ev)
    got = [(r["node"], r["score"]) for r in dyn.ranking().collect()]
    want_scores = {
        r["node"]: r["score"]
        for r in closeness(dyn.state.graph, harmonic=True).collect()
    }
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert [n for n, _ in got] == [n for n, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])


def test_weighted_readdition_takes_static_path(spark):
    """apply_events SUMS the weight when an EDGE_ADDITION hits an
    existing edge — a weight increase, so the weighted warm starts must
    rebuild statically (reference Dyn* support decreases only)."""
    from networkit_spark.streaming.dyndist import apsp_state, incremental_apsp

    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 2.5)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    # re-add (0,2) with +2: new weight 4.5 — the old d(0,2)=2.5 via the
    # direct edge is stale; correct answer becomes 2.0 via node 1
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 2, 2.0)])

    st = apsp_state(g, hops=False)
    st2 = incremental_apsp(st, ev)
    want = _apsp_dict(apsp_state(st2.graph, hops=False))
    assert _apsp_dict(st2) == pytest.approx(want)
    assert _apsp_dict(st2)[(0, 2)] == pytest.approx(2.0)

    d0 = sssp(g, 0)
    new_g, d1 = incremental_sssp(g, 0, d0, ev, hops=False)
    want = {r["node"]: r["dist"] for r in sssp(new_g, 0).collect()}
    got = {r["node"]: r["dist"] for r in d1.collect()}
    assert got == pytest.approx(want)
    assert got[2] == pytest.approx(2.0)


def test_betweenness_one_node_matches_exact(spark):
    g = _path_graph(spark, n=6)
    st = betweenness_one_node_state(g, x=2)
    exact = {
        r["node"]: r["score"] for r in betweenness(g).collect()
    }
    assert st.bcx() == pytest.approx(exact[2])


def test_dyn_betweenness_one_node_insertion_matches_static(spark):
    g = _path_graph(spark, n=8)
    st = betweenness_one_node_state(g, x=3)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 6, 1.0)])
    st2 = incremental_betweenness_one_node(st, ev)
    g2 = st2.graph
    exact = {r["node"]: r["score"] for r in betweenness(g2).collect()}
    assert st2.bcx() == pytest.approx(exact[3])
    # the whole sigma table must match a cold rebuild, not just bcx
    cold = betweenness_one_node_state(g2, x=3)
    got = sorted(map(tuple, st2.pairs.collect()))
    want = sorted(map(tuple, cold.pairs.collect()))
    assert got == want


def test_dyn_betweenness_one_node_batch_two_edges(spark):
    g = _path_graph(spark, n=7)
    st = betweenness_one_node_state(g, x=2)
    ev = _events(
        spark,
        [(1, "EDGE_ADDITION", 0, 4, 1.0), (1, "EDGE_ADDITION", 1, 6, 1.0)],
    )
    st2 = incremental_betweenness_one_node(st, ev)
    cold = betweenness_one_node_state(st2.graph, x=2)
    assert st2.bcx() == pytest.approx(cold.bcx())
    got = sorted(map(tuple, st2.pairs.collect()))
    want = sorted(map(tuple, cold.pairs.collect()))
    assert got == want


def test_dyn_betweenness_one_node_rejects_removals_and_readds(spark):
    g = _path_graph(spark, n=5)
    st = betweenness_one_node_state(g, x=2)
    with pytest.raises(ValueError):
        incremental_betweenness_one_node(
            st, _events(spark, [(1, "EDGE_REMOVAL", 0, 1, 1.0)])
        )
    with pytest.raises(ValueError):
        incremental_betweenness_one_node(
            st, _events(spark, [(1, "EDGE_ADDITION", 0, 1, 1.0)])
        )


def test_dyn_approx_betweenness_insertion_matches_cold_rebuild(spark):
    from networkit_spark.streaming.dyndist import (
        approx_betweenness_state,
        incremental_approx_betweenness,
    )

    g = _path_graph(spark, n=8)
    st = approx_betweenness_state(g, epsilon=0.35, delta=0.3, seed=5, max_samples=10)
    ev = _events(spark, [(1, "EDGE_ADDITION", 0, 5, 1.0)])
    st2 = incremental_approx_betweenness(st, ev)
    # the same seed on the post-event graph draws the same pairs (no
    # node additions), so warm fw/bw must equal a cold rebuild exactly
    cold = approx_betweenness_state(
        st2.graph, epsilon=0.35, delta=0.3, seed=5, max_samples=10
    )
    assert st2.pairs == cold.pairs
    assert sorted(map(tuple, st2.fw.collect())) == sorted(map(tuple, cold.fw.collect()))
    assert sorted(map(tuple, st2.bw.collect())) == sorted(map(tuple, cold.bw.collect()))
    warm = {r["node"]: r["score"] for r in st2.scores().collect()}
    coldsc = {r["node"]: r["score"] for r in cold.scores().collect()}
    assert warm == pytest.approx(coldsc)


def test_dyn_approx_betweenness_scores_sane(spark):
    from networkit_spark.streaming.dyndist import approx_betweenness_state

    g = _path_graph(spark, n=6)
    st = approx_betweenness_state(g, epsilon=0.35, delta=0.3, seed=2, max_samples=12)
    scores = {r["node"]: r["score"] for r in st.scores().collect()}
    assert set(scores) == set(range(6))
    assert all(0.0 <= v <= 1.0 for v in scores.values())
    # on a path, interior nodes dominate endpoints
    assert max(scores[0], scores[5]) <= min(scores[2], scores[3]) + 1e-12


def test_dyn_approx_betweenness_rejects_bad_batches(spark):
    from networkit_spark.streaming.dyndist import (
        approx_betweenness_state,
        incremental_approx_betweenness,
    )

    g = _path_graph(spark, n=5)
    st = approx_betweenness_state(g, epsilon=0.4, delta=0.3, seed=1, max_samples=6)
    with pytest.raises(ValueError):
        incremental_approx_betweenness(
            st, _events(spark, [(1, "EDGE_REMOVAL", 0, 1, 1.0)])
        )
    with pytest.raises(ValueError):
        incremental_approx_betweenness(
            st, _events(spark, [(1, "EDGE_ADDITION", 0, 1, 1.0)])
        )
