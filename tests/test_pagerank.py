"""PageRank golden + oracle tests (FIXTURES.md F1, F5, F6, F7)."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.pagerank import pagerank

from .conftest import edges_df
from .oracles import pagerank_oracle

# F1 — 8-node weighted graph, Matlab golden values
# (cpp/centrality/test/CentralityGTest.cpp:522-561)
F1_EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
F1_GOLDEN = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]


def _scores(df, n):
    rows = {r["node"]: r["rank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("impl", ["sql", "csr"])
def test_f1_matlab_golden(spark, impl):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    got = _scores(pagerank(g, damp=0.85, tol=1e-6, impl=impl), 8)
    assert np.allclose(got, F1_GOLDEN, atol=1e-4)


@pytest.mark.parametrize("impl", ["sql", "csr"])
def test_f1_oracle_1e6(spark, impl):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    got = _scores(pagerank(g, damp=0.85, tol=1e-12, max_iter=25, impl=impl), 8)
    want = pagerank_oracle(8, F1_EDGES, damp=0.85, tol=1e-12, max_iter=25)
    assert np.allclose(got, want, atol=1e-6)


def test_f5_self_loops(spark):
    """Self-loop wdeg double-count rule (cpp/graph/Graph.cpp:497-524)."""
    edges = F1_EDGES + [(2, 2, 1.0), (6, 6, 2.5)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _scores(pagerank(g, tol=1e-12, max_iter=25, impl="sql"), 8)
    want = pagerank_oracle(8, edges, tol=1e-12, max_iter=25)
    assert np.allclose(got, want, atol=1e-6)
    assert len(got) == 8  # ranking length invariant (test_algorithms.py:91-97)


@pytest.mark.parametrize("impl", ["sql", "csr"])
def test_f6_directed_dangling(spark, impl):
    """Directed star+chain with a dangling sink: in-edge summation, mass
    lost (not redistributed), final normalization (PageRank.cpp:37-68)."""
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (5, 2)]  # 4 dangling
    g = EdgeGraph.from_edges(edges_df(spark, edges), directed=True)
    got = _scores(pagerank(g, tol=1e-12, max_iter=30, impl=impl), 6)
    want = pagerank_oracle(6, edges, tol=1e-12, max_iter=30, directed=True)
    assert np.allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_f7_partition_count_equivalence(spark):
    """2 vs 8 partitions → allclose 1e-6 (Spark analog of parallel-vs-
    sequential equivalence, ConnectedComponentsGTest.cpp:75-89)."""
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    a = _scores(pagerank(g, tol=1e-12, max_iter=15, impl="csr", num_parts=2), 8)
    b = _scores(pagerank(g, tol=1e-12, max_iter=15, impl="csr", num_parts=8), 8)
    assert np.allclose(a, b, atol=1e-6)


def test_checkpoint_resume(spark, tmp_path):
    """Resumability: kill after k supersteps, resume from durable
    checkpoint, converge to identical scores (north rule)."""
    from networkit_spark.linkgraph.superstep import Checkpointer

    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    d = str(tmp_path / "ck")
    ck1 = Checkpointer(d, interval=2)
    _ = pagerank(g, tol=1e-12, impl="sql", max_iter=4, checkpointer=ck1)
    # resume: continues from iter 4 (durable) rather than restarting
    ck2 = Checkpointer(d, interval=2)
    got = _scores(pagerank(g, tol=1e-6, impl="sql", checkpointer=ck2), 8)
    want = pagerank_oracle(8, F1_EDGES, tol=1e-6)
    # resumed run appends no fresh iteration-0 row (it continued from 4+);
    # history may also hold retention records ({"pruned": K}) with no
    # iteration key
    assert sum(1 for r in ck2.history if r.get("iteration") == 0) == 1
    assert max(r["iteration"] for r in ck2.history if "iteration" in r) >= 5
    assert np.allclose(got, want, atol=1e-6)
