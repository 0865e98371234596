"""PLP tests (FIXTURES.md F4): invariants + synchronous-oracle equality."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.plp import plp

from .conftest import edges_df
from .oracles import plp_oracle

from .test_pagerank import F1_EDGES

# two dense blocks joined by one weak edge → 2 communities
CLUSTERED = [
    (0, 1, 5.0), (0, 2, 5.0), (0, 3, 5.0), (1, 2, 5.0), (1, 3, 5.0), (2, 3, 5.0),
    (4, 5, 5.0), (4, 6, 5.0), (4, 7, 5.0), (5, 6, 5.0), (5, 7, 5.0), (6, 7, 5.0),
    (3, 4, 0.1),
]


def _labels(df, n):
    rows = {r["node"]: r["label"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("impl", ["sql", "csr", "fused"])
def test_oracle_exact(spark, impl):
    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    kw = {"impl": "csr", "fused_local": True} if impl == "fused" else {
        "impl": impl, "fused_local": False}
    got = _labels(plp(g, max_iter=10, **kw), 8)
    want = plp_oracle(8, CLUSTERED, max_iter=10)
    assert np.array_equal(got, want)


def test_fused_equals_distributed(spark):
    """The fused-local single-task path must emit exactly the distributed
    csr loop's labels (same synchronous rule) — chain + blocks + self-loop
    + isolated node exercises ties, slow propagation, and the coalesce."""
    chain = [(8 + i, 9 + i, float(1 + (i % 3))) for i in range(11)]
    edges = CLUSTERED + chain + [(25, 25, 2.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    a = {r["node"]: r["label"]
         for r in plp(g, max_iter=7, impl="csr", fused_local=True).collect()}
    b = {r["node"]: r["label"]
         for r in plp(g, max_iter=7, impl="csr", fused_local=False).collect()}
    assert a == b


def test_two_communities(spark):
    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    got = _labels(plp(g, max_iter=10, impl="sql"), 8)
    assert len(set(got[:4])) == 1 and len(set(got[4:])) == 1
    assert got[0] != got[4]


def test_partition_covers_nodes(spark):
    """Every node labeled exactly once (test_algorithms.py:156-175)."""
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    out = plp(g, max_iter=5, impl="sql")
    assert out.count() == 8
    assert out.select("node").distinct().count() == 8


def test_isolated_stays_singleton(spark):
    """PLP.cpp:54-58,81 — isolated nodes keep their own label."""
    edges = CLUSTERED + [(9, 9, 1.0)]  # 9 only self-loops: neighbor = self
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = {r["node"]: r["label"] for r in plp(g, max_iter=10, impl="sql").collect()}
    assert got[9] == 9


def test_csr_frontier_forced_exact(spark):
    """Force the CSR frontier path from sweep 2 (frontier_frac=1.0) on a
    slow-propagating fixture — must equal the synchronous oracle exactly
    (PLP.cpp:97-105 active-set semantics)."""
    # weighted chain: labels creep one hop per sweep → many small frontiers
    chain = [(i, i + 1, float(1 + (i % 3))) for i in range(11)]
    edges = CLUSTERED + [(8 + a, 8 + b, w) for a, b, w in chain]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _labels(
        plp(g, max_iter=12, impl="csr", frontier_frac=1.0, fused_local=False), 20
    )
    want = plp_oracle(20, edges, max_iter=12)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("impl", ["csr"])
def test_f7_partition_equivalence(spark, impl):
    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    a = _labels(plp(g, max_iter=6, impl=impl, num_parts=2, fused_local=False), 8)
    b = _labels(plp(g, max_iter=6, impl=impl, num_parts=8, fused_local=False), 8)
    assert np.array_equal(a, b)


def test_plm_two_communities(spark):
    """PLM (multilevel Louvain) on the clustered fixture → 2 communities
    with near-optimal modularity (PLM.cpp semantics)."""
    from networkit_spark.operators.louvain import plm
    from networkit_spark.operators.quality import modularity

    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    labels = plm(g)
    got = _labels(labels, 8)
    assert len(set(got[:4])) == 1 and len(set(got[4:])) == 1 and got[0] != got[4]
    q = modularity(g, labels)
    assert q > 0.45


def test_plm_deterministic_across_partitions(spark):
    from networkit_spark.operators.louvain import plm

    g = EdgeGraph.from_edges(edges_df(spark, CLUSTERED))
    a = _labels(plm(g), 8)
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = _labels(plm(g), 8)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert np.array_equal(a, b)


def test_plp_blob_impl_dispatch(spark):
    """plp(impl='blob') routes through the packed-store kernel and
    equals the sql impl at fixed sweeps."""
    from networkit_spark.operators.plp import plp

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    for mi in (1, 3):
        want = sorted(map(tuple, plp(g, max_iter=mi, impl="sql").collect()))
        got = sorted(map(tuple, plp(g, max_iter=mi, impl="blob").collect()))
        assert got == want
