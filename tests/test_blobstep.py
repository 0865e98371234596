"""Blob superstep engine (the PageRank fast path) — exact equivalence
with the reference oracle, resume, and reuse."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.linkgraph.blobstep import PageRankBlobEngine, pagerank_blob

from .conftest import edges_df
from .oracles import pagerank_oracle
from .test_pagerank import F1_EDGES, F1_GOLDEN


def _scores(df, n):
    rows = {r["node"]: r["rank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_f1_golden_and_oracle(spark):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    got = _scores(pagerank_blob(g, tol=1e-6, num_parts=4), 8)
    assert np.allclose(got, F1_GOLDEN, atol=1e-4)
    want = pagerank_oracle(8, F1_EDGES, tol=1e-6)
    # chain_k may overshoot the reference stop by <k iterations; the
    # perturbation is O(damp^k · tol) — far inside 1e-6
    assert np.allclose(got, want, atol=1e-6)


def test_fixed_iters_exact(spark):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    got = _scores(pagerank_blob(g, tol=1e-12, max_iter=24, num_parts=4), 8)
    want = pagerank_oracle(8, F1_EDGES, tol=1e-12, max_iter=24)
    assert np.allclose(got, want, atol=1e-12)


def test_directed_dangling(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (5, 2)]
    g = EdgeGraph.from_edges(edges_df(spark, edges), directed=True)
    got = _scores(pagerank_blob(g, tol=1e-12, max_iter=16, num_parts=4), 6)
    want = pagerank_oracle(6, edges, tol=1e-12, max_iter=16, directed=True)
    assert np.allclose(got, want, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9


def test_self_loops(spark):
    edges = F1_EDGES + [(2, 2, 1.0), (6, 6, 2.5)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = _scores(pagerank_blob(g, tol=1e-12, max_iter=16, num_parts=4), 8)
    want = pagerank_oracle(8, edges, tol=1e-12, max_iter=16)
    assert np.allclose(got, want, atol=1e-12)


def test_engine_reuse_and_attach(spark, tmp_path):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    eng = PageRankBlobEngine(g, num_parts=4, blob_dir=str(tmp_path / "store"))
    a = _scores(eng.run(tol=1e-12, max_iter=8), 8)
    b = _scores(eng.run(tol=1e-12, max_iter=8), 8)  # reuse: same store
    assert np.array_equal(a, b)
    att = PageRankBlobEngine.attach(spark, str(tmp_path / "store"))
    c = _scores(att.run(tol=1e-12, max_iter=8), 8)
    assert np.array_equal(a, c)
    eng.close()


def test_partition_count_equivalence(spark):
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    a = _scores(pagerank_blob(g, tol=1e-12, max_iter=12, num_parts=2), 8)
    b = _scores(pagerank_blob(g, tol=1e-12, max_iter=12, num_parts=8), 8)
    assert np.allclose(a, b, atol=1e-12)


def test_components_blob_matches_sql(spark):
    """run_components on the blob store == min-label sql fixpoint."""
    from networkit_spark.operators.components import connected_components
    from .test_components import F2_ALL

    g = EdgeGraph.from_edges(edges_df(spark, F2_ALL))
    blob = sorted(map(tuple, connected_components(g, impl="blob", num_parts=4).collect()))
    sql = sorted(map(tuple, connected_components(g, impl="sql").collect()))
    assert blob == sql


def test_components_blob_long_path(spark):
    from networkit_spark.operators.components import connected_components

    edges = [(i, i + 1) for i in range(40)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    labels = {r["label"] for r in connected_components(g, impl="blob", num_parts=4).collect()}
    assert labels == {0}


def test_hub_salted_matches_unsalted(spark):
    """A star-heavy graph with a forced tiny hub_cap routes the hub's
    adjacency through the salted two-stage loop; result must equal the
    unsalted fused loop bit-for-bit (same slab algebra, different
    placement)."""
    # hub 0 with 40 spokes + a tail community
    edges = [(0, i) for i in range(1, 41)] + [(41, 42), (42, 43), (40, 41)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    ref = _scores(pagerank_blob(g, tol=1e-10, num_parts=4), 44)
    salted = _scores(pagerank_blob(g, tol=1e-10, num_parts=4, hub_cap=8), 44)
    assert np.allclose(ref, salted, atol=1e-14)
    want = pagerank_oracle(44, edges, tol=1e-10)
    assert np.allclose(salted, want, atol=1e-6)


def test_fused_local_matches_distributed(spark):
    """The small-store fused-local chain (one single-task stage per
    chain_k supersteps) reproduces the distributed exchange exactly —
    PageRank to 1e-13 and CC labels bit-equal."""
    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    eng = PageRankBlobEngine(g, num_parts=4)
    a = _scores(eng.run(tol=1e-12, max_iter=16, fused_local=False), 8)
    b = _scores(eng.run(tol=1e-12, max_iter=16, fused_local=True), 8)
    assert np.allclose(a, b, atol=1e-13)
    # convergence-rule parity too (tol stop, not fixed iters)
    a = _scores(eng.run(tol=1e-8, fused_local=False), 8)
    b = _scores(eng.run(tol=1e-8, fused_local=True), 8)
    assert np.allclose(a, b, atol=1e-13)
    ca = sorted(map(tuple, eng.run_components(fused_local=False).collect()))
    cb = sorted(map(tuple, eng.run_components(fused_local=True).collect()))
    assert ca == cb
    # fixed-iteration (mid-run) CC parity: primer accounting matches
    for mi in (1, 2):
        da = sorted(map(tuple, eng.run_components(max_iter=mi, fused_local=False).collect()))
        db = sorted(map(tuple, eng.run_components(max_iter=mi, fused_local=True).collect()))
        assert da == db
    eng.close()


def test_fused_local_resume_interop(spark, tmp_path):
    """A checkpoint written by the distributed protocol resumes under
    the fused-local path (and lands on the clean-run answer): the fused
    stage emits/consumes the same kind-0/kind-1 protocol rows."""
    from networkit_spark.linkgraph.superstep import Checkpointer

    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    eng = PageRankBlobEngine(g, num_parts=4)
    want = _scores(eng.run(tol=1e-12, max_iter=16, chain_k=4, fused_local=False), 8)
    d = str(tmp_path / "ck")
    eng.run(tol=1e-12, max_iter=8, chain_k=4,
            checkpointer=Checkpointer(d), fused_local=False)
    got = _scores(
        eng.run(tol=1e-12, max_iter=16, chain_k=4,
                checkpointer=Checkpointer(d), fused_local=True), 8,
    )
    assert np.allclose(got, want, atol=1e-13)
    eng.close()


def test_plp_blob_matches_sql(spark):
    """run_plp on the blob store == the sql synchronous-sweep PLP, at
    fixed sweep counts (primer stage consumes no sweep) and at the
    theta convergence stop, on both the distributed and fused-local
    paths — the three-kernel shared-store contract the bench relies on."""
    from networkit_spark.operators.plp import plp

    g = EdgeGraph.from_edges(edges_df(spark, F1_EDGES))
    eng = PageRankBlobEngine(g, num_parts=4)
    for mi in (1, 2, 5):
        want = sorted(map(tuple, plp(g, max_iter=mi, impl="sql").collect()))
        a = sorted(map(tuple, eng.run_plp(max_iter=mi, fused_local=False).collect()))
        b = sorted(map(tuple, eng.run_plp(max_iter=mi, fused_local=True).collect()))
        assert a == want, f"distributed PLP != sql at {mi} sweeps"
        assert b == want, f"fused-local PLP != sql at {mi} sweeps"
    # convergence-rule parity under a shared cap (synchronous PLP can
    # 2-cycle on symmetric graphs, so an UNbounded run must not be the
    # test's stop condition; both impls count sweeps identically)
    want = sorted(map(tuple, plp(g, impl="sql", max_iter=24).collect()))
    got = sorted(map(tuple, eng.run_plp(max_iter=24, fused_local=True).collect()))
    assert got == want
    # same store also serves PageRank and components (the bench pattern)
    assert abs(_scores(eng.run(tol=1e-10), 8).sum() - 1.0) < 1e-9
    assert len(eng.run_components().collect()) == 8
    eng.close()


def test_plp_blob_weighted(spark):
    """Weighted label-weight sums (w blob present) and the smallest-id
    tie-break agree with the sql impl."""
    from networkit_spark.operators.plp import plp

    edges = [
        (0, 1, 3.0), (1, 2, 1.0), (2, 3, 3.0), (3, 4, 1.0),
        (4, 5, 2.0), (5, 0, 1.0), (2, 6, 2.0), (6, 7, 2.0),
    ]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    eng = PageRankBlobEngine(g, num_parts=3)
    for mi in (1, 3):
        want = sorted(map(tuple, plp(g, max_iter=mi, impl="sql").collect()))
        a = sorted(map(tuple, eng.run_plp(max_iter=mi, fused_local=False).collect()))
        b = sorted(map(tuple, eng.run_plp(max_iter=mi, fused_local=True).collect()))
        assert a == want and b == want
    eng.close()
