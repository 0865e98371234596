"""Significance community cleanup (cpp/community/cleanup/).

Oracles: exact small-n checks of the statistical helpers against brute
sums, and the reference's documented behavior on planted fixtures —
significant (clique) communities survive, spurious attached nodes are
stripped, random node sets are discarded, and a left-out clique member
is re-adopted by the candidate phase.
"""

import math
import random

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.cleanup import (
    _binom_right_cum,
    _hyper_pmf,
    _hyper_right_cum,
    significance_cleanup,
)
from tests.conftest import edges_df


def test_binom_right_cum_matches_brute_sum():
    for n, p, k in [(10, 0.3, 4), (25, 0.05, 1), (25, 0.05, 3), (7, 0.9, 7)]:
        want = sum(
            math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k, n + 1)
        )
        assert _binom_right_cum(p, n, k) == pytest.approx(want, rel=1e-9)
    assert _binom_right_cum(0.5, 10, 0) == 1.0
    assert _binom_right_cum(0.5, 10, 11) == 0.0


def test_hyper_right_cum_matches_brute_sum():
    N, K, n = 50, 12, 9
    pmfs = [_hyper_pmf(N, K, n, k) for k in range(0, n + 1)]
    assert sum(pmfs) == pytest.approx(1.0, rel=1e-9)
    for k_min in (0, 3, 7):
        assert _hyper_right_cum(N, K, n, k_min) == pytest.approx(
            sum(pmfs[k_min:]), rel=1e-9
        )


def _noisy_clique_graph(seed=7):
    """Two 8-cliques on 0-7 / 8-15 over sparse ER background on 60 nodes."""
    rng = random.Random(seed)
    edges = set()
    for base in (0, 8):
        for i in range(base, base + 8):
            for j in range(i + 1, base + 8):
                edges.add((i, j))
    for _ in range(90):
        u, v = rng.randrange(60), rng.randrange(60)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return sorted(edges)


def _cover_df(spark, assignments):
    return spark.createDataFrame(assignments, "node long, community long")


def test_clique_community_survives_and_random_set_discarded(spark):
    g = EdgeGraph.from_edges(edges_df(spark, _noisy_clique_graph()))
    cover = _cover_df(
        spark,
        [(u, 0) for u in range(8)]
        + [(u, 1) for u in (20, 31, 42, 53, 17, 28, 39, 50)],
    )
    out = significance_cleanup(g, cover)
    by_comm = {}
    for r in out.collect():
        by_comm.setdefault(r["community"], set()).add(r["node"])
    # the planted clique is statistically significant and kept whole
    assert by_comm.get(0) == set(range(8))
    # eight scattered nodes have no internal structure -> dropped
    assert 1 not in by_comm


def test_spurious_attached_node_is_stripped(spark):
    # clique 0-7 plus node 58 wired to exactly one clique member
    edges = _noisy_clique_graph() + [(7, 58)]
    g = EdgeGraph.from_edges(edges_df(spark, sorted(set(edges))))
    cover = _cover_df(spark, [(u, 0) for u in range(8)] + [(58, 0)])
    out = {r["node"] for r in significance_cleanup(g, cover).collect()}
    assert out == set(range(8))


def test_merge_discarded_reassembles_split_clique(spark):
    """mergeDiscarded (MergeCommunities.cpp:31-287): a significant clique
    presented as two insignificant halves must come back as ONE merged
    significant community; pure-noise discards must stay out."""
    # bigger sparse background (n=300) so the significance statistics
    # have room: in the 60-node fixture an 18-node candidate is a third
    # of the graph and nothing is rejectable
    rng = random.Random(11)
    edges = set()
    for i in range(8):
        for j in range(i + 1, 8):
            edges.add((i, j))
    for _ in range(450):
        u, v = rng.randrange(300), rng.randrange(300)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    g = EdgeGraph.from_edges(edges_df(spark, sorted(edges)))
    # each half mixes 4 clique members with 5 noise nodes: its cleanup
    # result (the re-adopted full clique) overlaps the original < 0.5 →
    # smallOverlap discards BOTH halves, so only merge can recover them
    halves = (
        [(u, 10) for u in (0, 1, 2, 3, 120, 131, 142, 153, 117)]
        + [(u, 11) for u in (4, 5, 6, 7, 128, 139, 150, 121, 132)]
    )
    noise = [(u, 12) for u in (122, 133, 144, 155)]
    cover = _cover_df(spark, halves + noise)
    base = significance_cleanup(g, cover)
    base_comms = {r["community"] for r in base.collect()}
    merged = significance_cleanup(g, cover, merge_discarded=True)
    by_comm = {}
    for r in merged.collect():
        by_comm.setdefault(r["community"], set()).add(r["node"])
    # some community (possibly after re-adoption) now holds the whole clique
    assert any(set(range(8)) <= m for m in by_comm.values()), by_comm
    # merge never drops previously-kept communities
    assert base_comms <= set(by_comm)
    # scattered noise nodes are still not grouped together
    assert not any({120, 131, 142, 153} <= m for m in by_comm.values())


def test_left_out_member_is_adopted(spark):
    g = EdgeGraph.from_edges(edges_df(spark, _noisy_clique_graph()))
    cover = _cover_df(spark, [(u, 0) for u in range(7)])  # member 7 missing
    out = {r["node"] for r in significance_cleanup(g, cover).collect()}
    assert out == set(range(8))


def test_egosplit_cleanup_integration(spark):
    """The fork's flagship pairing: ego_splitting(cleanup=True) routes
    the cover through the significance post-pass and keeps recovering
    the planted overlapping communities."""
    from networkit_spark.operators.egosplit import cover_f1, ego_splitting
    from tests.conftest import edges_df

    # two dense 8-cliques sharing node 7 (the overlap), plus a bridge
    edges = []
    for base in (0, 7):
        nodes = list(range(base, base + 8))
        edges += [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    cov = ego_splitting(g, cleanup=True)
    truth = spark.createDataFrame(
        [(i, 0) for i in range(8)] + [(i, 1) for i in range(7, 15)],
        "node long, label long",
    )
    f1 = cover_f1(cov, truth)
    assert f1 >= 0.8, f1
