"""GCE (Greedy Community Expansion) vs an independent brute-force oracle.

The oracle re-implements ``cpp/scd/GCE.cpp`` semantics naively — sets and
from-scratch recomputation of every quantity each round — so it shares no
bookkeeping with the incremental pandas path it checks.
"""

import math
import random

import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.scd import gce
from tests.conftest import edges_df


def _brute_gce(edges, seed, objective):
    """Naive reference: recompute intW/extW/boundary from scratch per step."""
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0.0) + w
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0.0) + w
    wdeg = {u: sum(nb.values()) for u, nb in adj.items()}
    community = {seed}

    def int_ext(C):
        iw = ew = 0.0
        for u in C:
            for v, w in adj.get(u, {}).items():
                if v in C:
                    iw += w
                else:
                    ew += w
        return iw / 2.0, ew

    def boundary(C):
        return {u for u in C if any(v not in C for v in adj.get(u, {}))}

    def quality(C):
        iw, ew = int_ext(C)
        if objective == "M":
            return math.inf if ew == 0 and iw > 0 else (float("nan") if ew == 0 else iw / ew)
        b = len(boundary(C))
        den = len(C) * ew
        num = 2.0 * iw * b
        return math.inf if den == 0 and num > 0 else (float("nan") if den == 0 else num / den)

    cur_q = 0.0
    while True:
        shell = {
            v
            for u in community
            for v in adj.get(u, {})
            if v not in community
        }
        best_dq, best_v = 0.0, None
        for v in sorted(shell):
            q = quality(community | {v})
            dq = q - cur_q if not math.isinf(q) else math.inf
            if math.isnan(q):
                continue
            if dq > best_dq or best_v is None and dq >= 0.0:
                best_dq, best_v = dq, v
        if best_v is None:
            break
        community.add(best_v)
        if not math.isinf(best_dq):
            cur_q += best_dq
    return community


def _clique(offset, k):
    return [(offset + i, offset + j, 1.0) for i in range(k) for j in range(i + 1, k)]


@pytest.mark.parametrize("objective", ["M", "L"])
def test_gce_two_planted_cliques(spark, objective):
    edges = _clique(0, 5) + _clique(10, 5) + [(4, 10, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = gce(g, [0, 12], objective=objective)
    by_seed = {}
    for r in got.collect():
        by_seed.setdefault(r["seed"], set()).add(r["node"])
    assert by_seed[0] == {0, 1, 2, 3, 4}
    assert by_seed[12] == {10, 11, 12, 13, 14}


@pytest.mark.parametrize("objective", ["M", "L"])
def test_gce_matches_brute_oracle(spark, objective):
    rng = random.Random(7)
    # two noisy clusters + sprinkle edges
    edges = set()
    for base in (0, 20):
        for _ in range(60):
            u, v = rng.sample(range(base, base + 12), 2)
            edges.add((min(u, v), max(u, v)))
    for _ in range(6):
        u = rng.randrange(0, 12)
        v = rng.randrange(20, 32)
        edges.add((u, v))
    elist = [(u, v, 1.0) for u, v in sorted(edges)]
    g = EdgeGraph.from_edges(edges_df(spark, elist))
    for seed in (0, 25):
        want = _brute_gce(elist, seed, objective)
        got = {r["node"] for r in gce(g, [seed], objective=objective).collect()}
        assert got == want, f"seed={seed} objective={objective}"


def test_gce_weighted_pulls_heavy_side(spark):
    # triangle 0-1-2 heavy; node 3 lightly attached AND dangling outward
    # (without the 3-4 tail, absorbing 3 zeroes the external weight and M
    # jumps to +inf — the reference would also absorb it then)
    edges = [(0, 1, 5.0), (1, 2, 5.0), (0, 2, 5.0), (2, 3, 0.1), (3, 4, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    got = {r["node"] for r in gce(g, [0], objective="M").collect()}
    assert {0, 1, 2} <= got and 3 not in got


def test_gce_rejects_self_loops_and_bad_objective(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 0, 1.0), (0, 1, 1.0)]))
    with pytest.raises(ValueError):
        gce(g, [0])
    g2 = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0)]))
    with pytest.raises(ValueError):
        gce(g2, [0], objective="X")


def test_gce_isolated_seed_and_ball_cap(spark):
    # path 0-1-2-3-4-5; seed 0 with max_hops=2 can never reach past node 2
    path = [(i, i + 1, 1.0) for i in range(5)]
    g = EdgeGraph.from_edges(edges_df(spark, path))
    got = {r["node"] for r in gce(g, [0], objective="M", max_hops=2).collect()}
    assert got <= {0, 1, 2}
    # seed not present in the graph -> singleton {seed}
    got2 = gce(g, [99]).collect()
    assert [(r["seed"], r["node"]) for r in got2] == [(99, 99)]
