"""GlobalCurveball / Curveball / EdgeSwitching invariants: degree
sequence preserved EXACTLY, simple graph stays simple, topology mixes,
runs are deterministic at any parallelism (hash RNG)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.generators import erdos_renyi
from networkit_spark.operators.randomization import (
    edge_switching,
    edge_switching_markov_chain_generator,
    global_curveball,
)


def _degmap(g):
    return {r["node"]: r["deg"] for r in g.degrees().collect()}


def _edgeset(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def _check_simple(g):
    e = g.edges.collect()
    pairs = [(r["src"], r["dst"]) for r in e]
    assert len(pairs) == len(set(pairs)), "multi-edge created"
    assert all(s <= d for s, d in pairs), "canonical form broken"


@pytest.fixture(scope="module")
def base(spark):
    g = erdos_renyi(spark, n=120, p=0.08, seed=7)
    g.edges.persist().count()
    return g


def test_global_curveball_preserves_degrees(base):
    r = global_curveball(base, rounds=4, seed=11)
    assert _degmap(r) == _degmap(base)
    _check_simple(r)
    # topology actually mixed
    assert _edgeset(r) != _edgeset(base)


def test_global_curveball_deterministic(base):
    a = global_curveball(base, rounds=2, seed=3)
    b = global_curveball(base, rounds=2, seed=3)
    assert _edgeset(a) == _edgeset(b)
    c = global_curveball(base, rounds=2, seed=4)
    assert _edgeset(a) != _edgeset(c)


def test_edge_switching_preserves_degrees(base):
    r = edge_switching(base, rounds=4, seed=5)
    assert _degmap(r) == _degmap(base)
    _check_simple(r)
    assert _edgeset(r) != _edgeset(base)


def test_edge_switching_generator_realizes_sequence(spark):
    seq = [3, 3, 2, 2, 2, 2, 1, 1]
    g = edge_switching_markov_chain_generator(spark, seq, rounds=3, seed=9)
    degs = sorted(_degmap(g).values(), reverse=True)
    assert degs == sorted(seq, reverse=True)
    _check_simple(g)


def test_global_curveball_invariants_hold_over_many_rounds(base):
    """Rounds ≥ 2 trade against the REWIRED adjacency — territory claims
    on a stale edge set could double-deal an edge created by an earlier
    round (multi-edge / degree drift)."""
    r = global_curveball(base, rounds=10, seed=23)
    assert _degmap(r) == _degmap(base)
    _check_simple(r)
