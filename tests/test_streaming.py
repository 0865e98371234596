"""Dynamic-graph events + Structured Streaming tests.

Contract from the reference: dynamic vs static recompute equivalence
(ConnectedComponentsGTest.cpp:257-328)."""

import time

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.components import connected_components
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    EDGE_WEIGHT_INCREMENT,
    EDGE_WEIGHT_UPDATE,
    EVENT_SCHEMA,
    apply_events,
    incremental_components,
    streaming_hourly_counts,
)

from .conftest import edges_df


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_apply_events(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)]))
    ev = _ev(
        spark,
        [
            (0, EDGE_ADDITION, 3, 4, 1.5),
            (0, EDGE_REMOVAL, 0, 1, 0.0),
            (0, EDGE_WEIGHT_UPDATE, 1, 2, 9.0),
            (0, EDGE_WEIGHT_INCREMENT, 2, 3, 0.5),
        ],
    )
    g2 = apply_events(g, ev)
    rows = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert rows == {(1, 2): 9.0, (2, 3): 1.5, (3, 4): 1.5}


def test_incremental_cc_matches_static(spark):
    base = [(0, 1), (2, 3), (4, 5)]
    g = EdgeGraph.from_edges(edges_df(spark, base))
    labels0 = connected_components(g, impl="sql")
    # batch 1: merge components 0-1 and 2-3
    ev1 = _ev(spark, [(1, EDGE_ADDITION, 1, 2, 1.0)])
    g1, l1 = incremental_components(g, labels0, ev1)
    static1 = connected_components(g1, impl="sql")
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, static1.collect()))
    # batch 2: removal → split path triggers recompute
    ev2 = _ev(spark, [(2, EDGE_REMOVAL, 1, 2, 0.0)])
    g2, l2 = incremental_components(g1, l1, ev2)
    static2 = connected_components(g2, impl="sql")
    assert sorted(map(tuple, l2.collect())) == sorted(map(tuple, static2.collect()))


def test_structured_streaming_windowed(spark, tmp_path):
    """readStream → watermark → 1h tumbling window → memory sink."""
    src = str(tmp_path / "events_src")
    ck = str(tmp_path / "ck")
    ev = spark.createDataFrame(
        [
            (0, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 00:50:00", 2, "click", 2.0, "{}"),
            (2, "2024-01-01 01:10:00", 1, "buy", 5.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id", "event_type", "value", "props"
    )
    ev.write.mode("overwrite").parquet(src)
    q = streaming_hourly_counts(spark, src, ck)
    try:
        q.processAllAvailable()
        out = {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("select * from hourly_counts").collect()
        }
    finally:
        q.stop()
    assert out[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 01:00:00", "buy")] == (1, 5.0)


def test_incremental_pagerank_matches_cold(spark):
    """Warm-started Dyn* PageRank converges to the cold-recompute
    fixpoint (unique fixed point of the affine contraction)."""
    import numpy as np
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.streaming.events import incremental_pagerank

    base = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, base))
    r0 = pagerank(g, tol=1e-10, impl="sql")
    ev = _ev(spark, [(1, EDGE_ADDITION, 1, 3, 2.0)])
    g2, warm = incremental_pagerank(g, r0, ev, tol=1e-10)
    cold = pagerank(g2, tol=1e-10, impl="sql")
    w = {r["node"]: r["rank"] for r in warm.collect()}
    c = {r["node"]: r["rank"] for r in cold.collect()}
    assert all(abs(w[i] - c[i]) < 1e-6 for i in range(4))


def test_overview(spark):
    from networkit_spark.operators.profiling import overview

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (0, 2), (3, 4)]))
    o = overview(g)
    assert o["nodes"] == 5 and o["edges"] == 4 and o["components"] == 2
    assert o["max_degree"] == 2 and o["self_loops"] == 0
    assert o["global_clustering"] > 0


def test_incremental_katz_matches_cold(spark):
    """Warm-started DynKatz converges to the cold-recompute fixed point
    (x ← αAx + β is a contraction for α < 1/λ_max, so the fixed point is
    unique and warm/cold starts agree)."""
    from networkit_spark.operators.spectral import katz_centrality
    from networkit_spark.streaming.events import incremental_katz

    base = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0), (0, 2, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, base))
    s0 = katz_centrality(g, alpha=0.05, tol=1e-12)
    ev = _ev(spark, [(1, EDGE_ADDITION, 1, 3, 1.0)])
    g2, warm = incremental_katz(g, s0, ev, alpha=0.05, tol=1e-12)
    cold = katz_centrality(g2, alpha=0.05, tol=1e-12)
    w = {r["node"]: r["score"] for r in warm.collect()}
    c = {r["node"]: r["score"] for r in cold.collect()}
    assert all(abs(w[i] - c[i]) < 1e-6 for i in range(4))


def test_dynamic_dorogovtsev_mendes_stream(spark):
    """The DM event stream drives the streaming layer: applying all
    batches yields the closed-form counts (n = 3+steps, m = 3+2·steps),
    every post-initial node arrives with degree 2, and the stream is
    deterministic at a fixed seed."""
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.generators import (
        dynamic_dorogovtsev_mendes_events,
    )
    from networkit_spark.streaming.events import apply_events

    steps = 30
    ev = dynamic_dorogovtsev_mendes_events(spark, steps=steps, seed=42)
    empty = EdgeGraph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        directed=False,
        weighted=False,
    )
    g = apply_events(empty, ev)
    assert g.num_nodes() == 3 + steps
    assert g.num_edges() == 3 + 2 * steps
    # triangle-growth invariant: the graph stays connected
    from networkit_spark.operators.components import connected_components

    labels = connected_components(g)
    assert labels.select("label").distinct().count() == 1
    # determinism
    again = dynamic_dorogovtsev_mendes_events(spark, steps=steps, seed=42)
    assert ev.collect() == again.collect()
    # incremental consumption batch-by-batch matches the full apply
    half = apply_events(empty, ev.where(F.col("batch") <= steps // 2))
    rest = apply_events(half, ev.where(F.col("batch") > steps // 2))
    a = sorted(map(tuple, rest.edges.collect()))
    b = sorted(map(tuple, g.edges.collect()))
    assert a == b


def test_epidemic_seir_wave(spark):
    """Deterministic SEIR wave on the path 0-1-2-3 with trans_p = 1:
    hand-traced census at every step (synchronous-sweep semantics)."""
    from networkit_spark.streaming.simulation import epidemic_simulation_seir

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    out = epidemic_simulation_seir(
        g, t_max=8, trans_p=1.0, e_time=1, i_time=2, zero=0
    ).collect()
    census = {(r["t"], r["state"]): r["count"] for r in out}
    n = 4
    for t in range(8):
        assert sum(census[(t, s)] for s in range(4)) == n
    # t=0: zero infectious, neighbor 1 exposed
    assert census[(0, 2)] == 1 and census[(0, 1)] == 1 and census[(0, 0)] == 2
    # t=2: zero removed, wavefront at node 1 (I), node 2 exposed
    assert census[(2, 3)] == 1 and census[(2, 2)] == 1 and census[(2, 1)] == 1
    # t=7: everyone removed
    assert census[(7, 3)] == n
    # removed count never decreases
    for t in range(1, 8):
        assert census[(t, 3)] >= census[(t - 1, 3)]


def test_node_removal_drops_incident_edges(spark):
    from networkit_spark.streaming.events import apply_events

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    ev = spark.createDataFrame(
        [(1, "NODE_REMOVAL", 1, None, None)],
        "batch long, kind string, u long, v long, w double",
    )
    g2 = apply_events(g, ev)
    left = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert left == {(2, 3), (0, 3)}
    assert 1 not in {r["id"] for r in g2.vertices().collect()}


def test_graph_difference_roundtrip(spark):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.streaming.events import apply_events, graph_difference

    g1 = EdgeGraph.from_edges(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)],
            "src long, dst long, weight double",
        )
    )
    g2 = EdgeGraph.from_edges(
        spark.createDataFrame(
            [(0, 1, 1.0), (2, 3, 1.0), (3, 4, 5.0), (0, 2, 1.5)],
            "src long, dst long, weight double",
        )
    )
    edits = graph_difference(g1, g2)
    kinds = {(r["kind"], r["u"], r["v"]) for r in edits.collect()}
    assert kinds == {
        ("EDGE_REMOVAL", 1, 2),
        ("EDGE_ADDITION", 3, 4),
        ("EDGE_ADDITION", 0, 2),
    }
    g1b = apply_events(g1, edits)
    got = sorted(map(tuple, g1b.edges.collect()))
    want = sorted(map(tuple, g2.edges.collect()))
    assert got == want
    # identical graphs -> empty edit script
    assert graph_difference(g2, g2).count() == 0


def test_graph_difference_rejects_directed(spark):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.streaming.events import graph_difference

    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    d = EdgeGraph.from_edges(e, directed=True)
    u = EdgeGraph.from_edges(e)
    import pytest as _pt

    with _pt.raises(ValueError):
        graph_difference(d, u)
