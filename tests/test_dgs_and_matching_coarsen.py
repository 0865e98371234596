"""DGS reader round-trip and MatchingCoarsening."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.coarsening import coarsen_by_matching
from networkit_spark.operators.forest import parallel_matching
from networkit_spark.sources.dgs import read_dgs
from networkit_spark.streaming.events import apply_events

from .conftest import edges_df

DGS = """DGS004
demo 3 9
an a
an b
an c
ae e1 a b
st
ae e2 b c
ce a-b weight=4
st
de b-c
an d
ae e3 c d
"""


def test_read_dgs_events(spark, tmp_path):
    p = tmp_path / "demo.dgs"
    p.write_text(DGS)
    events, names = read_dgs(spark, str(p))
    nm = {r["name"]: r["id"] for r in names.collect()}
    assert nm == {"a": 0, "b": 1, "c": 2, "d": 3}
    evs = [(r["batch"], r["kind"], r["u"], r["v"], r["w"]) for r in events.collect()]
    assert (0, "EDGE_ADDITION", 0, 1, 1.0) in evs
    assert (1, "EDGE_WEIGHT_UPDATE", 0, 1, 4.0) in evs
    assert (2, "EDGE_REMOVAL", 1, 2, 0.0) in evs
    # replay through the updater: final graph = {a-b w4, c-d w1}
    empty = EdgeGraph.from_edges(
        spark.createDataFrame([], "src long, dst long, weight double")
    )
    g = empty
    for b in sorted({e[0] for e in evs}):
        g = apply_events(g, events.where(F.col("batch") == b))
    final = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert final == {(0, 1): 4.0, (2, 3): 1.0}


def test_dgs_rejects_bad_magic(spark, tmp_path):
    p = tmp_path / "bad.dgs"
    p.write_text("DGS003\nx 0 0\n")
    with pytest.raises(ValueError):
        read_dgs(spark, str(p))


def test_coarsen_by_matching_path(spark):
    # path 0-1-2-3-4; matching {(0,1),(2,3)} -> coarse nodes {0,2,4}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    m = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    coarse, mapping = coarsen_by_matching(g, m)
    ce = {(r["src"], r["dst"]): r["weight"] for r in coarse.edges.collect()}
    # contracted pairs vanish (self loops dropped); 1-2 becomes 0-2, 3-4 becomes 2-4
    assert ce == {(0, 2): 1.0, (2, 4): 1.0}
    lab = {r["node"]: r["label"] for r in mapping.collect()}
    assert lab == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}


def test_coarsen_by_real_matching(spark):
    # matching from the handshake matcher contracts to ~n/2 nodes and
    # preserves total inter-pair weight
    edges = [(a, a + 1) for a in range(19)] + [(0, 19)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    m = parallel_matching(g)
    coarse, _ = coarsen_by_matching(g, m)
    n_c = coarse.num_nodes()
    assert n_c < 20
    assert coarse.edges.where("src = dst").count() == 0


def test_dgs_write_read_roundtrip(spark, tmp_path):
    """The DM generator's event stream survives write_dgs -> read_dgs
    (ids introduced in ascending order, so the dense mapping is the
    identity)."""
    from networkit_spark.operators.generators import (
        dynamic_dorogovtsev_mendes_events,
    )
    from networkit_spark.sources.dgs import read_dgs, write_dgs

    ev = dynamic_dorogovtsev_mendes_events(spark, steps=10, seed=3)
    p = str(tmp_path / "dm.dgs")
    write_dgs(ev, p)
    back, names = read_dgs(spark, p)
    def norm(df):
        # reader marks node-event v as -1, the generator as NULL — both
        # are "absent" (apply_events only reads u/v on edge kinds)
        return sorted(
            (r["batch"], r["kind"], r["u"], -1 if r["v"] in (None, -1) else r["v"])
            for r in df.collect()
            if r["kind"] in ("NODE_ADDITION", "EDGE_ADDITION")
        )

    want = norm(ev)
    got = norm(back)
    assert got == want
