"""Interop tests against REAL reference-distribution input fixtures
(copied into tests/fixtures/reference/ from the reference checkout's
input/ directory — the reference tree itself is never read at runtime).

Golden values are derived from the FILES (headers, line counts, public
facts about the datasets), not from our readers, so these close the
loop on format semantics: METIS (karate/celegans), EdgeList (example),
KONECT (foodweb-baydry), GML (jazz2/looptest incl. self-loops), DGS004
(example2.dgs incl. the ``rn`` NODE_RESTORATION tag,
``cpp/dynamics/DGSStreamParser.cpp:112``), and Cover files.
"""

import os

from pyspark.sql import functions as F

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference")


def _p(name):
    return os.path.join(FIX, name)


def test_metis_karate(spark):
    """Zachary karate club: header '34 78 0'; node 1's adjacency line
    lists 16 neighbors, node 34's lists 17 (degrees of the two hubs)."""
    from networkit_spark.sources.metis import read_metis

    g = read_metis(spark, _p("karate.graph"))
    assert g.num_nodes() == 34
    assert g.num_edges() == 78
    deg = {r["node"]: r["deg"] for r in g.degrees().collect()}
    assert deg[0] == 16 and deg[33] == 17


def test_metis_celegans(spark):
    """celegans_metabolic.graph header: '453 2025 0'."""
    from networkit_spark.sources.metis import read_metis

    g = read_metis(spark, _p("celegans_metabolic.graph"))
    assert g.num_nodes() == 453
    assert g.num_edges() == 2025


def test_edgelist_example(spark):
    """example.edgelist: 20 tab-separated 1-based pairs, each of the 10
    undirected edges listed in both directions over nodes 1..10."""
    from networkit_spark.sources.edgelist import read_edge_list

    g = read_edge_list(spark, _p("example.edgelist"), separator="\t", first_node=1)
    assert g.num_edges() == 10
    ids = [r["id"] for r in g.vertices().collect()]
    assert len(ids) == 10 and min(ids) == 0 and max(ids) == 9


def test_konect_foodweb(spark):
    """foodweb-baydry.konect header: '% asym posweighted' / '% 2137 128
    128' — 2137 weighted directed edges over 128 nodes."""
    from networkit_spark.sources.edgelist import read_konect

    g = read_konect(spark, _p("foodweb-baydry.konect"), directed=True)
    assert g.edges.count() == 2137
    assert g.num_nodes() == 128
    # weights parsed (first data line: 1 2 1.261404)
    w = g.edges.where((F.col("src") == 0) & (F.col("dst") == 1)).collect()
    assert len(w) == 1 and abs(w[0]["weight"] - 1.261404) < 1e-9


def test_gml_jazz2(spark):
    """jazz2_undirected.gml: 5 nodes, 4 edges of which two are
    self-loops (0-0, 1-1); directed variant same counts."""
    from networkit_spark.sources.gml import read_gml

    g = read_gml(spark, _p("jazz2_undirected.gml"))
    assert g.num_nodes() == 5
    assert g.num_edges() == 4
    assert g.edges.where(F.col("src") == F.col("dst")).count() == 2
    gd = read_gml(spark, _p("jazz2_directed.gml"))
    assert gd.num_nodes() == 5 and gd.edges.count() == 4


def test_gml_looptests(spark):
    """looptest1.gml: 9 node blocks, 12 edge blocks; looptest2.gml has
    the same nodes plus two more loop edges (14)."""
    from networkit_spark.sources.gml import read_gml

    g1 = read_gml(spark, _p("looptest1.gml"))
    assert g1.num_nodes() == 9 and g1.edges.count() == 12
    g2 = read_gml(spark, _p("looptest2.gml"))
    assert g2.num_nodes() == 9 and g2.edges.count() == 14


def test_dgs_example2(spark):
    """example2.dgs: 15 events across 2 batches over 6 names, including
    one ``rn`` NODE_RESTORATION; write→read round-trips the multiset."""
    import tempfile

    from networkit_spark.sources.dgs import read_dgs, write_dgs
    from networkit_spark.streaming.events import NODE_RESTORATION

    ev, names = read_dgs(spark, _p("example2.dgs"))
    rows = ev.collect()
    assert len(rows) == 15
    assert {r["batch"] for r in rows} == {0, 1}
    assert names.count() == 6
    assert sum(1 for r in rows if r["kind"] == NODE_RESTORATION) == 1
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "rt.dgs")
        write_dgs(ev, path)
        ev2, _ = read_dgs(spark, path)
        assert sorted(map(tuple, ev2.collect())) == sorted(map(tuple, rows))


def test_cover_overlapping(spark):
    """community_overlapping.cover: 8 communities, 26 memberships over
    nodes 0..9."""
    from networkit_spark.sources.cover import read_cover

    c = read_cover(spark, _p("community_overlapping.cover")).persist()
    assert c.count() == 26
    assert c.select("subset").distinct().count() == 8
    mm = c.agg(F.min("node"), F.max("node")).collect()[0]
    assert (mm[0], mm[1]) == (0, 9)
