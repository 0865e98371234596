"""Reader/writer tests — EdgeListReader/SNAP/KONECT/METIS semantics."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources import (
    read_edge_list,
    read_konect,
    read_metis,
    read_snap,
    write_edge_list,
)
from networkit_spark.sources.edgelist import read_partition, write_partition


def test_edge_list_reader(spark, tmp_path):
    p = tmp_path / "g.edgelist"
    p.write_text("# comment\n0 1\n1 2 2.5\n\n2 0\n")
    g = read_edge_list(spark, str(p))
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 2.5, (0, 2): 1.0}


def test_edge_list_first_node_offset(spark, tmp_path):
    p = tmp_path / "g1.edgelist"
    p.write_text("1 2\n2 3\n")
    g = read_edge_list(spark, str(p), first_node=1)
    rows = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert rows == {(0, 1), (1, 2)}


def test_edge_list_noncontinuous_ids(spark, tmp_path):
    """String→node map path (EdgeListReader.h:69-72): densify ids."""
    p = tmp_path / "g2.edgelist"
    p.write_text("alice bob\nbob carol\n")
    g = read_edge_list(spark, str(p), continuous=False)
    assert g.num_nodes() == 3 and g.num_edges() == 2
    keys = {r["key"] for r in g.id_map.collect()}
    assert keys == {"alice", "bob", "carol"}
    ids = {r["id"] for r in g.id_map.collect()}
    assert ids == {0, 1, 2}


def test_snap_and_konect(spark, tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("# SNAP\n0\t1\n1\t2\n")
    g = read_snap(spark, str(p))
    assert g.directed and g.num_edges() == 2
    k = tmp_path / "k.konect"
    k.write_text("% konect\n1 2 3.0\n1 2 4.0\n2 3 1.0\n")
    gk = read_konect(spark, str(k), multi_edge="sum")
    rows = {(r["src"], r["dst"]): r["weight"] for r in gk.edges.collect()}
    # KONECT ids are 1-based (reference maps in-1): 1→0, 2→1, 3→2
    assert rows[(0, 1)] == 7.0 and rows[(1, 2)] == 1.0


def test_metis_reader(spark, tmp_path):
    # 4-node path graph 0-1-2-3 in METIS (1-based neighbor lists)
    p = tmp_path / "g.graph"
    p.write_text("% metis\n4 3\n2\n1 3\n2 4\n3\n")
    g = read_metis(spark, str(p))
    rows = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert rows == {(0, 1), (1, 2), (2, 3)}


def test_metis_fmt_001_edge_weights(spark, tmp_path):
    """fmt '001' is the standard METIS spelling for edge weights
    (METISGraphReader.cpp: weighted = fmt % 10 == 1)."""
    p = tmp_path / "w.graph"
    p.write_text("3 2 001\n2 5.0\n1 5.0 3 2.5\n2 2.5\n")
    g = read_metis(spark, str(p))
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 5.0, (1, 2): 2.5}


def test_metis_fmt_011_vertex_weights_skipped(spark, tmp_path):
    """fmt '011' (vertex + edge weights): the leading ncon vertex-weight
    values per line are skipped (ignoreFirst = ncon)."""
    p = tmp_path / "vw.graph"
    p.write_text("3 2 011 1\n7 2 5.0\n9 1 5.0 3 2.5\n4 2 2.5\n")
    g = read_metis(spark, str(p))
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 5.0, (1, 2): 2.5}


def test_metis_fmt_010_vertex_weights_unweighted(spark, tmp_path):
    """fmt '010': vertex weights only — skip them, edges unweighted."""
    p = tmp_path / "v.graph"
    p.write_text("3 2 010\n7 2\n9 1 3\n4 2\n")
    g = read_metis(spark, str(p))
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 1.0}


def test_writers_roundtrip(spark, tmp_path):
    p = tmp_path / "g.edgelist"
    p.write_text("0 1 2.0\n1 2 3.0\n")
    g = read_edge_list(spark, str(p))
    out = tmp_path / "out"
    write_edge_list(g, str(out))
    g2 = read_edge_list(spark, str(out), separator="\t")
    assert sorted(map(tuple, g2.edges.collect())) == sorted(map(tuple, g.edges.collect()))
    labels = spark.createDataFrame([(0, 0), (1, 0), (2, 2)], "node long, label long")
    write_partition(labels, str(tmp_path / "part"))
    back = read_partition(spark, str(tmp_path / "part"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, labels.collect()))


def test_read_graph_dispatch(spark, tmp_path):
    """readGraph/writeGraph Format dispatch (networkit/graphio.py):
    extension inference, explicit fmt, parquet native path, roundtrip."""
    from networkit_spark.sources import read_graph, write_graph

    p = tmp_path / "d.edgelist"
    p.write_text("0 1\n1 2 2.5\n")
    g = read_graph(spark, str(p))  # inferred: edgelist
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 2.5}

    m = tmp_path / "d.graph"  # inferred: metis (1-based adjacency)
    m.write_text("3 2\n2\n1 3\n2\n")
    gm = read_graph(spark, str(m))
    assert gm.num_edges() == 2

    gs = read_graph(spark, str(p), fmt="edgelist_space_zero")
    assert gs.num_edges() == 2

    out = tmp_path / "out.edgelist"
    write_graph(g, str(out), fmt="edgelist")
    g2 = read_graph(spark, str(out), fmt="edgelist")
    rows2 = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert rows2 == rows

    pq = tmp_path / "out.parquet"
    write_graph(g, str(pq))  # parquet inferred from extension
    g3 = read_graph(spark, str(pq))
    rows3 = {(r["src"], r["dst"]): r["weight"] for r in g3.edges.collect()}
    assert rows3 == rows

    with pytest.raises(ValueError):
        read_graph(spark, str(tmp_path / "x.unknownext"))


def test_gml_and_graphml_roundtrip(spark, tmp_path):
    from networkit_spark.sources import read_graph, write_graph
    from networkit_spark.graph import EdgeGraph
    from tests.conftest import edges_df

    g = EdgeGraph.from_edges(
        edges_df(spark, [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)])
    )
    for fmt in ("gml", "graphml"):
        p = str(tmp_path / f"g.{fmt}")
        write_graph(g, p)  # format inferred from extension
        back = read_graph(spark, p)
        a = sorted(map(tuple, g.edges.collect()))
        b = sorted(map(tuple, back.edges.collect()))
        assert a == b, fmt
        assert back.directed == g.directed
        assert back.declared_nodes == 4


def test_matrix_market_symmetric_and_pattern(spark, tmp_path):
    """MatrixMarketReader.cpp banner/qualifier semantics: 1-based ids,
    symmetric → undirected, pattern → weight 1.0."""
    from networkit_spark.sources.formats import read_matrix_market

    p = tmp_path / "a.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% a comment\n"
        "3 3 3\n"
        "1 2 2.5\n"
        "2 3 1.0\n"
        "3 1 4.0\n"
    )
    g = read_matrix_market(spark, str(p))
    assert not g.directed and g.declared_nodes == 3
    rows = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert rows == {(0, 1): 2.5, (1, 2): 1.0, (0, 2): 4.0}

    q = tmp_path / "b.mtx"
    q.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "2 2 2\n1 2\n2 1\n"
    )
    h = read_matrix_market(spark, str(q))
    assert h.directed
    rows = {(r["src"], r["dst"]): r["weight"] for r in h.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 0): 1.0}


def test_gexf_roundtrip_and_dot(spark, tmp_path):
    from networkit_spark.sources import read_graph, write_graph
    from networkit_spark.graph import EdgeGraph

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.5)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    p = tmp_path / "g.gexf"
    write_graph(g, str(p))
    h = read_graph(spark, str(p))
    assert not h.directed
    rows = {(r["src"], r["dst"]): r["weight"] for r in h.edges.collect()}
    assert rows == {(0, 1): 1.0, (1, 2): 2.0, (0, 2): 1.5}

    d = tmp_path / "g.dot"
    write_graph(g, str(d))
    text = d.read_text()
    assert text.startswith("graph {") and "0 -- 1;" in text and text.rstrip().endswith("}")


def test_read_graph_mtx_dispatch(spark, tmp_path):
    from networkit_spark.sources import read_graph

    p = tmp_path / "m.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 2 1\n1 2 3.0\n")
    g = read_graph(spark, str(p))
    assert g.directed and g.num_edges() == 1


def test_metis_writer_roundtrip(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.metis import read_metis, write_metis

    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 1.0), (0, 3, 4.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = EdgeGraph.from_edges(e)
    p = str(tmp_path / "g.metis")
    write_metis(g, p, weighted=True)
    with open(p) as fh:
        assert fh.readline().strip() == "4 4 1"
    g2 = read_metis(spark, p)
    got = sorted(map(tuple, g2.edges.collect()))
    want = sorted(map(tuple, g.edges.collect()))
    assert got == want


def test_metis_writer_unweighted_and_noncontinuous_ids(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.metis import read_metis, write_metis

    # ids 5,7,9 -> compacted to 0,1,2 on write
    e = spark.createDataFrame(
        [(5, 7, 1.0), (7, 9, 1.0)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    p = str(tmp_path / "g2.metis")
    write_metis(g, p, weighted=False)
    g2 = read_metis(spark, p)
    assert sorted(map(tuple, g2.edges.collect())) == [
        (0, 1, 1.0),
        (1, 2, 1.0),
    ]


def test_metis_writer_rejects_directed(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.metis import write_metis

    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = EdgeGraph.from_edges(e, directed=True)
    with pytest.raises(ValueError):
        write_metis(g, str(tmp_path / "x.metis"))


def test_snap_writer_roundtrip(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.edgelist import read_snap, write_snap

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e)
    p = str(tmp_path / "g.snap")
    write_snap(g, p)
    with open(p) as fh:
        assert fh.readline().startswith("p 3 2")
    g2 = read_snap(spark, p, directed=False)
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == [
        (0, 1),
        (1, 2),
    ]


def test_binary_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.edgelist import (
        read_binary_partition,
        write_binary_partition,
    )

    labels = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 70000)], "node long, label long"
    )
    for width in (4, 8):
        p = str(tmp_path / f"part{width}.bin")
        write_binary_partition(labels, p, width=width)
        import os

        assert os.path.getsize(p) == 3 * width
        back = {
            r["node"]: r["label"]
            for r in read_binary_partition(spark, p, width=width).collect()
        }
        assert back == {0: 3, 1: 3, 2: 70000}
    # sparse node ids rejected
    sparse = spark.createDataFrame([(0, 1), (2, 1)], "node long, label long")
    with pytest.raises(ValueError):
        write_binary_partition(sparse, str(tmp_path / "bad.bin"))


def test_cover_io_roundtrip(spark, tmp_path):
    from networkit_spark.sources.cover import (
        read_cover,
        read_edgelist_cover,
        read_snap_cover,
        write_cover,
    )

    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (1, 1), (3, 1), (4, 2)],
        "node long, subset long",
    )
    p = str(tmp_path / "c.cover")
    write_cover(cover, p)
    lines = open(p).read().splitlines()
    assert lines == ["0 1 2 ", "1 3 ", "4 "]
    back = read_cover(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(
        (r["node"], r["subset"]) for r in cover.collect()
    )
    # comment lines don't consume a community index
    p2 = str(tmp_path / "c2.cover")
    with open(p2, "w") as fh:
        fh.write("# comment\n5 6\n\n7\n")
    got = sorted(map(tuple, read_cover(spark, p2).collect()))
    assert got == [(5, 0), (6, 0), (7, 1)]
    assert sorted(map(tuple, read_snap_cover(spark, p2).collect())) == got


def test_edgelist_cover_reader(spark, tmp_path):
    from networkit_spark.sources.cover import read_edgelist_cover

    p = str(tmp_path / "c.elcover")
    with open(p, "w") as fh:
        fh.write("# node communities\n1 0 2\n2 1\n3 0\n")
    got = sorted(map(tuple, read_edgelist_cover(spark, p, first_node=1).collect()))
    # node ids shifted to 0-based, community ids as written
    assert got == [(0, 0), (0, 2), (1, 1), (2, 0)]


def test_graphtool_binary_roundtrip(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.binary import read_graphtool, write_graphtool

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0), (2, 2, 1.0)],
        "src long, dst long, weight double",
    )
    for little in (True, False):
        g = EdgeGraph.from_edges(e)
        p = str(tmp_path / f"g{little}.gt")
        write_graphtool(g, p, little_endian=little)
        blob = open(p, "rb").read()
        assert blob[:6] == bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])
        g2 = read_graphtool(spark, p)
        assert not g2.directed
        assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == sorted(
            (r["src"], r["dst"]) for r in g.edges.collect()
        )
    # directed roundtrip
    gd = EdgeGraph.from_edges(
        spark.createDataFrame([(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0)],
                              "src long, dst long, weight double"),
        directed=True,
    )
    p = str(tmp_path / "gd.gt")
    write_graphtool(gd, p)
    g3 = read_graphtool(spark, p)
    assert g3.directed
    assert sorted((r["src"], r["dst"]) for r in g3.edges.collect()) == [
        (0, 1), (1, 0), (1, 2),
    ]
    # non-continuous ids are compacted on write
    gs = EdgeGraph.from_edges(
        spark.createDataFrame([(5, 9, 1.0)], "src long, dst long, weight double")
    )
    p = str(tmp_path / "gs.gt")
    write_graphtool(gs, p)
    assert [(r["src"], r["dst"]) for r in read_graphtool(spark, p).edges.collect()] == [(0, 1)]


def test_thrill_binary_roundtrip(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources.binary import read_thrill, write_thrill

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 1.0), (3, 3, 1.0)],
        "src long, dst long, weight double",
    )
    g = EdgeGraph.from_edges(e)
    p = str(tmp_path / "g.thrill")
    write_thrill(g, p)
    g2 = read_thrill(spark, p)
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == sorted(
        (r["src"], r["dst"]) for r in g.edges.collect()
    )
    # sparse ids rejected
    gs = EdgeGraph.from_edges(
        spark.createDataFrame([(0, 2, 1.0)], "src long, dst long, weight double")
    )
    with pytest.raises(ValueError):
        write_thrill(gs, str(tmp_path / "bad.thrill"))


def test_dispatch_binary_and_metis_write(spark, tmp_path):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.sources import read_graph, write_graph

    g = EdgeGraph.from_edges(
        spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double")
    )
    for ext in ("gt", "thrill", "graph"):
        p = str(tmp_path / f"g.{ext}")
        write_graph(g, p)
        g2 = read_graph(spark, p)
        assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == [(0, 1), (1, 2)]
