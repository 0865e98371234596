"""GraphClusteringTools + ClusteringProjector + DynWeaklyCC."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.clustering_tools import (
    communication_graph,
    equal_clusterings,
    imbalance,
    is_one_clustering,
    is_proper_clustering,
    is_singleton_clustering,
    project_back,
    project_back_to_finest,
    project_coarse_graph_to_finest_clustering,
    weighted_degree_with_cluster,
)

from .conftest import edges_df


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "node long, label long")


def test_graph_clustering_tools_predicates(spark):
    # path 0-1-2-3, clusters {0,1} {2,3}
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    zeta = _labels(spark, [(0, 10), (1, 10), (2, 20), (3, 20)])
    assert is_proper_clustering(g, zeta)
    assert not is_proper_clustering(g, _labels(spark, [(0, 10), (1, 10), (2, 20)]))
    assert not is_one_clustering(g, zeta)
    assert is_one_clustering(g, _labels(spark, [(i, 5) for i in range(4)]))
    assert not is_singleton_clustering(g, zeta)
    assert is_singleton_clustering(g, _labels(spark, [(i, i) for i in range(4)]))

    # same partition with renamed labels → edge-wise equal
    eta = _labels(spark, [(0, 1), (1, 1), (2, 2), (3, 2)])
    assert equal_clusterings(zeta, eta, g)
    # move node 1 to the other side → the 0-1 edge disagrees
    eta2 = _labels(spark, [(0, 1), (1, 2), (2, 2), (3, 2)])
    assert not equal_clusterings(zeta, eta2, g)

    # imbalance: sizes (3,1) over n=4, k=2 → avg ceil(2)=2, max 3 → 1.5
    skew = _labels(spark, [(0, 1), (1, 1), (2, 1), (3, 2)])
    assert imbalance(skew) == pytest.approx(1.5)
    assert imbalance(zeta) == pytest.approx(1.0)


def test_communication_graph_and_wdeg_with_cluster(spark):
    # triangle {0,1,2} + triangle {3,4,5} + two bridges 2-3 (w=2), 1-4 (w=1)
    g = EdgeGraph.from_edges(edges_df(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
         (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
         (2, 3, 2.0), (1, 4, 1.0)]))
    zeta = _labels(spark, [(0, 7), (1, 7), (2, 7), (3, 9), (4, 9), (5, 9)])
    cg = communication_graph(g, zeta)
    rows = cg.edges.collect()
    # compacted ids: 7→0, 9→1; one inter-cluster edge of weight 3
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["dst"], rows[0]["weight"]) == (0, 1, 3.0)

    wd = {(r["node"], r["label"]): r["wdeg"]
          for r in weighted_degree_with_cluster(g, zeta).collect()}
    assert wd[(2, 7)] == pytest.approx(2.0)   # edges to 0,1
    assert wd[(2, 9)] == pytest.approx(2.0)   # bridge 2-3 (w=2)
    assert wd[(4, 9)] == pytest.approx(2.0)
    assert wd[(4, 7)] == pytest.approx(1.0)
    assert (0, 9) not in wd  # node 0 has no edge into cluster 9


def test_clustering_projector(spark):
    # 6 fine nodes → 3 mid supernodes → 2 coarse supernodes
    m0 = _labels(spark, [(0, 100), (1, 100), (2, 101), (3, 101), (4, 102), (5, 102)])
    m1 = _labels(spark, [(100, 200), (101, 200), (102, 201)])
    zeta_coarse = _labels(spark, [(200, 1), (201, 2)])

    one = project_back(m0, _labels(spark, [(100, 8), (101, 8), (102, 9)]))
    got1 = {r["node"]: r["label"] for r in one.collect()}
    assert got1 == {0: 8, 1: 8, 2: 8, 3: 8, 4: 9, 5: 9}

    fine = project_back_to_finest(zeta_coarse, [m0, m1])
    got = {r["node"]: r["label"] for r in fine.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2}

    ident = project_coarse_graph_to_finest_clustering([m0, m1])
    goti = {r["node"]: r["label"] for r in ident.collect()}
    assert goti == {0: 200, 1: 200, 2: 200, 3: 200, 4: 201, 5: 201}

    # round-trip through the real coarsener: PLP-style labels
    from networkit_spark.operators.coarsening import coarsen_by_partition

    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (3, 4), (2, 3)]))
    labels = _labels(spark, [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3)])
    coarse, mapping = coarsen_by_partition(g, labels)
    zc = _labels(spark, [(0, 42), (3, 42)])  # coarse clustering: both together
    back = {r["node"]: r["label"] for r in project_back(mapping, zc).collect()}
    assert back == {i: 42 for i in range(5)}


def test_dyn_weakly_components(spark):
    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.events import (
        EDGE_ADDITION,
        EVENT_SCHEMA,
        incremental_weakly_components,
    )

    e = spark.createDataFrame(
        [(0, 1, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    g = EdgeGraph.from_edges(e, directed=True)
    labels = connected_components(g, impl="sql")
    ev = spark.createDataFrame(
        [(0, EDGE_ADDITION, 3, 0, 1.0)], EVENT_SCHEMA
    )
    g2, lab2 = incremental_weakly_components(g, labels, ev)
    # 3→0 merges both weak components even though no directed path exists
    assert lab2.select("label").distinct().count() == 1
    static = connected_components(g2, impl="sql")
    got = {r["node"]: r["label"] for r in lab2.collect()}
    want = {r["node"]: r["label"] for r in static.collect()}
    assert got == want


def test_dissimilarity_wrappers(spark):
    from networkit_spark.operators.partition_similarity import (
        graph_structural_rand_distance,
        nmi_distance,
        node_structural_rand_distance,
    )

    a = _labels(spark, [(0, 1), (1, 1), (2, 2), (3, 2)])
    b = _labels(spark, [(0, 9), (1, 9), (2, 8), (3, 8)])  # same, renamed
    assert nmi_distance(a, a) == pytest.approx(0.0)
    assert nmi_distance(a, b) == pytest.approx(0.0)
    assert node_structural_rand_distance(a, b) == pytest.approx(0.0)
    c = _labels(spark, [(0, 1), (1, 2), (2, 2), (3, 2)])
    assert node_structural_rand_distance(a, c) > 0
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    assert graph_structural_rand_distance(g, a, b) == pytest.approx(0.0)
    assert graph_structural_rand_distance(g, a, c) > 0


def test_binary_edgelist_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.edgelist import (
        read_binary_edgelist_partition,
        write_binary_edgelist_partition,
    )

    labels = _labels(spark, [(0, 5), (3, 7), (10, 5), (42, 9)])  # sparse ids
    for width in (4, 8):
        p = str(tmp_path / f"part{width}.bin")
        write_binary_edgelist_partition(labels, p, width=width)
        back = read_binary_edgelist_partition(spark, p, width=width)
        got = {(r["node"], r["label"]) for r in back.collect()}
        assert got == {(0, 5), (3, 7), (10, 5), (42, 9)}
    # first_node shift roundtrip
    p = str(tmp_path / "shift.bin")
    write_binary_edgelist_partition(labels, p, first_node=1)
    back = read_binary_edgelist_partition(spark, p, first_node=1)
    assert {(r["node"], r["label"]) for r in back.collect()} == \
        {(0, 5), (3, 7), (10, 5), (42, 9)}
