"""CutClustering (Flake–Tarjan) structural properties.

Oracle: the algorithm's published parameter guarantees
(``cpp/community/CutClustering.h:16-21``): alpha = 0 → one cluster per
connected component; alpha >= max edge weight → singletons; an alpha
between the intra-clique and bridge weights separates planted cliques.
"""

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.cutclustering import cut_clustering
from tests.conftest import edges_df


def _two_cliques_bridged():
    e = []
    for base in (0, 10):
        for i in range(base, base + 5):
            for j in range(i + 1, base + 5):
                e.append((i, j, 1.0))
    e.append((4, 10, 0.2))  # weak bridge
    return e


def test_alpha_zero_one_cluster_per_component(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 3.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    res = {r["node"]: r["label"] for r in cut_clustering(g, 0.0).collect()}
    assert res[0] == res[1] == res[2]
    assert res[5] == res[6]
    assert res[0] != res[5]


def test_alpha_max_weight_singletons(spark):
    g = EdgeGraph.from_edges(edges_df(spark, _two_cliques_bridged()))
    res = [r["label"] for r in cut_clustering(g, 1.0).collect()]
    assert len(res) == len(set(res)) == 10


def test_intermediate_alpha_recovers_cliques(spark):
    g = EdgeGraph.from_edges(edges_df(spark, _two_cliques_bridged()))
    res = {r["node"]: r["label"] for r in cut_clustering(g, 0.5).collect()}
    left = {res[u] for u in range(0, 5)}
    right = {res[u] for u in range(10, 15)}
    assert len(left) == 1 and len(right) == 1 and left != right
    # rep = highest-degree member, ties to smallest id: node 4 has the
    # bridge so degree 5 in the left clique; node 10 likewise on the right
    assert left == {4} and right == {10}


def test_weighted_path_splits_at_weakest_edge(spark):
    # path 0-1-2-3 with weights 5, 1, 5; alpha=2 cuts the middle edge
    edges = [(0, 1, 5.0), (1, 2, 1.0), (2, 3, 5.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    res = {r["node"]: r["label"] for r in cut_clustering(g, 2.0).collect()}
    assert res[0] == res[1]
    assert res[2] == res[3]
    assert res[0] != res[2]


def test_self_loops_ignored(spark):
    edges = [(0, 1, 1.0), (0, 0, 9.0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    res = {r["node"]: r["label"] for r in cut_clustering(g, 0.5).collect()}
    assert res[0] == res[1]
