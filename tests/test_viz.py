"""Layout family: PivotMDS, FruchtermanReingold, PostscriptWriter."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.viz import (
    fruchterman_reingold,
    pivot_mds,
    write_postscript,
)
from tests.conftest import edges_df


def _coords(df):
    return {r["node"]: np.array(r["coords"]) for r in df.collect()}


def test_pivot_mds_path_graph_orders_nodes(spark):
    # a 12-node path: the first MDS axis must order nodes along the path
    n = 12
    g = EdgeGraph.from_edges(edges_df(spark, [(i, i + 1, 1.0) for i in range(n - 1)]))
    xy = _coords(pivot_mds(g, dim=2, num_pivots=6, seed=3))
    assert len(xy) == n and all(len(v) == 2 for v in xy.values())
    first = [xy[i][0] for i in range(n)]
    diffs = np.diff(first)
    # the reference centers UNSQUARED distances (PivotMDS.cpp triplets), so
    # a path endpoint's centered row equals its neighbor's whenever no pivot
    # separates them — monotone with possible endpoint ties, not strict
    assert (diffs >= 0).all() or (diffs <= 0).all(), first
    assert abs(first[0] - first[-1]) > 1.0


def test_pivot_mds_separates_clusters(spark):
    # two 5-cliques joined by a long path: embedded centroids far apart
    clique = lambda o: [(o + i, o + j, 1.0) for i in range(5) for j in range(i + 1, 5)]
    bridge = [(4, 100, 1.0), (100, 101, 1.0), (101, 102, 1.0), (102, 10, 1.0)]
    g = EdgeGraph.from_edges(edges_df(spark, clique(0) + clique(10) + bridge))
    xy = _coords(pivot_mds(g, dim=2, num_pivots=8, seed=1))
    a = np.mean([xy[i] for i in range(5)], axis=0)
    b = np.mean([xy[10 + i] for i in range(5)], axis=0)
    spread_a = max(np.linalg.norm(xy[i] - a) for i in range(5))
    spread_b = max(np.linalg.norm(xy[10 + i] - b) for i in range(5))
    assert np.linalg.norm(a - b) > 2 * max(spread_a, spread_b)


@pytest.mark.parametrize("mode", ["exact", "grid"])
def test_fruchterman_reingold_separates_cliques(spark, mode):
    clique = lambda o: [(o + i, o + j, 1.0) for i in range(4) for j in range(i + 1, 4)]
    g = EdgeGraph.from_edges(edges_df(spark, clique(0) + clique(4) + [(3, 4, 1.0)]))
    pos = {
        r["node"]: np.array([r["x"], r["y"]])
        for r in fruchterman_reingold(g, max_iter=25, repulsion=mode, seed=5).collect()
    }
    assert len(pos) == 8
    assert all((0.0 <= p).all() and (p <= 1.0).all() for p in pos.values())
    intra = np.mean(
        [np.linalg.norm(pos[i] - pos[j]) for i in range(4) for j in range(i + 1, 4)]
        + [np.linalg.norm(pos[4 + i] - pos[4 + j]) for i in range(4) for j in range(i + 1, 4)]
    )
    inter = np.mean(
        [np.linalg.norm(pos[i] - pos[4 + j]) for i in range(4) for j in range(4)]
    )
    assert inter > intra


def test_fruchterman_reingold_warm_start_and_validation(spark):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)]))
    first = fruchterman_reingold(g, max_iter=3, seed=9)
    again = fruchterman_reingold(g, max_iter=2, init=first, seed=9)
    assert again.count() == 3
    with pytest.raises(ValueError):
        fruchterman_reingold(g, repulsion="octree")


def test_postscript_writer(spark, tmp_path):
    g = EdgeGraph.from_edges(edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]))
    pos = fruchterman_reingold(g, max_iter=2, seed=1)
    labels = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "node long, label long")
    p = str(tmp_path / "g.eps")
    write_postscript(g, pos, p, clustering=labels)
    text = open(p).read()
    assert text.startswith("%!PS-Adobe-1.0")
    assert text.count(" l s\n") == 3  # edges
    assert text.count(" a s\n") == 3  # vertices
    assert "1.00 0.00 0.00 c" in text  # palette color 0 used (label 0 pair)
    # coords-array variant also accepted
    mds = pivot_mds(g, dim=2, num_pivots=3)
    p2 = str(tmp_path / "g2.eps")
    write_postscript(g, mds, p2)
    assert open(p2).read().count(" a s\n") == 3


def test_multilevel_layout(spark):
    from networkit_spark.operators.viz import multilevel_layout

    # ring of 40 nodes — forces at least one coarsening level
    n = 40
    g = EdgeGraph.from_edges(
        edges_df(spark, [(i, (i + 1) % n, 1.0) for i in range(n)])
    )
    pos = {
        r["node"]: np.array([r["x"], r["y"]])
        for r in multilevel_layout(g, n_coarsest=10, seed=2).collect()
    }
    assert len(pos) == n
    assert all((0.0 <= p).all() and (p <= 1.0).all() for p in pos.values())
    # neighbors end up closer than antipodal nodes on average
    nbr = np.mean([np.linalg.norm(pos[i] - pos[(i + 1) % n]) for i in range(n)])
    far = np.mean([np.linalg.norm(pos[i] - pos[(i + n // 2) % n]) for i in range(n)])
    assert far > nbr


def test_maxent_stress_recovers_distances(spark):
    from networkit_spark.operators.viz import maxent_stress

    # a 6-cycle with unit targets: layout distances should approach 1 on
    # edges and exceed 1 across the cycle
    n = 6
    g = EdgeGraph.from_edges(
        edges_df(spark, [(i, (i + 1) % n, 1.0) for i in range(n)])
    )
    pos = {
        r["node"]: np.array([r["x"], r["y"]])
        for r in maxent_stress(g, max_iter=30, seed=4).collect()
    }
    assert len(pos) == n
    edge_d = [np.linalg.norm(pos[i] - pos[(i + 1) % n]) for i in range(n)]
    anti_d = [np.linalg.norm(pos[i] - pos[(i + 3) % n]) for i in range(n)]
    assert np.mean(anti_d) > np.mean(edge_d)
    # stress is low: edge lengths near the unit target
    assert 0.5 < np.mean(edge_d) < 1.5, edge_d
