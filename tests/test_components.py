"""Connected components tests (FIXTURES.md F2, F7)."""

import numpy as np
import pytest

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.components import (
    component_sizes,
    connected_components,
    num_components,
)

from .conftest import edges_df
from .oracles import cc_oracle

# F2 — 20 nodes / 5 components (ConnectedComponentsGTest.cpp:29-62)
F2_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
# node 15 is isolated in the reference fixture; we add it as a self-loop
# row so the vertex appears in the edge-derived vertex set.
F2_ALL = F2_EDGES + [(15, 15)]


def _labels(df, nodes):
    rows = {r["node"]: r["label"] for r in df.collect()}
    return np.array([rows[i] for i in nodes])


@pytest.mark.parametrize("impl", ["sql", "csr"])
def test_f2_five_components(spark, impl):
    g = EdgeGraph.from_edges(edges_df(spark, F2_ALL))
    labels = connected_components(g, impl=impl)
    got = _labels(labels, range(20))
    want = cc_oracle(20, F2_ALL)
    assert np.array_equal(got, want)  # canonical min-id labels, exact
    assert num_components(labels) == 5
    # reference assertions (ConnectedComponentsGTest.cpp:29-62)
    assert got[0] == got[19] and got[3] == got[7]
    assert got[15] != got[13] and got[13] == got[14]
    sizes = {r["label"]: r["size"] for r in component_sizes(labels).collect()}
    assert sizes == {0: 7, 3: 5, 10: 5, 13: 2, 15: 1}


def test_directed_weakly_cc(spark):
    """weakly-CC(directed) == CC(undirected view)
    (ConnectedComponentsGTest.cpp:367-379)."""
    g = EdgeGraph.from_edges(edges_df(spark, [(1, 0), (2, 1), (4, 3)]), directed=True)
    labels = connected_components(g, impl="sql")
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_f7_partition_equivalence(spark):
    g = EdgeGraph.from_edges(edges_df(spark, F2_ALL))
    a = connected_components(g, impl="csr", num_parts=2).collect()
    b = connected_components(g, impl="csr", num_parts=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_long_path(spark):
    """Path graph: worst-case diameter for label propagation."""
    edges = [(i, i + 1) for i in range(30)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    labels = connected_components(g, impl="sql")
    assert {r["label"] for r in labels.collect()} == {0}


def test_scc(spark):
    """Directed SCC via coloring; grouping compared up to relabeling
    (SCC fixture pattern of ConnectedComponentsGTest.cpp:149-190)."""
    from networkit_spark.operators.scc import strongly_connected_components

    # cycle {0,1,2}, cycle {3,4}, chain node 5, self node 6
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5), (6, 0)]
    g = EdgeGraph.from_edges(edges_df(spark, edges), directed=True)
    labels = {r["node"]: r["label"] for r in strongly_connected_components(g).collect()}
    assert len(labels) == 7
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert len({labels[5]}) == 1 and labels[5] not in (labels[0], labels[3])
    assert labels[6] not in (labels[0], labels[3], labels[5])


def test_scc_full_cycle_and_dag(spark):
    from networkit_spark.operators.scc import strongly_connected_components

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    g = EdgeGraph.from_edges(edges_df(spark, cyc), directed=True)
    labels = {r["label"] for r in strongly_connected_components(g).collect()}
    assert len(labels) == 1
    dag = [(0, 1), (1, 2), (0, 2)]
    g2 = EdgeGraph.from_edges(edges_df(spark, dag), directed=True)
    labels2 = {r["node"]: r["label"] for r in strongly_connected_components(g2).collect()}
    assert len(set(labels2.values())) == 3  # every node its own SCC
