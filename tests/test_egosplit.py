"""Ego-splitting tests — overlapping community recovery (the fork's
flagship, EgoSplitting.h:31-60)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.egosplit import cover_f1, ego_splitting

from .conftest import edges_df

# two triangles sharing node 0: communities {0,1,2} and {0,3,4} overlap at 0
BOWTIE = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]


def test_bowtie_overlap(spark):
    g = EdgeGraph.from_edges(edges_df(spark, BOWTIE))
    cover = ego_splitting(g, min_community_size=1)
    rows = {}
    for r in cover.collect():
        rows.setdefault(r["node"], set()).add(r["label"])
    # node 0 belongs to two communities; others to one
    assert len(rows[0]) == 2
    assert all(len(rows[v]) == 1 for v in (1, 2, 3, 4))
    # the two communities are exactly the triangles
    comm = {}
    for r in cover.collect():
        comm.setdefault(r["label"], set()).add(r["node"])
    assert sorted(map(sorted, comm.values())) == [[0, 1, 2], [0, 3, 4]]


def test_cover_f1(spark):
    g = EdgeGraph.from_edges(edges_df(spark, BOWTIE))
    cover = ego_splitting(g, min_community_size=1)
    truth = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (0, 1), (3, 1), (4, 1)], "node long, label long"
    )
    assert cover_f1(cover, truth) == pytest.approx(1.0)


def test_hub_ego_degree_cap(spark):
    """A star hub with a forced low cap completes on the sampled ego-net
    path: the cover still spans every node (sampled-out neighbors get
    singleton personas) and the leaf-side communities are intact."""
    # hub 0 → 60 leaves; two K4 blocks hang off leaves 1 and 2
    star = [(0, i) for i in range(1, 61)]
    k1 = [(a, b) for a in (1, 61, 62, 63) for b in (1, 61, 62, 63) if a < b]
    k2 = [(a, b) for a in (2, 64, 65, 66) for b in (2, 64, 65, 66) if a < b]
    g = EdgeGraph.from_edges(edges_df(spark, star + k1 + k2))
    cover = ego_splitting(g, min_community_size=1, max_ego_degree=8)
    nodes = {r["node"] for r in cover.collect()}
    assert nodes == set(range(67))
    comm = {}
    for r in cover.collect():
        comm.setdefault(r["label"], set()).add(r["node"])
    assert any({1, 61, 62, 63} <= c for c in comm.values())
    assert any({2, 64, 65, 66} <= c for c in comm.values())


def test_cap_above_degree_is_identity(spark):
    """With the cap above every degree the sampled path must return the
    exact uncapped cover (the sample is the full neighbor set)."""
    g = EdgeGraph.from_edges(edges_df(spark, BOWTIE))
    uncapped = {(r["node"], r["label"]) for r in ego_splitting(g, min_community_size=1, max_ego_degree=None).collect()}
    capped = {(r["node"], r["label"]) for r in ego_splitting(g, min_community_size=1, max_ego_degree=100).collect()}
    assert capped == uncapped


def test_clustered_blocks_with_bridge_overlap(spark):
    # two K4 blocks joined through a shared node 3-4 bridge edge: every
    # node still lands in >=1 community and the cover spans the node set
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
        (3, 4),
    ]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    cover = ego_splitting(g, min_community_size=1)
    nodes = {r["node"] for r in cover.collect()}
    assert nodes == set(range(8))


def test_ego_local_fused_equals_distributed(spark):
    """The blocked-numpy local phase returns EXACTLY the distributed
    wedge-join + union-find membership (ego, member, rep) — reps are the
    min member id of each ego-net component, singletons keep self."""
    from networkit_spark.operators.egosplit import (
        _ego_local_distributed,
        _ego_local_fused,
    )

    edges = BOWTIE + [(4, 5), (5, 6), (4, 6), (2, 7), (7, 8), (6, 60)]
    edges += [(i, (i * 13 + 5) % 40 + 10) for i in range(20)]
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    e = (
        g.edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = sorted(
        _ego_local_fused(e, e.toPandas()).collect(),
        key=lambda r: (r["ego"], r["member"]),
    )
    b = sorted(
        _ego_local_distributed(e, None).collect(),
        key=lambda r: (r["ego"], r["member"]),
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 50
