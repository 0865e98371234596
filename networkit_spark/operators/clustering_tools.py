"""GraphClusteringTools + ClusteringProjector (SURVEY §2.6/§2.10).

Reference: ``cpp/community/GraphClusteringTools.{h,cpp}`` — the free
utility functions NetworKit users call around Partition objects — and
``cpp/coarsening/ClusteringProjector.{h,cpp}`` — projecting a coarse
clustering back through a contraction hierarchy.

Spark shape: every predicate is an aggregate over one label join
(``isProper`` = an anti-join emptiness check, ``equalClusterings`` =
edge-wise same-subset XOR count); ``communicationGraph`` is the
inter-cluster slice of the same contraction group-by that
``coarsen_by_partition`` runs; the projector is a fold of
broadcast-joins over the (driver-held list of) hierarchy maps — each
map is a (node, label)-shaped DataFrame, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.quality import compact, subset_sizes


def imbalance(labels: DataFrame) -> float:
    """``GraphClusteringTools::getImbalance`` (``GraphClusteringTools
    .cpp:8-16``): max cluster size / ceil(n / #clusters)."""
    row = (
        subset_sizes(labels)
        .agg(
            F.max("size").alias("mx"),
            F.sum("size").alias("n"),
            F.count(F.lit(1)).alias("k"),
        )
        .collect()[0]
    )
    if row["n"] is None or not row["k"]:
        return 0.0
    avg = float(-(-row["n"] // row["k"]))  # ceil division, like the reference
    return float(row["mx"]) / avg


def communication_graph(graph: EdgeGraph, labels: DataFrame) -> EdgeGraph:
    """``GraphClusteringTools::communicationGraph`` (``:18-44``): the
    weighted quotient graph over COMPACTED cluster ids keeping only
    inter-cluster edges (weights summed; unweighted edges count 1)."""
    zeta = compact(labels)
    lab_src = zeta.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = zeta.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    coarse = (
        graph.edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .where(F.col("src_label") != F.col("dst_label"))
        .select(
            F.least("src_label", "dst_label").alias("src"),
            F.greatest("src_label", "dst_label").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return EdgeGraph(coarse, directed=False, weighted=True)


def weighted_degree_with_cluster(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(node, label, wdeg) — ``GraphClusteringTools::
    weightedDegreeWithCluster`` (``:47-66``) for EVERY (node, incident
    cluster) pair at once: the weight of u's edges into cluster cid
    (weighted graphs sum w, unweighted count edges).  Pairs with zero
    weight are absent (the reference returns 0 for those queries)."""
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label"))
    return (
        graph.sym()
        .join(lab_dst, "dst")
        .groupBy(F.col("src").alias("node"), "label")
        .agg(F.sum(w).alias("wdeg"))
    )


def is_proper_clustering(graph: EdgeGraph, labels: DataFrame) -> bool:
    """``isProperClustering`` (``:68-79``): every node of G carries a
    (non-null) label.  One anti-join emptiness probe."""
    unlabeled = (
        graph.vertices()
        .join(
            labels.where(F.col("label").isNotNull()).select(
                F.col("node").alias("id")
            ),
            "id",
            "left_anti",
        )
    )
    return unlabeled.isEmpty()


def is_one_clustering(graph: EdgeGraph, labels: DataFrame) -> bool:
    """``isOneClustering`` (``:81-92``): exactly one cluster."""
    return labels.select("label").distinct().limit(2).count() == 1


def is_singleton_clustering(graph: EdgeGraph, labels: DataFrame) -> bool:
    """``isSingletonClustering`` (``:94-96``): #clusters == n."""
    k = labels.select("label").distinct().count()
    return k == graph.vertices().count()


def equal_clusterings(zeta: DataFrame, eta: DataFrame, graph: EdgeGraph) -> bool:
    """``equalClusterings`` (``:98-113``): over every EDGE (u, v), the
    two clusterings agree on whether u and v share a subset.  (Like the
    reference, this is edge-local equality — non-adjacent disagreements
    are invisible.)  One 4-way label join + disagreement count."""
    def tag(lbl: DataFrame, side: str, name: str) -> DataFrame:
        return lbl.select(F.col("node").alias(side), F.col("label").alias(name))

    e = (
        graph.edges.select("src", "dst")
        .join(tag(zeta, "src", "z_u"), "src")
        .join(tag(zeta, "dst", "z_v"), "dst")
        .join(tag(eta, "src", "e_u"), "src")
        .join(tag(eta, "dst", "e_v"), "dst")
    )
    disagreements = e.where(
        (F.col("z_u") == F.col("z_v")) != (F.col("e_u") == F.col("e_v"))
    )
    return disagreements.isEmpty()


# ---------------------------------------------------------------------------
# ClusteringProjector
# ---------------------------------------------------------------------------


def project_back(fine_to_coarse: DataFrame, zeta_coarse: DataFrame) -> DataFrame:
    """(node, label) on the FINE graph — ``ClusteringProjector::
    projectBack`` (``cpp/coarsening/ClusteringProjector.cpp:14-24``):
    zetaFine[v] = zetaCoarse[fineToCoarse[v]].

    ``fine_to_coarse``: (node, label) rows mapping fine nodes to coarse
    node ids — exactly what :func:`~networkit_spark.operators.coarsening.
    coarsen_by_partition` returns as its mapping."""
    return (
        fine_to_coarse.select("node", F.col("label").alias("coarse"))
        .join(
            zeta_coarse.select(
                F.col("node").alias("coarse"), F.col("label").alias("clabel")
            ),
            "coarse",
        )
        .select("node", F.col("clabel").alias("label"))
    )


def project_back_to_finest(
    zeta_coarse: DataFrame, maps: list[DataFrame]
) -> DataFrame:
    """``projectBackToFinest`` (``ClusteringProjector.cpp:26-60``):
    compose the hierarchy of fine→coarse maps (finest-level first, the
    reference's ``maps`` order), then read the coarse labels through the
    composite.  Each composition step is one join keyed on the coarser
    id; the maps stay distributed."""
    if not maps:
        return zeta_coarse
    composite = maps[0].select("node", F.col("label").alias("super"))
    for m in maps[1:]:
        composite = composite.join(
            m.select(F.col("node").alias("super"), F.col("label").alias("nxt")),
            "super",
        ).select("node", F.col("nxt").alias("super"))
    return composite.join(
        zeta_coarse.select(F.col("node").alias("super"), "label"), "super"
    ).select("node", "label")


def project_coarse_graph_to_finest_clustering(maps: list[DataFrame]) -> DataFrame:
    """``projectCoarseGraphToFinestClustering`` (``ClusteringProjector
    .cpp:62-93``): the coarsest supernode id IS the cluster id — i.e.
    projectBackToFinest with the identity coarse clustering."""
    if not maps:
        raise ValueError("need at least one fine->coarse map")
    coarse_ids = maps[-1].select(F.col("label").alias("node")).distinct()
    identity = coarse_ids.select("node", F.col("node").alias("label"))
    return project_back_to_finest(identity, maps)
