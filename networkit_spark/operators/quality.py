"""Partition aggregates and community quality measures.

- Partition surface (``cpp/structures/Partition.h``):
  ``numberOfSubsets``/``subsetSizes``/``subsetSizeMap``/``getMembers``/
  ``compact`` → DataFrame group-bys.
- ``Modularity`` (``cpp/community/Modularity.cpp:28-75``):
  Q = coverage − expected coverage
    = (intra-edge weight)/total − Σ_C (vol C)² / (2·total)²
  with self-loops counted per the reference's volume rule (volume adds
  the self-loop weight twice — ``PLM.cpp:53-65``) and total = total edge
  weight (+ self-loop weight again, ``Graph::totalEdgeWeight`` counts a
  loop once; Modularity uses 2m in the denominator via volumes).
- ``Coverage`` (``cpp/community/Coverage.cpp``): intra/total.
- ``EdgeCut`` (``cpp/community/EdgeCut.cpp``): total inter-cluster weight.
- ``Conductance`` per cluster: cut(C) / min(vol(C), vol(V\\C)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def subset_sizes(labels: DataFrame) -> DataFrame:
    """(label, size) — ``Partition::subsetSizeMap``."""
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def compact(labels: DataFrame) -> DataFrame:
    """(node, label) with labels densified 0..k-1 in ascending old-label
    order — ``Partition::compact``."""
    from pyspark.sql.window import Window

    distinct = labels.select("label").distinct()
    remap = distinct.select(
        "label",
        (F.row_number().over(Window.orderBy("label")) - 1).cast("long").alias("new_label"),
    )
    return labels.join(F.broadcast(remap), "label").select(
        "node", F.col("new_label").alias("label")
    )


def _annotated(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    return graph.edges.join(lab_src, "src").join(lab_dst, "dst")


def coverage(graph: EdgeGraph, labels: DataFrame) -> float:
    """intra-cluster edge weight / total edge weight (self-loops intra)."""
    e = _annotated(graph, labels)
    agg = e.agg(
        F.sum(F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)).alias("intra"),
        F.sum("weight").alias("total"),
    ).collect()[0]
    return (agg["intra"] or 0.0) / agg["total"] if agg["total"] else 0.0


def edge_cut(graph: EdgeGraph, labels: DataFrame) -> float:
    """total inter-cluster edge weight (``EdgeCut.cpp``)."""
    e = _annotated(graph, labels)
    return (
        e.where(F.col("src_label") != F.col("dst_label")).agg(F.sum("weight")).collect()[0][0]
        or 0.0
    )


def modularity(graph: EdgeGraph, labels: DataFrame) -> float:
    """Newman modularity, reference semantics (``Modularity.cpp:28-75``):
    volumes count self-loop weight twice; total = Σ volumes / 2."""
    sym = graph.sym()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = sym.groupBy(F.col("src").alias("node")).agg(
        (F.sum("weight") + F.sum(loop_extra)).alias("vol")
    )
    cvol = (
        vol.join(labels, "node")
        .groupBy("label")
        .agg(F.sum("vol").alias("cvol"))
    )
    two_m = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    if two_m == 0:
        return 0.0
    cov = coverage(graph, labels)
    expected = (
        cvol.agg(F.sum(F.col("cvol") * F.col("cvol"))).collect()[0][0] or 0.0
    ) / (two_m * two_m)
    return cov - expected


def conductance(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, conductance) per cluster: cut(C)/min(vol(C), vol(rest))."""
    sym = graph.sym()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = sym.groupBy(F.col("src").alias("node")).agg(
        (F.sum("weight") + F.sum(loop_extra)).alias("vol")
    )
    cvol = vol.join(labels, "node").groupBy("label").agg(F.sum("vol").alias("cvol"))
    total = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    e = _annotated(graph, labels)
    cut_src = (
        e.where(F.col("src_label") != F.col("dst_label"))
        .select(F.col("src_label").alias("label"), "weight")
    )
    cut_dst = (
        e.where(F.col("src_label") != F.col("dst_label"))
        .select(F.col("dst_label").alias("label"), "weight")
    )
    cut = cut_src.unionByName(cut_dst).groupBy("label").agg(F.sum("weight").alias("cut"))
    return cvol.join(cut, "label", "left").select(
        "label",
        (
            F.coalesce("cut", F.lit(0.0))
            / F.least(F.col("cvol"), F.lit(total) - F.col("cvol"))
        ).alias("conductance"),
    )
