"""Graph coarsening / contraction — the group-by of graphs.

``ParallelPartitionCoarsening(G, zeta)`` (``cpp/coarsening/
ParallelPartitionCoarsening.h:20-36``): one coarse node per label,
parallel-edge weights summed, intra-block edges become coarse
self-loops; also returns the fine→coarse node mapping.  Used by
``ParallelConnectedComponents``'s 8-iteration escape hatch and PLM's
multilevel recursion.

Spark: ``edges ⨝ labels(src) ⨝ labels(dst) → groupBy(srcLabel, dstLabel)
.agg(sum(weight))`` — pure DataFrame; Catalyst broadcasts the label
table when small, and the aggregation is map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def coarsen_by_partition(graph: EdgeGraph, labels: DataFrame) -> tuple[EdgeGraph, DataFrame]:
    """labels: (node, label).  Returns (coarse EdgeGraph, node_mapping).

    Coarse node ids are the labels themselves (already canonical when
    produced by our CC/PLP); ``Partition::compact``-style densification
    (dense_rank over labels) is available via ``graph.densify_ids``.
    """
    lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    coarse = (
        graph.edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .select(
            F.least("src_label", "dst_label").alias("src"),
            F.greatest("src_label", "dst_label").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return EdgeGraph(coarse, graph.directed, graph.weighted), labels


def coarsen_by_matching(
    graph: EdgeGraph, matching: DataFrame, no_self_loops: bool = True
) -> tuple[EdgeGraph, DataFrame]:
    """MatchingCoarsening (``cpp/coarsening/MatchingCoarsening.cpp:16-56``):
    contract each matched pair into one coarse node; unmatched nodes
    carry over.  ``matching``: (src, dst) pairs (e.g. from
    ``forest.parallel_matching``).

    The coarse id of a pair is the SMALLER endpoint's id (the reference
    assigns the carried-over vertex's slot: ``v < mate`` keeps v); dense
    0..cn-1 ids, when needed, come from ``graph.densify_ids`` — same
    convention as ``coarsen_by_partition``.  ``no_self_loops`` drops
    the contracted edges themselves (the reference's noSelfLoops)."""
    m = matching.select(
        F.least("src", "dst").alias("rep"), F.greatest("src", "dst").alias("other")
    )
    labels = (
        graph.vertices()
        .select(F.col("id").alias("node"))
        .join(m.select(F.col("other").alias("node"), "rep"), "node", "left")
        .select("node", F.coalesce("rep", F.col("node")).alias("label"))
    )
    coarse, mapping = coarsen_by_partition(graph, labels)
    if no_self_loops:
        coarse = EdgeGraph(
            coarse.edges.where(F.col("src") != F.col("dst")),
            coarse.directed,
            coarse.weighted,
        )
    return coarse, mapping
