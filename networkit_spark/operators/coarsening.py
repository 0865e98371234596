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
