"""networkit_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
NetworKit (ArminWiebigke fork, reference at /root/reference) in idiomatic
Spark: edges are a DataFrame ``(src: long, dst: long, weight: double)``,
graph kernels are iterative DataFrame supersteps with per-partition CSR
blocks inside Arrow record batches (vectorized pandas UDFs — never
per-row Python), and every superstep is an explicit shuffle exchange with
checkpointed lineage + metrics so any iteration can resume.

Reference semantics documented per-operator with ``file:line`` citations
into the reference tree (see each module's docstring and SURVEY.md).
"""

from networkit_spark.graph import (
    EdgeGraph,
    symmetrize,
    degrees,
    densify_ids,
    index_edges,
    random_edges,
    random_nodes,
)

__all__ = [
    "EdgeGraph",
    "symmetrize",
    "degrees",
    "densify_ids",
    "index_edges",
    "random_edges",
    "random_nodes",
]

__version__ = "0.1.0"
