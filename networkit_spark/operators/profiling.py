"""``overview(G)`` / profiling — the batch stat report
(``networkit/profiling/profiling.py``, ``__init__.py:105-218``):
one composite job summarizing a graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.components import connected_components, num_components
from networkit_spark.operators.triangles import global_clustering_coefficient


def overview(graph: EdgeGraph, with_triangles: bool = True) -> dict:
    """Summary dict: nodes, edges, density, degree stats, self-loops,
    total weight, components, (optional) global clustering coefficient."""
    n, m = graph.num_nodes(), graph.num_edges()
    deg = graph.degrees().agg(
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
        F.avg("deg").alias("avg_deg"),
    ).collect()[0]
    loops = graph.edges.where(F.col("src") == F.col("dst")).count()
    out = {
        "nodes": n,
        "edges": m,
        "directed": graph.directed,
        "density": graph.density(),
        "min_degree": deg["min_deg"],
        "max_degree": deg["max_deg"],
        "avg_degree": deg["avg_deg"],
        "self_loops": loops,
        "total_edge_weight": graph.total_edge_weight(),
        "components": num_components(connected_components(graph, impl="sql")),
    }
    if with_triangles and not graph.directed:
        out["global_clustering"] = global_clustering_coefficient(graph)
    return out
