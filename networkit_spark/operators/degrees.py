"""Degree centrality + score-table conventions.

``DegreeCentrality`` (``cpp/centrality/DegreeCentrality.h:20``, 43 LoC):
score(v) = degree (out-degree when directed); ``normalized`` divides by
the maximum possible degree (n-1).  Ranking per ``Centrality::ranking()``
(``cpp/centrality/Centrality.cpp:28-39``): sort score desc, node asc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def degree_centrality(graph: EdgeGraph, normalized: bool = False) -> DataFrame:
    """(node, score) — degree; self-loop counted once (``Graph::degree``)."""
    deg = graph.degrees().select("node", F.col("deg").cast("double").alias("score"))
    out = (
        graph.vertices()
        .join(deg, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    if normalized:
        n = graph.num_nodes()
        out = out.select("node", (F.col("score") / max(n - 1, 1)).alias("score"))
    return out


def ranking(scores: DataFrame, score_col: str = "score", k: int | None = None) -> DataFrame:
    """``Centrality::ranking()`` — (node, score) sorted desc, ties by node
    asc; ``limit(k)`` for top-k (``TopCloseness``-style surface)."""
    out = scores.orderBy(F.desc(score_col), F.asc("node"))
    return out.limit(k) if k is not None else out


def assortativity(graph: EdgeGraph) -> float:
    """Degree assortativity (pyx:6645 / networkit/correlation.py): Pearson
    correlation of endpoint degrees over edges (both directions for
    undirected, matching the reference's per-edge iteration)."""
    deg = graph.degrees().select("node", "deg")
    sym = graph.sym()
    pairs = (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    return pairs.agg(F.corr("sdeg", "ddeg")).collect()[0][0]
