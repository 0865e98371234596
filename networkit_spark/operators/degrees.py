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


def sfigality(graph: EdgeGraph) -> DataFrame:
    """``Sfigality`` (``cpp/centrality/Sfigality.cpp:16-30``): per node,
    the fraction of neighbors with STRICTLY higher degree.  One degree
    self-join over the gather view."""
    deg = graph.degrees().select("node", "deg")
    sym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst")
    per = (
        sym.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("dv")), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(
            (
                F.sum(F.when(F.col("du") < F.col("dv"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("score")
        )
    )
    return (
        graph.vertices()
        .join(per, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def laplacian_centrality(graph: EdgeGraph, normalized: bool = True) -> DataFrame:
    """``LaplacianCentrality`` (``cpp/centrality/LaplacianCentrality.cpp:
    14-45``): the Laplacian-energy drop when the node is removed,
    score(u) = wdeg(u)² + Σ_{v∈N(u)} w·(w + 2·wdeg(v)); normalized by
    the total energy Σ wdeg² + Σ_sym w².  Two joins + aggs, no spectral
    solve — the reference's own local formula.

    Self-loop convention matches the reference: ``weightedDegree``
    counts a loop ONCE (``Graph.cpp computeWeightedDegree``) and
    ``forNeighborsOf`` visits it once, so loops contribute to wdeg, to
    the neighbor sum (with v = u), and ew² once to the total energy —
    ``sym()`` keeps loops as a single row, which is exactly that."""
    sym = graph.sym()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    nbr = (
        sym.join(
            wdeg.select(F.col("node").alias("dst"), F.col("wdeg").alias("wv")), "dst"
        )
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.sum(F.col("weight") * (F.col("weight") + 2.0 * F.col("wv"))).alias("nsum"),
            F.sum(F.col("weight") * F.col("weight")).alias("w2"),
        )
    )
    per = wdeg.join(nbr, "node", "left").select(
        "node",
        (F.col("wdeg") * F.col("wdeg") + F.coalesce("nsum", F.lit(0.0))).alias("energy"),
        F.coalesce("w2", F.lit(0.0)).alias("w2"),
        (F.col("wdeg") * F.col("wdeg")).alias("d2"),
    )
    out = graph.vertices().join(
        per, F.col("id") == F.col("node"), "left"
    ).select(
        F.col("id").alias("node"),
        F.coalesce("energy", F.lit(0.0)).alias("score"),
        F.coalesce("w2", F.lit(0.0)).alias("w2"),
        F.coalesce("d2", F.lit(0.0)).alias("d2"),
    )
    if not normalized:
        return out.select("node", "score")
    total = out.agg(F.sum(F.col("d2") + F.col("w2"))).collect()[0][0] or 1.0
    return out.select("node", (F.col("score") / total).alias("score"))
