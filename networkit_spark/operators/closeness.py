"""Closeness / harmonic centrality — BFS aggregation.

Reference: ``Closeness`` / ``HarmonicCloseness`` + ``TopCloseness``
(pruned-bound top-k, ``cpp/centrality/TopCloseness.cpp``).  The engine's
scale strategy (SURVEY.md §2.6) is full scores + ``limit(k)`` for exact
small graphs, and sampled estimates (Eppstein-Wang style: mean distance
from k sampled sources) for large ones — each source is one BFS
superstep sequence, embarrassingly parallel across sources.

closeness(v) = (n-1) / Σ_u d(v,u)   (0 for isolated; component-local n
              when the graph is disconnected, per the reference's
              variant with ``checkConnectedness`` off)
harmonic(v)  = Σ_u 1/d(v,u)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.bfs import bfs


def _sources_sample(graph: EdgeGraph, nsamples: int | None) -> list[int]:
    """Deterministic sample of BFS sources.  The sampled path collects
    only the k chosen ids — the md5 ranking runs distributed as a
    TakeOrdered (ORDER BY md5 LIMIT k), never materializing the node
    set on the driver.  Exhaustive mode (nsamples=None) collects all
    ids because the per-source driver loop needs them (fixture scale)."""
    if nsamples is None or nsamples >= graph.num_nodes():
        return [r["id"] for r in graph.vertices().orderBy("id").collect()]
    picked = (
        graph.vertices()
        .orderBy(F.md5(F.concat(F.lit("cl:"), F.col("id").cast("string"))))
        .limit(nsamples)
        .collect()
    )
    return [r["id"] for r in picked]


def closeness(
    graph: EdgeGraph, nsamples: int | None = None, harmonic: bool = False
) -> DataFrame:
    """(node, score).  Exact when nsamples is None (n BFS — fixture
    scale); otherwise the sampled estimator (distances measured FROM the
    sampled sources; by symmetry of undirected BFS these are distances
    TO every node, scaled by n/k)."""
    sources = _sources_sample(graph, nsamples)
    n = graph.num_nodes()
    total = None
    for s in sources:
        d = bfs(graph, s).where(F.col("node") != s)
        part = d.select(
            "node",
            (1.0 / F.col("dist")).alias("h") if harmonic else F.col("dist").cast("double").alias("h"),
        )
        total = part if total is None else (
            total.unionByName(part).groupBy("node").agg(F.sum("h").alias("h"))
        )
        total = total.localCheckpoint(eager=True)
    scale = n / len(sources)
    if harmonic:
        out_score = F.coalesce("h", F.lit(0.0)) * scale
    else:
        # closeness: (n-1) / (scaled distance sum); unreached → 0
        out_score = F.when(
            F.coalesce("h", F.lit(0.0)) > 0, (n - 1) / (F.col("h") * scale)
        ).otherwise(F.lit(0.0))
    return (
        graph.vertices()
        .join(total, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), out_score.alias("score"))
    )


def top_closeness(graph: EdgeGraph, k: int = 10, nsamples: int | None = None) -> DataFrame:
    """TopCloseness surface: full (or sampled) scores + deterministic
    top-k (score desc, node asc)."""
    return (
        closeness(graph, nsamples=nsamples)
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
    )
