"""Spectral centralities — power iterations over the edge DataFrame.

- ``EigenvectorCentrality`` (``cpp/centrality/EigenvectorCentrality.h:20``,
  80 LoC): power iteration of the adjacency operator; L2-normalized each
  step; convergence on L2 delta; final sign/scaling = max-norm
  (reference scales so max |x| = 1 via infinity norm normalization of
  the converged vector).
- ``KatzCentrality`` (``cpp/centrality/KatzCentrality.h:22``, 74 LoC):
  ``x_{t+1} = α·A·x_t + β`` — PageRank-like without degree
  normalization; α must be < 1/λ_max for convergence.

Both reuse the engine's gather shape: ``sym ⨝ scores → groupBy(dst)``
(Catalyst path) — at bench scale they drop onto the same prepared CSR
blob machinery as PageRank (message value = score, op = wsum).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _gather(sym: DataFrame, scores: DataFrame) -> DataFrame:
    return (
        sym.join(scores.withColumnRenamed("node", "src"), "src")
        .select("dst", (F.col("weight") * F.col("score")).alias("c"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("c").alias("agg"))
    )


def eigenvector_centrality(
    graph: EdgeGraph, tol: float = 1e-9, max_iter: int | None = 1000
) -> DataFrame:
    """(node, score) — dominant eigenvector, inf-norm scaled to 1."""
    sym = graph.sym().persist()
    n = graph.num_nodes()
    scores = graph.vertices().select(
        F.col("id").alias("node"), F.lit(1.0 / math.sqrt(n)).alias("score")
    ).localCheckpoint(eager=True)
    it = 0
    while True:
        it += 1
        agg = _gather(sym, scores)
        new = scores.join(agg, "node", "left").select(
            "node", F.coalesce("agg", F.lit(0.0)).alias("raw"), F.col("score").alias("old")
        )
        norm = math.sqrt(
            new.agg(F.sum(F.col("raw") * F.col("raw"))).collect()[0][0] or 1.0
        )
        new = new.select(
            "node", (F.col("raw") / norm).alias("score"), "old"
        ).localCheckpoint(eager=True)
        delta = math.sqrt(
            new.agg(F.sum(F.pow(F.col("score") - F.col("old"), 2))).collect()[0][0] or 0.0
        )
        scores = new.select("node", "score")
        if delta <= tol or (max_iter is not None and it >= max_iter):
            break
    mx = scores.agg(F.max(F.abs("score"))).collect()[0][0] or 1.0
    out = scores.select("node", (F.col("score") / mx).alias("score"))
    sym.unpersist()
    return out


def katz_centrality(
    graph: EdgeGraph,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iter: int | None = 1000,
    init_scores: DataFrame | None = None,
) -> DataFrame:
    """(node, score) — Katz index, L2-normalized like the reference.

    ``init_scores`` (node, score) warm-starts the fixed-point iteration
    ``x ← αAx + β`` — the map is a contraction to the unique fixed point
    for α < 1/λ_max, so any init converges; a previous converged vector
    gets there in a handful of supersteps (the DynKatzCentrality resume
    path, ``cpp/centrality/DynKatzCentrality.h``)."""
    sym = graph.sym().persist()
    if init_scores is not None:
        verts = graph.vertices()
        scores = (
            verts.join(init_scores, verts["id"] == init_scores["node"], "left")
            .select(
                verts["id"].alias("node"),
                F.coalesce("score", F.lit(0.0)).alias("score"),
            )
        ).localCheckpoint(eager=True)
    else:
        scores = graph.vertices().select(
            F.col("id").alias("node"), F.lit(0.0).alias("score")
        ).localCheckpoint(eager=True)
    it = 0
    while True:
        it += 1
        agg = _gather(sym, scores)
        new = scores.join(agg, "node", "left").select(
            "node",
            (alpha * F.coalesce("agg", F.lit(0.0)) + beta).alias("score"),
            F.col("score").alias("old"),
        ).localCheckpoint(eager=True)
        delta = math.sqrt(
            new.agg(F.sum(F.pow(F.col("score") - F.col("old"), 2))).collect()[0][0] or 0.0
        )
        scores = new.select("node", "score")
        if delta <= tol or (max_iter is not None and it >= max_iter):
            break
    norm = math.sqrt(scores.agg(F.sum(F.col("score") * F.col("score"))).collect()[0][0] or 1.0)
    out = scores.select("node", (F.col("score") / norm).alias("score"))
    sym.unpersist()
    return out
