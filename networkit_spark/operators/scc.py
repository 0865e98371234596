"""Strongly connected components — iterative coloring (FW-BW style).

Reference: ``StronglyConnectedComponents`` (iterative Tarjan,
``cpp/components/StronglyConnectedComponents.cpp:25-99``, directed).
Tarjan's stack is inherently sequential, so the distributed engine uses
the COLORING algorithm (Orzan / FW-BW family, the standard Pregel SCC):

repeat until no nodes remain:
  1. forward max-label propagation: ``color(v) = max(color(v),
     color(u) for u→v)`` to fixpoint — every node gets the largest
     node id that can reach it;
  2. backward marking within colors: starting from each root r
     (``color(r) = r``), mark nodes reachable BACKWARD from r along
     edges whose endpoints share the color — marked nodes form the SCC
     of r;
  3. emit those SCCs (label = root id), remove them, repeat.

Output labels are each component's maximum node id (canonical —
compared up to relabeling like the reference's partition tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def strongly_connected_components(graph: EdgeGraph, max_outer: int = 64) -> DataFrame:
    """(node, label) — label = max node id of the SCC."""
    assert graph.directed, "SCC is defined for directed graphs"
    spark = graph.spark
    edges = graph.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    remaining = graph.vertices().select(F.col("id").alias("node")).localCheckpoint(eager=True)
    result = None

    for _ in range(max_outer):
        if remaining.count() == 0:
            break
        e = (
            edges.join(remaining.withColumnRenamed("node", "src"), "src", "leftsemi")
            .join(remaining.withColumnRenamed("node", "dst"), "dst", "leftsemi")
            .localCheckpoint(eager=True)
        )
        # 1. forward max propagation
        color = remaining.select("node", F.col("node").alias("color"))
        color = color.localCheckpoint(eager=True)
        while True:
            prop = (
                e.join(color.withColumnRenamed("node", "src").withColumnRenamed("color", "c"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.max("c").alias("cand"))
            )
            new = color.join(prop, "node", "left").select(
                "node",
                F.greatest("color", F.coalesce("cand", "color")).alias("color"),
                (F.coalesce("cand", F.lit(-1)) > F.col("color")).alias("chg"),
            ).localCheckpoint(eager=True)
            changed = new.where("chg").count()
            color = new.select("node", "color")
            if changed == 0:
                break
        # 2. backward marking within same color
        marked = color.where(F.col("node") == F.col("color")).select("node", "color")
        marked = marked.localCheckpoint(eager=True)
        while True:
            step = (
                e.join(marked.withColumnRenamed("node", "dst").withColumnRenamed("color", "mc"), "dst")
                .select(F.col("src").alias("node"), F.col("mc"))
                .join(color, "node")
                .where(F.col("color") == F.col("mc"))
                .select("node", "color")
                .distinct()
                .join(marked.select("node"), "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if step.count() == 0:
                break
            marked = marked.unionByName(step).localCheckpoint(eager=True)
        scc = marked.select("node", F.col("color").alias("label"))
        result = scc if result is None else result.unionByName(scc)
        result = result.localCheckpoint(eager=True)
        remaining = remaining.join(marked.select("node"), "node", "left_anti").localCheckpoint(eager=True)

    if remaining.count() > 0:
        raise RuntimeError(
            f"strongly_connected_components: max_outer={max_outer} rounds "
            f"exhausted with {remaining.count()} nodes unlabeled — raise "
            "max_outer (each round removes at least one SCC)"
        )
    return result if result is not None else spark.createDataFrame([], "node long, label long")
