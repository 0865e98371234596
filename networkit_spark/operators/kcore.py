"""Core decomposition — iterative peel.

``CoreDecomposition`` (``cpp/centrality/CoreDecomposition.h:26,33-40``,
ParK bucket algorithm, 341 LoC): core number of v = largest k such that
v belongs to the k-core (maximal subgraph with min degree ≥ k).

Spark shape: the ParK peel loop as frontier filter supersteps — for
k = 1, 2, …: repeatedly delete nodes with current degree < k; nodes
deleted while peeling k have core number k-1.  Each peel round is a
degree recompute (groupBy) + anti-join; the edge set only shrinks, so
rounds get cheaper.  Lineage truncated per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def core_decomposition(graph: EdgeGraph, max_k: int | None = None) -> DataFrame:
    """(node, core) — core numbers; self-loops ignored."""
    spark = graph.spark
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    remaining = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    result = None
    k = 0
    while remaining.count() > 0 and (max_k is None or k <= max_k):
        k += 1
        # peel everything with degree < k; survivors form the k-core
        while True:
            deg = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            low = remaining.join(deg, "id", "left").where(
                F.coalesce("deg", F.lit(0)) < k
            ).select("id")
            low = low.localCheckpoint(eager=True)
            n_low = low.count()
            if n_low == 0:
                break
            peeled = low.select("id", F.lit(k - 1).cast("long").alias("core"))
            result = peeled if result is None else result.unionByName(peeled)
            result = result.localCheckpoint(eager=True)
            remaining = remaining.join(low, "id", "left_anti").localCheckpoint(eager=True)
            edges = (
                edges.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
    if result is None:
        return spark.createDataFrame([], "id long, core long").withColumnRenamed("id", "node")
    return result.withColumnRenamed("id", "node")


def core_decomposition_hindex(graph: EdgeGraph, max_rounds: int = 64) -> DataFrame:
    """(node, core) via iterated neighborhood H-index (Lü et al. 2016):
    ``x_v ← H({x_u : u ∈ N(v)})`` starting from degrees converges to the
    coreness.  Each round is one join + one collect_list aggregation
    with the H-index computed by JVM higher-order array functions —
    typically <15 rounds vs the peel loop's O(k_max) sweeps.

    Scale note: collect_list materializes a hub's neighbor values in one
    row (O(deg) memory); for super-hub graphs use the peel variant or
    pre-salt.  Results are exact and asserted equal to the peel."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    x = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("val")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nb = (
            sym.join(x.withColumnRenamed("node", "dst").withColumnRenamed("val", "nval"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sort_array(F.collect_list("nval"), asc=False).alias("vals"))
        )
        new = nb.select(
            "node",
            F.expr("cast(size(filter(transform(vals, (v, i) -> v >= i + 1), b -> b)) as long)").alias("val"),
        ).localCheckpoint(eager=True)
        changed = (
            new.join(x.withColumnRenamed("val", "old"), "node")
            .where(F.col("val") != F.col("old"))
            .count()
        )
        x = new
        if changed == 0:
            break
    sym.unpersist()
    return x.withColumnRenamed("val", "core")
