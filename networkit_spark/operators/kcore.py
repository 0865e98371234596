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
    coreness — typically <15 rounds vs the peel loop's O(k_max) sweeps.

    HUB-SAFE, list-free formulation: values are clamped to the
    degeneracy bound H0 = H-index of the degree sequence (coreness ≤ H0
    and for h ≤ H0 the clamp preserves every ≥-h count, so the fixpoint
    is EXACT — asserted equal to the peel variant in tests).  Each round
    aggregates per-(node, value) COUNTS (map-side combined shuffle; no
    row ever holds O(deg) data) and folds the ≤ H0+1 distinct-value
    counts per node with a JVM ``aggregate`` HOF:
    ``H = max_i min(w_i, Σ_{j≤i} c_j)`` over values sorted descending.
    A degree-10⁸ super-hub thus costs 10⁸ shuffle ROWS (spread across
    partitions) but never one 10⁸-element array in a single task."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("val")
    )
    # degree histogram is O(distinct degrees) rows — driver-safe; H0 is
    # the max h with ≥ h nodes of degree ≥ h
    hist = sorted(
        ((r["val"], r["c"]) for r in
         deg.groupBy("val").agg(F.count(F.lit(1)).alias("c")).collect()),
        reverse=True,
    )
    tot, h0 = 0, 0
    for v, c in hist:
        tot += c
        h0 = max(h0, min(int(v), tot))
    x = deg.select(
        "node", F.least("val", F.lit(h0)).cast("long").alias("val")
    ).localCheckpoint(eager=True)
    fold = """
        aggregate(ps,
                  struct(cast(0 as bigint) as cum, cast(0 as bigint) as best),
                  (acc, p) -> struct(acc.cum + p.c,
                                     greatest(acc.best, least(p.w, acc.cum + p.c))),
                  acc -> acc.best)"""
    for _ in range(max_rounds):
        cnts = (
            sym.join(
                x.withColumnRenamed("node", "src").withColumnRenamed("val", "nval"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), F.col("nval").alias("w"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        pairs = cnts.groupBy("node").agg(
            F.sort_array(F.collect_list(F.struct("w", "c")), asc=False).alias("ps")
        )
        new = pairs.select("node", F.expr(fold).alias("val")).localCheckpoint(eager=True)
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
