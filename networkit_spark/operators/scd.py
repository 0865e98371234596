"""Selective community detection — PageRankNibble seed-set expansion.

Reference: ``cpp/scd/PageRankNibble.{h,cpp}`` (Spielman-Teng /
Andersen-Chung-Lang): approximate personalized PageRank from a seed,
then take the prefix of the ppr/deg-ordered sweep that minimizes
conductance.

Spark shape: PPR is the same power iteration as ``pagerank`` with the
teleport mass concentrated on the seed (the reference's push algorithm
is a sequential-queue approximation of exactly this fixpoint).  The
sweep cut is THE window-function trick: rank nodes by ppr/deg, then
cut(S_k) = cumvol(k) − 2·|{edges with max(rank_u, rank_v) ≤ k}| — one
histogram over per-edge max-ranks and two running sums, no k-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from networkit_spark.graph import EdgeGraph


def personalized_pagerank(
    graph: EdgeGraph, seeds: list[int], alpha: float = 0.15, iters: int = 30
) -> DataFrame:
    """(node, ppr) — teleport mass split uniformly over ``seeds``;
    power iteration, degree-normalized push (undirected view)."""
    sym = graph.sym().select("src", "dst").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    seed_mass = 1.0 / len(seeds)
    seeds_df = graph.spark.createDataFrame(
        [(int(s), seed_mass) for s in seeds], "node long, s double"
    )
    verts = graph.vertices().select(F.col("id").alias("node"))
    ppr = verts.join(seeds_df, "node", "left").select(
        "node", F.coalesce("s", F.lit(0.0)).alias("ppr")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            ppr.join(deg, "node")
            .select(F.col("node").alias("src"), (F.col("ppr") / F.col("deg")).alias("m"))
            .join(sym, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("m").alias("agg"))
        )
        ppr = (
            verts.join(contrib, "node", "left")
            .join(seeds_df, "node", "left")
            .select(
                "node",
                (
                    (1.0 - alpha) * F.coalesce("agg", F.lit(0.0))
                    + alpha * F.coalesce("s", F.lit(0.0))
                ).alias("ppr"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return ppr


def pagerank_nibble(
    graph: EdgeGraph,
    seed: int,
    alpha: float = 0.15,
    iters: int = 30,
    max_size: int | None = None,
) -> DataFrame:
    """(node,) — the minimum-conductance sweep prefix around ``seed``
    (``PageRankNibble::bestSweepSet``).  ``max_size`` bounds the
    candidate prefix (the reference bounds work via epsilon; a size
    bound is the declarative analog)."""
    ppr = personalized_pagerank(graph, [seed], alpha=alpha, iters=iters)
    ssym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst")
    deg = ssym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    two_m = ssym.count()  # = 2m
    ranked = (
        ppr.join(deg, "node")
        .where(F.col("ppr") > 0)
        .select("node", "deg", (F.col("ppr") / F.col("deg")).alias("key"))
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("key"), F.asc("node"))),
        )
    )
    if max_size is not None:
        ranked = ranked.where(F.col("rnk") <= max_size)
    ranked = ranked.localCheckpoint(eager=True)
    # per-edge max rank (edges with BOTH endpoints ranked)
    ru = ranked.select(F.col("node").alias("src"), F.col("rnk").alias("ru"))
    rv = ranked.select(F.col("node").alias("dst"), F.col("rnk").alias("rv"))
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    internal_hist = (
        e.join(ru, "src")
        .join(rv, "dst")
        .groupBy(F.greatest("ru", "rv").alias("rnk"))
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    w = Window.orderBy("rnk")
    sweep = (
        ranked.join(internal_hist, "rnk", "left")
        .select(
            "node", "rnk", "deg", F.coalesce("closed", F.lit(0)).alias("closed")
        )
        .select(
            "node", "rnk",
            F.sum("deg").over(w).alias("vol"),
            (2 * F.sum("closed").over(w)).alias("internal2"),
        )
        .select(
            "node", "rnk",
            F.when(
                F.least(F.col("vol"), F.lit(two_m) - F.col("vol")) > 0,
                (F.col("vol") - F.col("internal2")).cast("double")
                / F.least(F.col("vol"), F.lit(two_m) - F.col("vol")),
            ).alias("cond"),  # NULL at the degenerate full/empty prefix
        )
    )
    best = (
        sweep.where(F.col("cond").isNotNull() & ~F.isnan("cond"))
        .orderBy(F.asc("cond"), F.asc("rnk"))
        .limit(1)
        .collect()
    )
    if not best:
        return graph.spark.createDataFrame([(int(seed),)], "node long")
    k = best[0]["rnk"]
    return ranked.where(F.col("rnk") <= k).select("node")
