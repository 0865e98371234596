"""Selective community detection — PageRankNibble seed-set expansion.

Reference: ``cpp/scd/PageRankNibble.{h,cpp}`` + ``cpp/scd/
ApproximatePageRank.cpp`` (Spielman-Teng / Andersen-Chung-Lang): lazy
epsilon-push personalized PageRank from a seed, then the prefix of the
ppr/volume-ordered sweep minimizing conductance.

Spark shape — LOCAL at every stage, per the ACL guarantee:

* :func:`approximate_pagerank` is the synchronous analog of the
  reference's push queue (``ApproximatePageRank.cpp:20-38``): per
  superstep every node with residual r(u)/vol(u) ≥ ε pushes at once —
  p(u) += α·r(u), each neighbor receives (1−α)·r(u)·w/(2·vol(u)), and
  r(u) ← (1−α)·r(u)/2.  The state tables hold ONLY the support, which
  ACL bounds by |supp(p)| ≤ 1/(ε·α) **independent of graph size**; each
  superstep's join touches only edges incident to active nodes.
* The sweep cut applies ``orderBy().limit(k)`` (TakeOrdered — parallel
  partial top-k, no global window over the graph) BEFORE any window
  function; the remaining rank/cumsum windows run over ≤ k =
  min(max_size, ⌈1/(ε·α)⌉) rows — a constant, not O(n).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from networkit_spark.graph import EdgeGraph, truncate_lineage


def personalized_pagerank(
    graph: EdgeGraph, seeds: list[int], alpha: float = 0.15, iters: int = 30
) -> DataFrame:
    """(node, ppr) — EXACT power iteration with teleport mass on
    ``seeds`` (drains all residual; mass sums to 1).  Kept as the dense
    oracle twin of :func:`approximate_pagerank`; the nibble path uses
    the push variant."""
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


def approximate_pagerank(
    graph: EdgeGraph,
    seeds: list[int],
    alpha: float = 0.15,
    eps: float = 1e-5,
    max_iter: int = 100,
) -> DataFrame:
    """(node, ppr) — lazy epsilon-push PPR (``ApproximatePageRank.cpp``,
    synchronous: all above-threshold nodes push per superstep).  Only
    the support is materialized; |supp| ≤ 1/(ε·α) by ACL Lemma 2, so
    state size and per-superstep cost are independent of n."""
    spark = graph.spark
    sym = (
        graph.sym()
        .select("src", "dst", "weight")
        .persist()
    )
    # volume = weightedDegree with self-loops twice (G.volume)
    vol = (
        graph.sym()
        .groupBy(F.col("src").alias("node"))
        .agg(
            (F.sum("weight")
             + F.sum(F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0))
             ).alias("vol")
        )
    )
    seed_mass = 1.0 / len(seeds)
    r = spark.createDataFrame(
        [(int(s), seed_mass) for s in seeds], "node long, r double"
    )
    p = spark.createDataFrame([], "node long, ppr double")
    for it in range(max_iter):
        rj = r.join(vol, "node").localCheckpoint(eager=True)
        active = rj.where(F.col("r") >= eps * F.col("vol"))
        if active.isEmpty():
            break
        p = truncate_lineage(
            p.unionByName(
                active.select("node", (alpha * F.col("r")).alias("ppr"))
            )
            .groupBy("node")
            .agg(F.sum("ppr").alias("ppr")),
            it,
        )
        msgs = (
            active.select(F.col("node").alias("src"), "r", "vol")
            .join(sym, "src")
            .select(
                F.col("dst").alias("node"),
                ((1.0 - alpha) * F.col("r") * F.col("weight") / (2.0 * F.col("vol"))).alias("r"),
            )
        )
        lazy = active.select("node", ((1.0 - alpha) * F.col("r") / 2.0).alias("r"))
        keep = rj.where(F.col("r") < eps * F.col("vol")).select("node", "r")
        r = truncate_lineage(
            keep.unionByName(lazy).unionByName(msgs)
            .groupBy("node")
            .agg(F.sum("r").alias("r")),
            it,
        )
    sym.unpersist()
    return p


def pagerank_nibble(
    graph: EdgeGraph,
    seed: int,
    alpha: float = 0.15,
    iters: int = 100,
    max_size: int | None = None,
    eps: float = 1e-5,
) -> DataFrame:
    """(node,) — the minimum-conductance sweep prefix around ``seed``
    (``PageRankNibble::bestSweepSet``): rank the PPR support by
    ppr/volume, cut(S_k) = vol(k) − 2·w(edges inside the prefix) via one
    per-edge max-rank histogram + running sums.  The candidate set is
    capped at k = min(max_size, ⌈1/(ε·α)⌉) with a TakeOrdered BEFORE
    the rank window, so no window ever spans more than k rows."""
    ppr = approximate_pagerank(graph, [seed], alpha=alpha, eps=eps, max_iter=iters)
    cap = int(math.ceil(1.0 / (eps * alpha)))
    k = min(max_size, cap) if max_size is not None else cap
    ssym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    vol = ssym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("vol"))
    two_m = ssym.agg(F.sum("weight")).collect()[0][0] or 0.0  # = 2m (weighted)
    top = (
        ppr.join(vol, "node")
        .where(F.col("ppr") > 0)
        .select("node", "vol", (F.col("ppr") / F.col("vol")).alias("key"))
        .orderBy(F.desc("key"), F.asc("node"))
        .limit(k)  # TakeOrderedAndProject — parallel partial top-k
    )
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("key"), F.asc("node")))
    ).localCheckpoint(eager=True)
    # per-edge max rank (edges with BOTH endpoints in the capped prefix)
    ru = ranked.select(F.col("node").alias("src"), F.col("rnk").alias("ru"))
    rv = ranked.select(F.col("node").alias("dst"), F.col("rnk").alias("rv"))
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    internal_hist = (
        e.join(ru, "src")
        .join(rv, "dst")
        .groupBy(F.greatest("ru", "rv").alias("rnk"))
        .agg(F.sum("weight").alias("closed_w"))
    )
    w = Window.orderBy("rnk")  # ≤ k rows by construction
    sweep = (
        ranked.join(internal_hist, "rnk", "left")
        .select(
            "node", "rnk", "vol",
            F.coalesce("closed_w", F.lit(0.0)).alias("closed_w"),
        )
        .select(
            "node", "rnk",
            F.sum("vol").over(w).alias("cvol"),
            (2.0 * F.sum("closed_w").over(w)).alias("internal2"),
        )
        .select(
            "node", "rnk",
            F.when(
                F.least(F.col("cvol"), F.lit(two_m) - F.col("cvol")) > 0,
                (F.col("cvol") - F.col("internal2"))
                / F.least(F.col("cvol"), F.lit(two_m) - F.col("cvol")),
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
    kbest = best[0]["rnk"]
    return ranked.where(F.col("rnk") <= kbest).select("node")
