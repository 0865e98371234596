"""Betweenness centrality — Brandes accumulation as level-synchronous
supersteps.

Reference: exact ``Betweenness`` (Brandes, ``cpp/centrality/
Betweenness.h:18``, 140 LoC) and the sampled ``EstimateBetweenness``
(mean dependency of k sampled sources scaled by n/k,
``cpp/centrality/EstimateBetweenness.cpp``).

Spark shape per source s (unweighted):

1. forward BFS by levels: ``dist``, and σ (shortest-path counts)
   accumulated per level as ``σ(v) = Σ σ(u)`` over edges from the
   previous level — a frontier join + groupBy;
2. backward sweep from the deepest level: dependency
   ``δ(u) += σ(u)/σ(w) · (1 + δ(w))`` over edges (u at l, w at l+1) —
   one join + groupBy per level;
3. ``BC(v) += δ(v)`` for v ≠ s.

Cost: O(diameter) supersteps per source — exact betweenness is n
sources (fixture-scale only); the scale path samples k sources
(deterministic hash order) like the reference's EstimateBetweenness.
Undirected raw scores are NOT halved — the reference accumulates the
dependency from every source, so each unordered pair contributes from
both endpoints; only the NORMALIZED undirected variant divides the
pair count by two (``Betweenness.cpp`` run() normalization block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _brandes_single_source(sym: DataFrame, vertices: DataFrame, source: int) -> DataFrame:
    """(node, delta) — dependency of `source` on every other node."""
    spark = sym.sparkSession
    # forward: levels with sigma
    levels = [
        spark.createDataFrame([(int(source), 1.0)], "node long, sigma double")
        .localCheckpoint(eager=True)
    ]
    seen = levels[0].select("node")
    while True:
        frontier = levels[-1]
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(seen.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        seen = seen.unionByName(nxt.select("node")).localCheckpoint(eager=True)
    # backward: delta per level
    delta = levels[-1].select("node", F.lit(0.0).alias("delta")).localCheckpoint(eager=True)
    acc = [delta]
    for l in range(len(levels) - 2, -1, -1):
        upper = acc[-1].join(levels[l + 1], "node")  # (node=w, delta, sigma_w)
        contrib = (
            sym.join(
                upper.select(
                    F.col("node").alias("dst"),
                    ((1.0 + F.col("delta")) / F.col("sigma")).alias("f"),
                ),
                "dst",
            )
            .join(levels[l].withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("f") * F.col("sigma")).alias("delta"))
        )
        lev_delta = (
            levels[l]
            .select("node")
            .join(contrib, "node", "left")
            .select("node", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        acc.append(lev_delta)
    out = acc[0]
    for a in acc[1:]:
        out = out.unionByName(a)
    return out.where(F.col("node") != source)


def betweenness(
    graph: EdgeGraph,
    sources: list[int] | None = None,
    nsamples: int | None = None,
    normalized: bool = False,
) -> DataFrame:
    """(node, score).  All sources → exact Brandes; ``nsamples`` →
    EstimateBetweenness (scaled by n/k).  Raw scores are NOT halved for
    undirected graphs (``Betweenness.cpp`` accumulates both directions);
    ``normalized`` divides by (n-1)(n-2) directed, (n-1)(n-2)/2
    undirected (``Betweenness.cpp`` pairs = (n-2)(n-1) [/ 2])."""
    sym = graph.sym().select("src", "dst").persist()
    vertices = graph.vertices().persist()
    n = graph.num_nodes()
    if sources is None:
        if nsamples is not None and nsamples < n:
            # deterministic sample (reference samples uniformly with its
            # seeded RNG; we fix the md5 order).  ORDER BY md5 LIMIT k
            # runs as a distributed TakeOrdered — only the k winners are
            # collected, never the full node set.
            picked = (
                vertices.orderBy(
                    F.md5(F.concat(F.lit("bw:"), F.col("id").cast("string")))
                )
                .limit(nsamples)
                .collect()
            )
            sources = [r["id"] for r in picked]
        else:
            sources = [r["id"] for r in vertices.orderBy("id").collect()]
    total = None
    for s in sources:
        d = _brandes_single_source(sym, vertices, s)
        total = d if total is None else (
            total.unionByName(d).groupBy("node").agg(F.sum("delta").alias("delta"))
        )
        total = total.localCheckpoint(eager=True)
    scale = 1.0
    if nsamples is not None and len(sources) < n:
        scale *= n / len(sources)
    if normalized:
        pairs = (n - 1) * (n - 2)
        if not graph.directed:
            pairs //= 2
        scale /= max(pairs, 1)
    out = (
        vertices.join(total, vertices["id"] == total["node"], "left")
        .select(
            vertices["id"].alias("node"),
            (F.coalesce("delta", F.lit(0.0)) * scale).alias("score"),
        )
    )
    sym.unpersist()
    vertices.unpersist()
    return out


def estimate_betweenness(
    graph: EdgeGraph,
    nsamples: int,
    normalized: bool = False,
) -> DataFrame:
    """``EstimateBetweenness`` (``cpp/centrality/EstimateBetweenness
    .h:20-36``) — the Brandes-Pich sampled estimator with NO error
    guarantee (for the (ε, δ)-guaranteed variant see
    ``approx_betweenness``): k sampled sources, per-source Brandes
    dependencies, scaled by n/k.  Exactly :func:`betweenness` with
    ``nsamples`` — this surface names the reference class."""
    return betweenness(graph, nsamples=nsamples, normalized=normalized)
