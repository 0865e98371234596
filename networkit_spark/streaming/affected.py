"""AffectedNodes — which nodes a single edge event can touch, and by how much.

Reference: ``cpp/distance/AffectedNodes.{h,cpp}`` — given a graph and one
EDGE_ADDITION / EDGE_REMOVAL event, compute (a) the set of nodes whose
distances the event may change, (b) each affected node's (old) hop
distance to the modification, and (c) for additions, a level-based upper
bound on each affected node's harmonic-closeness improvement
(``AffectedNodes.cpp:146-171``).

Conventions mirror the reference: for BOTH event kinds the graph passed
in already CONTAINS the edge (additions are detected by re-running BFS
with the direct u↔v hop suppressed; removals seed the pruned search with
the opposite endpoint).

Spark shape: every search is a frontier-superstep BFS whose per-step
join touches only edges incident to the frontier; the pruned searches
advance ONLY through improved nodes, so their cost is proportional to
the affected region, not the graph (same locality the reference's queue
prune gives).  The level histograms collected to the driver are bounded
by the graph's diameter, never by n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _adjacency(graph: EdgeGraph, reverse: bool = False) -> DataFrame:
    if not graph.directed:
        return graph.sym().select("src", "dst")
    e = graph.edges.select("src", "dst")
    return e.select(F.col("dst").alias("src"), F.col("src").alias("dst")) if reverse else e


def _bfs_skip_first(adj: DataFrame, source: int, skip: int | None) -> DataFrame:
    """(node, dist) — BFS from ``source`` whose FIRST expansion ignores the
    direct hop to ``skip`` (``bfsWithoutStartNeighbor``)."""
    spark = adj.sparkSession
    dist = spark.createDataFrame([(int(source), 0)], "node long, dist long")
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    d = 0
    while True:
        d += 1
        nxt = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
        )
        if d == 1 and skip is not None:
            nxt = nxt.where(F.col("node") != int(skip))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def _pruned_bfs(
    adj: DataFrame, source: int, old: DataFrame, extra: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(affected, new_dist) — BFS from ``source`` that only advances
    through nodes whose first-touch distance beats ``old`` (the
    reference's ``getAffectedNodes``).  ``extra`` is seeded at distance 1
    and always affected (removal case).  ``new_dist`` is completed with
    ``min(touched, old)`` for every old-reachable node."""
    spark = adj.sparkSession
    rows = [(int(source), 0)]
    if extra is not None:
        rows.append((int(extra), 1))
    visited = spark.createDataFrame(rows, "node long, dist long").localCheckpoint(eager=True)
    old_d = old.select("node", F.col("dist").alias("old"))
    affected = (
        spark.createDataFrame([(int(extra),)], "node long")
        if extra is not None
        else spark.createDataFrame([], "node long")
    )
    frontier = visited
    while True:
        # per-node depth (the seeded ``extra`` starts one level deep, so
        # the frontier can hold mixed depths — min() reproduces the
        # reference queue's first-touch order, which is depth-monotone)
        touched = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if touched.isEmpty():
            break
        visited = visited.unionByName(touched).localCheckpoint(eager=True)
        improved = (
            touched.join(old_d, "node", "left")
            .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("node", "dist")
            .localCheckpoint(eager=True)
        )
        affected = affected.unionByName(improved.select("node"))
        if improved.isEmpty():
            break
        frontier = improved
    # completed new distances: min(first touch, old) over old-reachable ∪ touched
    new_dist = (
        visited.join(old_d, "node", "full")
        .select(
            "node",
            F.least(
                F.coalesce("dist", F.lit(2**62)), F.coalesce("old", F.lit(2**62))
            ).alias("dist"),
        )
    )
    return affected.distinct().localCheckpoint(eager=True), new_dist.localCheckpoint(eager=True)


def _hist(dist: DataFrame) -> dict[int, int]:
    return {
        int(r["dist"]): int(r["n"])
        for r in dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _level_improvement(new_hist: dict[int, int], old_hist: dict[int, int]):
    """i ↦ Σ_{j=1..maxNewLevel} (new[j] − old[j]) / (i + j)
    (``AffectedNodes.cpp:146-161`` — j is bounded by the NEW histogram's
    deepest level, old-only deeper levels are not subtracted)."""
    max_j = max((j for j in new_hist if j >= 1), default=0)

    def imp(i: int) -> float:
        return sum(
            (new_hist.get(j, 0) - old_hist.get(j, 0)) / float(i + j)
            for j in range(1, max_j + 1)
        )

    return imp


def _harmonic(hist: dict[int, int]) -> float:
    return sum(n / float(i) for i, n in hist.items() if i >= 1)


def affected_nodes(
    graph: EdgeGraph, kind: str, u: int, v: int
) -> tuple[DataFrame, dict]:
    """Run AffectedNodes for one ``EDGE_ADDITION`` / ``EDGE_REMOVAL`` event
    on edge (u, v); the graph must already contain the edge (reference
    convention).  Returns ``(df, info)`` where ``df`` is
    ``(node, dist, improvement)`` — old hop distance to the modification
    and (additions only; else 0.0) the harmonic-closeness improvement
    upper bound — and ``info`` carries the endpoint closeness values the
    reference exposes (``closenessU`` / ``closenessV``, post-event)."""
    spark = graph.spark
    info: dict = {}
    if kind == "EDGE_ADDITION":
        if not graph.directed:
            adj = _adjacency(graph).persist()
            old_u = _bfs_skip_first(adj, u, v)
            old_v = _bfs_skip_first(adj, v, u)
            aff_u, new_u = _pruned_bfs(adj, u, old_u)
            aff_v, new_v = _pruned_bfs(adj, v, old_v)
            hist_new_u, hist_old_u = _hist(new_u), _hist(old_u)
            hist_new_v, hist_old_v = _hist(new_v), _hist(old_v)
            info["closenessU"] = _harmonic(hist_new_u)
            info["closenessV"] = _harmonic(hist_new_v)
            imp_u = _level_improvement(hist_new_v, hist_old_v)  # for u's side
            imp_v = _level_improvement(hist_new_u, hist_old_u)  # for v's side
            rows_u = aff_u.join(new_v.withColumnRenamed("dist", "idx"), "node")
            rows_v = aff_v.join(new_u.withColumnRenamed("dist", "idx"), "node")
            side = rows_u.withColumn("side", F.lit(0)).unionByName(
                rows_v.withColumn("side", F.lit(1))
            )
            # the improvement tables are diameter-sized — build them as a
            # broadcastable lookup instead of a python UDF
            idxs = sorted(
                int(r["idx"]) for r in side.select("idx").distinct().collect()
            )
            lut = spark.createDataFrame(
                [(i, s, (imp_u if s == 0 else imp_v)(i) if i >= 1 else 0.0)
                 for i in idxs for s in (0, 1)],
                "idx long, side int, improvement double",
            )
            old_min = (
                old_u.withColumnRenamed("dist", "du")
                .join(old_v.withColumnRenamed("dist", "dv"), "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce("du", F.lit(2**62)), F.coalesce("dv", F.lit(2**62))
                    ).alias("dist"),
                )
            )
            out = (
                side.join(F.broadcast(lut), ["idx", "side"])
                .select("node", "side", "improvement")
                # nodes affected from both sides: the reference writes the
                # u-side loop first, then the v-side loop — v's value wins
                .groupBy("node")
                .agg(F.max(F.struct("side", "improvement")).alias("_s"))
                .select("node", F.col("_s.improvement").alias("improvement"))
                .join(old_min, "node")
                .select("node", "dist", "improvement")
            ).localCheckpoint(eager=True)
            adj.unpersist()
            return out, info
        # directed (``AffectedNodes.cpp:173-249``): affected = nodes whose
        # distance TO v improved (reverse pruned search); improvement
        # bounds come from u's forward level histograms
        radj = _adjacency(graph, reverse=True).persist()
        fadj = _adjacency(graph).persist()
        old_ru = _bfs_skip_first(radj, u, None)
        old_rv = _bfs_skip_first(radj, v, u)
        aff_v, new_rv = _pruned_bfs(radj, v, old_rv)
        old_fu = _bfs_skip_first(fadj, u, v)
        _, new_fu = _pruned_bfs(fadj, u, old_fu)
        hist_new_u, hist_old_u = _hist(new_fu), _hist(old_fu)
        info["closenessU"] = _harmonic(hist_new_u)
        imp_v = _level_improvement(hist_new_u, hist_old_u)
        rows = aff_v.join(new_rv.withColumnRenamed("dist", "idx"), "node")
        idxs = sorted(int(r["idx"]) for r in rows.select("idx").distinct().collect())
        lut = spark.createDataFrame(
            [(i, imp_v(i - 1) if i - 1 >= 1 else 0.0) for i in idxs],
            "idx long, improvement double",
        )
        old_min = (
            old_rv.withColumnRenamed("dist", "dv")
            .join(old_ru.withColumnRenamed("dist", "du"), "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dv", F.lit(2**62)), F.coalesce("du", F.lit(2**62))
                ).alias("dist"),
            )
        )
        out = (
            rows.join(F.broadcast(lut), "idx")
            .select("node", "improvement")
            .join(old_min, "node")
            .select("node", "dist", "improvement")
        ).localCheckpoint(eager=True)
        radj.unpersist()
        fadj.unpersist()
        return out, info
    if kind == "EDGE_REMOVAL":
        if not graph.directed:
            adj = _adjacency(graph).persist()
            old_u = _bfs_skip_first(adj, u, None)
            old_v = _bfs_skip_first(adj, v, None)
            aff_u, _ = _pruned_bfs(adj, u, old_u, extra=v)
            aff_v, _ = _pruned_bfs(adj, v, old_v, extra=u)
            old_min = (
                old_u.withColumnRenamed("dist", "du")
                .join(old_v.withColumnRenamed("dist", "dv"), "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce("du", F.lit(2**62)), F.coalesce("dv", F.lit(2**62))
                    ).alias("dist"),
                )
            )
            out = (
                aff_u.unionByName(aff_v).distinct()
                .join(old_min, "node")
                .select("node", "dist", F.lit(0.0).alias("improvement"))
            ).localCheckpoint(eager=True)
            adj.unpersist()
            return out, info
        radj = _adjacency(graph, reverse=True).persist()
        old_rv = _bfs_skip_first(radj, v, None)
        aff_v, _ = _pruned_bfs(radj, v, old_rv, extra=u)
        out = (
            aff_v.join(old_rv, "node")
            .select("node", "dist", F.lit(0.0).alias("improvement"))
        ).localCheckpoint(eager=True)
        radj.unpersist()
        return out, info
    raise ValueError(f"unsupported event kind for AffectedNodes: {kind}")
