"""Dyn* distance algorithms: DynBFS, DynDijkstra, DynBetweenness.

Reference: ``cpp/distance/DynBFS.{h,cpp}`` / ``DynDijkstra.{h,cpp}``
(Bergamini et al.) update an SSSP after EDGE insertions — distances can
only DECREASE, so the update is a monotone relaxation seeded at the
improved endpoints; removals are not supported by the reference
``DynSSSP`` surface either (``DynBFS.h:36-40`` "updates the distances
after an edge insertion").  ``DynApproxBetweenness``
(``cpp/centrality/DynApproxBetweenness.h``) keeps a set of sampled
sources and, after a batch, re-runs ONLY the SSSPs whose shortest paths
the batch changed.

Spark mapping: the converged distance table IS the resumable state
(same checkpointed-superstep design as ``incremental_components`` /
``incremental_pagerank``).  An insertion batch seeds a frontier with
the endpoints whose tentative distance improved through a new edge;
relax supersteps then send messages ONLY from changed nodes (active-set
frontier), so the cost is O(vol(affected region)) per superstep, not
O(m).  Batches containing removals or weight increases fall back to a
static recompute (labels/distances are monotone under the incremental
path — a removal can only be handled by re-deriving, which is also what
the reference's dynamic-CC does on removals).

At 100 TB: state tables are (node, dist) / (source, node, dist) parquet
checkpoints partitioned by node — each update batch is a broadcast join
of the (small) event batch against state plus frontier supersteps that
touch only the affected region's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    apply_events,
)

_INF = float("inf")


def _batch_is_incremental(events: DataFrame) -> bool:
    """Only EDGE_ADDITION batches keep distances monotone-decreasing."""
    return events.where(F.col("kind") != EDGE_ADDITION).limit(1).count() == 0


def _added_edges(events: DataFrame, hops: bool) -> DataFrame:
    """Canonical (src, dst, weight) of the batch's insertions."""
    w = F.lit(1.0) if hops else F.col("w").cast("double")
    return events.where(F.col("kind") == EDGE_ADDITION).select(
        F.least("u", "v").alias("src"),
        F.greatest("u", "v").alias("dst"),
        w.alias("weight"),
    )


def _relax_from_frontier(
    graph: EdgeGraph, dist: DataFrame, frontier: DataFrame, max_rounds: int = 256
) -> DataFrame:
    """Monotone relax supersteps; messages only from changed nodes.

    ``dist`` = (node, dist) over all vertices (inf allowed); ``frontier``
    = (node, dist) subset whose distance just improved.  Converges when
    no node improves (positive weights ⇒ monotone ⇒ finite)."""
    sym = graph.sym().persist()
    dist = dist.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if frontier.limit(1).count() == 0:
            break
        cand = (
            sym.join(
                frontier.withColumnRenamed("node", "src").withColumnRenamed("dist", "sdist"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("sdist") + F.col("weight")).alias("cand"))
        )
        new = dist.join(cand, "node", "left").select(
            "node",
            F.least("dist", F.coalesce("cand", "dist")).alias("dist"),
            (F.coalesce("cand", F.lit(_INF)) < F.col("dist")).alias("chg"),
        ).localCheckpoint(eager=True)
        frontier = new.where("chg").select("node", "dist")
        dist = new.select("node", "dist")
    sym.unpersist()
    return dist


def incremental_sssp(
    graph: EdgeGraph,
    source: int,
    prev_dist: DataFrame,
    events: DataFrame,
    hops: bool = False,
) -> tuple[EdgeGraph, DataFrame]:
    """DynBFS (``hops=True``) / DynDijkstra (``hops=False``): apply the
    batch, then resume relaxation from the previous converged distances.

    ``prev_dist`` = (node, dist) with unreachable nodes ABSENT (the
    ``bfs``/``sssp`` output convention); returns the same shape.

    Directed graphs take the static recompute path: the warm-start seed
    below canonicalizes insertions to (least, greatest) and propagates
    improvements through BOTH directions, which on a directed graph
    would write distances through non-existent reverse edges (the
    reference DynBFS/DynDijkstra handle directed graphs natively;
    a direction-aware warm start needs non-canonicalized event edges).
    """
    from networkit_spark.operators.bfs import bfs, sssp

    new_graph = apply_events(graph, events)
    if hops:
        new_graph = EdgeGraph(
            new_graph.edges.withColumn("weight", F.lit(1.0)),
            new_graph.directed,
            new_graph.weighted,
        )
    if new_graph.directed or not _batch_is_incremental(events):
        out = bfs(new_graph, source) if hops else sssp(new_graph, source)
        if hops:
            out = out.select("node", F.col("dist").cast("double").alias("dist"))
        return new_graph, out

    prev = prev_dist.select("node", F.col("dist").cast("double").alias("dist"))
    # full vertex frame with inf for newly-added / unreached nodes
    dist = (
        new_graph.vertices()
        .join(prev, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("dist", F.lit(_INF)).alias("dist"))
    )
    # seed: endpoints improved through a new edge (either direction)
    added = _added_edges(events, hops)
    added_sym = added.unionByName(
        added.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    du = dist.withColumnRenamed("node", "src").withColumnRenamed("dist", "du")
    dv = dist.withColumnRenamed("node", "dst").withColumnRenamed("dist", "dv")
    improved = (
        added_sym.join(du, "src")
        .join(dv, "dst")
        .where(F.col("du") + F.col("weight") < F.col("dv"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min(F.col("du") + F.col("weight")).alias("new_dist"))
    )
    dist = dist.join(improved, "node", "left").select(
        "node", F.least("dist", F.coalesce("new_dist", "dist")).alias("dist")
    )
    frontier = (
        dist.join(improved, "node", "left_semi")
        .select("node", "dist")
    )
    out = _relax_from_frontier(new_graph, dist, frontier)
    return new_graph, out.where(F.col("dist") != _INF)


# ---------------------------------------------------------------------------
# DynBetweenness (sampled, affected-source recompute)
# ---------------------------------------------------------------------------


class BetweennessState:
    """Resumable sampled-betweenness state: the source sample, each
    source's converged BFS distances, and each source's dependency
    contributions.  ``scores()`` scales the raw sums like
    ``EstimateBetweenness`` (n/k)."""

    def __init__(self, graph: EdgeGraph, sources: list[int], dist: DataFrame, delta: DataFrame):
        self.graph = graph
        self.sources = sources
        self.dist = dist  # (source, node, dist)
        self.delta = delta  # (source, node, delta)

    def scores(self, normalized: bool = False) -> DataFrame:
        n = self.graph.num_nodes()
        k = len(self.sources)
        scale = n / k if k < n else 1.0
        if normalized:
            pairs = (n - 1) * (n - 2)
            if not self.graph.directed:
                pairs //= 2
            scale /= max(pairs, 1)
        verts = self.graph.vertices()
        agg = self.delta.groupBy("node").agg(F.sum("delta").alias("raw"))
        return verts.join(agg, verts["id"] == agg["node"], "left").select(
            verts["id"].alias("node"),
            (F.coalesce("raw", F.lit(0.0)) * scale).alias("score"),
        )


def _source_tables(graph: EdgeGraph, source: int) -> tuple[DataFrame, DataFrame]:
    """One Brandes pass returning both (node, dist) and (node, delta)."""
    from networkit_spark.operators.betweenness import _brandes_single_source
    from networkit_spark.operators.bfs import bfs

    sym = graph.sym().select("src", "dst").persist()
    delta = _brandes_single_source(sym, graph.vertices(), source)
    sym.unpersist()
    dist = bfs(graph, source).select("node", F.col("dist").cast("double").alias("dist"))
    return dist, delta


def betweenness_state(
    graph: EdgeGraph, sources: list[int] | None = None, nsamples: int | None = None
) -> BetweennessState:
    """Build the resumable state (DynApproxBetweenness constructor +
    run()).  Deterministic md5-ordered sample like ``betweenness``."""
    verts = graph.vertices()
    if sources is None:
        n = graph.num_nodes()
        if nsamples is not None and nsamples < n:
            picked = (
                verts.orderBy(F.md5(F.concat(F.lit("bw:"), F.col("id").cast("string"))))
                .limit(nsamples)
                .collect()
            )
            sources = [r["id"] for r in picked]
        else:
            sources = [r["id"] for r in verts.orderBy("id").collect()]
    dist_all, delta_all = None, None
    for s in sources:
        d, dl = _source_tables(graph, s)
        d = d.withColumn("source", F.lit(int(s)))
        dl = dl.withColumn("source", F.lit(int(s)))
        dist_all = d if dist_all is None else dist_all.unionByName(d)
        delta_all = dl if delta_all is None else delta_all.unionByName(dl)
    dist_all = dist_all.localCheckpoint(eager=True)
    delta_all = delta_all.localCheckpoint(eager=True)
    return BetweennessState(graph, list(sources), dist_all, delta_all)


def incremental_betweenness(
    state: BetweennessState, events: DataFrame
) -> BetweennessState:
    """DynApproxBetweenness.updateBatch: apply the batch, find the
    sources whose shortest-path DAG the insertions changed (an inserted
    edge {u,v} creates new shortest paths from s iff
    ``|d(s,u) − d(s,v)| >= 1`` — ≥2 shortens distances, =1 adds
    equal-length paths that change σ; unreachable = inf), and re-run
    Brandes for ONLY those sources; untouched sources keep their cached
    tables.  Non-insertion batches rebuild the state statically."""
    new_graph = apply_events(state.graph, events)
    if not _batch_is_incremental(events):
        return betweenness_state(new_graph, sources=state.sources)

    added = _added_edges(events, hops=True)
    du = state.dist.select("source", F.col("node").alias("src"), F.col("dist").alias("du"))
    dv = state.dist.select("source", F.col("node").alias("dst"), F.col("dist").alias("dv"))
    per_source = (
        added.crossJoin(
            state.dist.select("source").distinct()
        )
        .join(du, ["source", "src"], "left")
        .join(dv, ["source", "dst"], "left")
        .select(
            "source",
            F.coalesce("du", F.lit(_INF)).alias("du"),
            F.coalesce("dv", F.lit(_INF)).alias("dv"),
        )
    )
    affected_rows = (
        # |du−dv| >= 2: distances change.  |du−dv| == 1: distances hold
        # but the edge joins consecutive BFS levels, adding equal-length
        # shortest paths — σ and δ change, so the source is affected too.
        # |du−dv| == 0: a same-level edge lies on no shortest path.
        # inf−finite = inf (affected: attaches a new subtree);
        # inf−inf = NaN, and NaN >= 1 is false (both unreachable).
        per_source.where(F.abs(F.col("du") - F.col("dv")) >= 1.0)
        .select("source")
        .distinct()
        .collect()
    )
    affected = {r["source"] for r in affected_rows}
    if not affected:
        return BetweennessState(new_graph, state.sources, state.dist, state.delta)

    keep_dist = state.dist.where(~F.col("source").isin(list(affected)))
    keep_delta = state.delta.where(~F.col("source").isin(list(affected)))
    dist_all, delta_all = keep_dist, keep_delta
    for s in sorted(affected):
        d, dl = _source_tables(new_graph, s)
        dist_all = dist_all.unionByName(d.withColumn("source", F.lit(int(s))))
        delta_all = delta_all.unionByName(dl.withColumn("source", F.lit(int(s))))
    dist_all = dist_all.localCheckpoint(eager=True)
    delta_all = delta_all.localCheckpoint(eager=True)
    return BetweennessState(new_graph, state.sources, dist_all, delta_all)
