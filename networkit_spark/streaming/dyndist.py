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

from networkit_spark.graph import EdgeGraph, truncate_lineage
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    apply_events,
)

_INF = float("inf")


def _batch_is_incremental(events: DataFrame) -> bool:
    """Purely additive batches keep distances monotone-decreasing —
    EDGE_ADDITIONs plus the no-op NODE_ADDITION / TIME_STEP markers a
    dynamic-generator stream carries; anything destructive (removals,
    weight updates) forces the static path."""
    return (
        events.where(
            ~F.col("kind").isin(EDGE_ADDITION, "NODE_ADDITION", "TIME_STEP")
        )
        .limit(1)
        .count()
        == 0
    )


def _readds_existing_edge(graph: EdgeGraph, events: DataFrame) -> bool:
    """``apply_events`` SUMS the weight when an EDGE_ADDITION hits an
    existing edge — a weight INCREASE, which breaks the monotone-
    decreasing premise of every weighted warm start (hop distances are
    unaffected: the edge was already traversable).  Such batches must
    take the static path."""
    return (
        _added_edges(events, hops=True)
        .join(
            graph.edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            ),
            ["src", "dst"],
            "left_semi",
        )
        .limit(1)
        .count()
        > 0
    )


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
    if (
        new_graph.directed
        or not _batch_is_incremental(events)
        or (not hops and _readds_existing_edge(graph, events))
    ):
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


# ---------------------------------------------------------------------------
# DynAPSP (all pairs) + DynTopHarmonicCloseness
# ---------------------------------------------------------------------------


class APSPState:
    """Resumable all-pairs state: ``dist`` = (src, dst, dist) for every
    ordered REACHABLE pair (unreachable pairs are absent — same sparse
    convention as ``bfs``/``sssp``).  O(n²) rows by nature: the
    reference's ``DynAPSP`` (``cpp/distance/DynAPSP.h:24-33``) keeps the
    same n² matrix in shared memory; at scale the table lives as parquet
    partitioned by ``src`` and every update below is a broadcast-join
    scan of it, so the state never funnels through the driver."""

    def __init__(self, graph: EdgeGraph, dist: DataFrame, hops: bool):
        self.graph = graph
        self.dist = dist
        self.hops = hops

    def distances(self) -> DataFrame:
        return self.dist


def apsp_state(graph: EdgeGraph, hops: bool = True, max_rounds: int = 256) -> APSPState:
    """``DynAPSP::run`` (``cpp/distance/DynAPSP.cpp:29-43``) runs one
    SSSP per node; here ALL sources advance together in one min-plus
    superstep loop over the (src, dst) keyed table — n BFS wavefronts
    share each edge scan instead of n driver-side loops."""
    w = F.lit(1.0) if hops else F.col("weight")
    sym = graph.sym().select("src", "dst", w.alias("weight")).persist()
    dist = (
        graph.vertices()
        .select(F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(0.0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for rnd in range(max_rounds):
        hop = sym.select(
            F.col("src").alias("dst"), F.col("dst").alias("nxt"), "weight"
        )
        cand = (
            frontier.join(hop, "dst")
            .groupBy("src", F.col("nxt").alias("dst"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = dist.join(cand, ["src", "dst"], "full_outer").select(
            "src", "dst",
            F.least(
                F.coalesce("dist", F.lit(_INF)), F.coalesce("cand", F.lit(_INF))
            ).alias("dist"),
            (
                F.coalesce("cand", F.lit(_INF)) < F.coalesce("dist", F.lit(_INF))
            ).alias("chg"),
        )
        merged = truncate_lineage(merged, rnd + 1, every=8)
        frontier = merged.where("chg").select("src", "dst", "dist")
        dist = merged.select("src", "dst", "dist")
        if frontier.limit(1).count() == 0:
            break
    sym.unpersist()
    return APSPState(graph, dist, hops)


def incremental_apsp(state: APSPState, events: DataFrame) -> APSPState:
    """``DynAPSP::update`` (``cpp/distance/DynAPSP.cpp:65-160``): after
    inserting (u, v, w'), the only new shortest paths route through the
    new edge, so d'(x, y) = min(d(x, y), d(x, u) + w' + d(v, y)) — the
    reference's phase-1/phase-2 truncated BFSs enumerate exactly the
    (x, y) pairs this formula improves.  Spark shape: the rule IS one
    pass over the state — broadcast the distance vector INTO u and the
    vector FROM v, nested-loop them into a candidate table, min-merge
    with the state.  A batch is applied jointly and iterated to fixpoint
    (≤ |batch| rounds: a positive-weight shortest path uses each new
    edge at most once).  Non-insertion batches rebuild statically, as in
    the reference (insertions/weight-decreases only, ``:71-73``)."""
    new_graph = apply_events(state.graph, events)
    if (
        new_graph.directed
        or not _batch_is_incremental(events)
        or (not state.hops and _readds_existing_edge(state.graph, events))
    ):
        # directed fallback: _added_edges canonicalizes endpoint order,
        # so the warm start below would relax through reverse edges —
        # same guard as incremental_sssp; weighted re-additions are
        # weight increases (apply_events sums) and also force a rebuild
        return apsp_state(new_graph, state.hops)

    added = _added_edges(events, state.hops).collect()
    if not added:
        return APSPState(new_graph, state.dist, state.hops)

    dist = state.dist
    # vertices introduced by the batch need their (v, v, 0) seed row
    fresh = (
        new_graph.vertices()
        .join(
            dist.where(F.col("src") == F.col("dst")).select(F.col("src").alias("id")),
            "id",
            "left_anti",
        )
        .select(F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(0.0).alias("dist"))
    )
    dist = dist.unionByName(fresh).localCheckpoint(eager=True)

    for rnd in range(len(added)):
        cands = []
        for row in added:
            for a, b in ((row["src"], row["dst"]), (row["dst"], row["src"])):
                into_a = dist.where(F.col("dst") == a).select(
                    F.col("src").alias("x"), (F.col("dist") + F.lit(row["weight"])).alias("dxa")
                )
                from_b = dist.where(F.col("src") == b).select(
                    F.col("dst").alias("y"), F.col("dist").alias("dby")
                )
                cands.append(
                    into_a.crossJoin(F.broadcast(from_b)).select(
                        F.col("x").alias("src"),
                        F.col("y").alias("dst"),
                        (F.col("dxa") + F.col("dby")).alias("cand"),
                    )
                )
        cand = cands[0]
        for c in cands[1:]:
            cand = cand.unionByName(c)
        cand = cand.groupBy("src", "dst").agg(F.min("cand").alias("cand"))
        merged = dist.join(cand, ["src", "dst"], "full_outer").select(
            "src", "dst",
            F.least(
                F.coalesce("dist", F.lit(_INF)), F.coalesce("cand", F.lit(_INF))
            ).alias("dist"),
            (
                F.coalesce("cand", F.lit(_INF)) < F.coalesce("dist", F.lit(_INF))
            ).alias("chg"),
        ).localCheckpoint(eager=True)
        improved = merged.where("chg").limit(1).count() > 0
        dist = merged.select("src", "dst", "dist")
        if not improved:
            break
    return APSPState(new_graph, dist, state.hops)


class DynTopHarmonicCloseness:
    """``DynTopHarmonicCloseness`` (``cpp/centrality/
    DynTopHarmonicCloseness.h:30-48``): top-k harmonic closeness kept
    current under edge-insertion batches.  Rides on ``APSPState`` — the
    reference maintains per-node BFS information for the same purpose;
    here ``ranking()`` is one aggregate over the shared distance table,
    so every update's cost is the (pruned) APSP update itself."""

    def __init__(self, graph: EdgeGraph, k: int = 10, hops: bool = True):
        self.k = k
        self.state = apsp_state(graph, hops=hops)

    def update(self, events: DataFrame) -> "DynTopHarmonicCloseness":
        self.state = incremental_apsp(self.state, events)
        return self

    def ranking(self) -> DataFrame:
        """(node, score) — top-k by harmonic sum, deterministic
        (score desc, node asc) like ``top_closeness``.

        Grouped by ``src`` = distances FROM the node (out-harmonic),
        the reference's convention; for undirected graphs the two
        groupings coincide, for directed state they do not."""
        scores = (
            self.state.dist.where(F.col("src") != F.col("dst"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(1.0 / F.col("dist")).alias("score"))
        )
        full = (
            self.state.graph.vertices()
            .join(scores, F.col("id") == F.col("node"), "left")
            .select(F.col("id").alias("node"), F.coalesce("score", F.lit(0.0)).alias("score"))
        )
        return full.orderBy(F.desc("score"), F.asc("node")).limit(self.k)


# ---------------------------------------------------------------------------
# DynBetweennessOneNode
# ---------------------------------------------------------------------------


class BetweennessOneNodeState:
    """Resumable state for the betweenness of ONE node x
    (``cpp/centrality/DynBetweennessOneNode.h:20-72``): the reference
    keeps the n×n ``distances``/``sigma``/``sigmax`` matrices; here one
    (src, dst, dist, sigma) table suffices — σ_x(s, t) is DERIVED by a
    join (σ(s,x)·σ(x,t) where d(s,x)+d(x,t)=d(s,t)), so it never has to
    be maintained.  Hop metric (the reference also handles weights via
    Dijkstra; documented restriction).  O(n²) rows by nature, like
    ``APSPState``."""

    def __init__(self, graph: EdgeGraph, x: int, pairs: DataFrame):
        self.graph = graph
        self.x = int(x)
        self.pairs = pairs  # (src, dst, dist, sigma), reachable pairs

    def sigmax(self) -> DataFrame:
        """(src, dst, sigmax) — shortest s–t paths through x."""
        p = self.pairs
        sx = p.where(F.col("dst") == self.x).select(
            "src", F.col("dist").alias("d_sx"), F.col("sigma").alias("s_sx")
        )
        xt = p.where(F.col("src") == self.x).select(
            F.col("dst"), F.col("dist").alias("d_xt"), F.col("sigma").alias("s_xt")
        )
        return (
            p.join(sx, "src")
            .join(xt, "dst")
            .select(
                "src",
                "dst",
                F.when(
                    F.col("d_sx") + F.col("d_xt") == F.col("dist"),
                    F.col("s_sx") * F.col("s_xt"),
                )
                .otherwise(F.lit(0.0))
                .alias("sigmax"),
            )
        )

    def bcx(self) -> float:
        """Σ_{s≠x≠t} σ_x(s,t)/σ(s,t) over ordered reachable pairs —
        matches the exact Brandes accumulation (undirected scores are
        NOT halved, same convention as ``operators/betweenness.py``)."""
        joined = self.pairs.join(self.sigmax(), ["src", "dst"])
        row = (
            joined.where(
                (F.col("src") != self.x)
                & (F.col("dst") != self.x)
                & (F.col("src") != F.col("dst"))
            )
            .agg(F.sum(F.col("sigmax") / F.col("sigma")).alias("b"))
            .collect()[0]
        )
        return float(row["b"] or 0.0)


def betweenness_one_node_state(
    graph: EdgeGraph, x: int, max_rounds: int = 256
) -> BetweennessOneNodeState:
    """``DynBetweennessOneNode::run`` seeds the matrices with one
    Dijkstra per node; here ALL sources run level-synchronous σ-BFS
    together — frontier keyed by (src, node), σ(s,v) at level d summed
    over level-(d−1) in-neighbors, one edge join + groupBy per hop."""
    sym = graph.sym().select("src", "dst").persist()
    cur = (
        graph.vertices()
        .select(
            F.col("id").alias("s"),
            F.col("id").alias("node"),
            F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    out = cur
    for rnd in range(max_rounds):
        nxt = (
            sym.join(cur.withColumnRenamed("node", "src"), "src")
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(out.select("s", "node"), ["s", "node"], "left_anti")
            .withColumn("dist", F.lit(rnd + 1))
            .select("s", "node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        out = out.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt
    sym.unpersist()
    pairs = out.select(
        F.col("s").alias("src"), F.col("node").alias("dst"), "dist", "sigma"
    )
    return BetweennessOneNodeState(graph, x, pairs)


def incremental_betweenness_one_node(
    state: BetweennessOneNodeState, events: DataFrame
) -> BetweennessOneNodeState:
    """``DynBetweennessOneNode::update`` (insertions only, like the
    reference).  For ONE inserted edge {u, v} every new shortest path
    uses it exactly once (positive weights), so the post-state is a
    CLOSED FORM over the old state:

        d'(s,t) = min(d, d(s,u)+1+d(v,t), d(s,v)+1+d(u,t))
        σ'(s,t) = Σ over the branches attaining d' (old σ on both
                  sides of the new edge; branch families are disjoint
                  because they differ in the traversal direction)

    — one broadcast join pass per inserted edge, no fixpoint loop; a
    batch applies its edges sequentially (the reference's updateBatch
    loops update() the same way)."""
    from networkit_spark.streaming.events import apply_events

    if not _batch_is_incremental(events):
        raise ValueError("DynBetweennessOneNode supports insertions only")
    if _readds_existing_edge(state.graph, events):
        # re-adding an edge only bumps its weight; in the hop metric the
        # closed form would double-count σ through it — rebuild instead
        raise ValueError(
            "batch re-adds an existing edge; rebuild with "
            "betweenness_one_node_state"
        )
    new_graph = apply_events(state.graph, events)
    # keep the event's own orientation (directed graphs insert u→v;
    # undirected expansion happens via `ends` below)
    added = (
        events.where(F.col("kind") == EDGE_ADDITION)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .collect()
    )
    pairs = state.pairs
    directed = state.graph.directed
    inf = F.lit(float("inf"))
    for r in added:
        u, v = int(r["src"]), int(r["dst"])
        ends = [(u, v)] if directed else [(u, v), (v, u)]
        cand = None
        for a, b in ends:
            sa = pairs.where(F.col("dst") == a).select(
                "src", F.col("dist").alias("d_sa"), F.col("sigma").alias("s_sa")
            )
            bt = pairs.where(F.col("src") == b).select(
                F.col("dst"), F.col("dist").alias("d_bt"), F.col("sigma").alias("s_bt")
            )
            part = sa.crossJoin(bt).select(
                "src",
                "dst",
                (F.col("d_sa") + 1 + F.col("d_bt")).alias("cd"),
                (F.col("s_sa") * F.col("s_bt")).alias("cs"),
            )
            cand = part if cand is None else cand.unionByName(part)
        # combine the (up to two) branches per pair at their min: the
        # min distance first, then the σ mass of branches attaining it
        best = cand.groupBy("src", "dst").agg(F.min("cd").alias("mind"))
        cand = (
            cand.join(best, ["src", "dst"])
            .where(F.col("cd") == F.col("mind"))
            .groupBy("src", "dst")
            .agg(F.min("cd").alias("cd"), F.sum("cs").alias("cs"))
        )
        merged = pairs.join(cand, ["src", "dst"], "full_outer").select(
            "src",
            "dst",
            F.least(
                F.coalesce(F.col("dist").cast("double"), inf),
                F.coalesce(F.col("cd").cast("double"), inf),
            ).alias("nd"),
            (
                F.when(
                    F.coalesce(F.col("dist").cast("double"), inf)
                    == F.least(
                        F.coalesce(F.col("dist").cast("double"), inf),
                        F.coalesce(F.col("cd").cast("double"), inf),
                    ),
                    F.coalesce("sigma", F.lit(0.0)),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.coalesce(F.col("cd").cast("double"), inf)
                    == F.least(
                        F.coalesce(F.col("dist").cast("double"), inf),
                        F.coalesce(F.col("cd").cast("double"), inf),
                    ),
                    F.coalesce("cs", F.lit(0.0)),
                ).otherwise(F.lit(0.0))
            ).alias("nsigma"),
        )
        pairs = (
            merged.where(F.col("nd") != inf)
            .select(
                "src",
                "dst",
                F.col("nd").cast("int").alias("dist"),
                F.col("nsigma").alias("sigma"),
            )
            .localCheckpoint(eager=True)
        )
    return BetweennessOneNodeState(new_graph, state.x, pairs)


# ---------------------------------------------------------------------------
# DynApproxBetweenness
# ---------------------------------------------------------------------------


class ApproxBetweennessState:
    """Resumable ε-δ sampled betweenness
    (``cpp/centrality/DynApproxBetweenness.h:23-80``): the reference
    stores the sampled (s,t) pairs plus a DynSSSP tree per sample and
    patches affected samples after each batch.  Spark state: the pair
    list and TWO keyed σ-BFS tables — ``fw`` (s, node, dist, σ from s)
    and ``bw`` (t, node, dist, σ INTO t) — everything else (per-pair
    d_st, σ_st, per-node contributions) derives by joins, so updates
    only ever touch the two keyed tables."""

    def __init__(
        self,
        graph: EdgeGraph,
        pairs: list[tuple[int, int, int]],
        fw: DataFrame,
        bw: DataFrame,
    ):
        self.graph = graph
        self.pairs = pairs  # (pid, s, t)
        self.fw = fw
        self.bw = bw

    def scores(self) -> DataFrame:
        """(node, score) — normalized betweenness: mean over usable
        samples of the Rao–Blackwellized path probability
        σ_s(v)·σ_t(v)/σ_st (same estimator as
        ``operators/approx_centrality.approx_betweenness``)."""
        spark = self.graph.spark
        pdf = spark.createDataFrame(self.pairs, "pid long, s long, t long")
        st = pdf.join(
            self.fw.select(
                "s",
                F.col("node").alias("t"),
                F.col("dist").alias("d_st"),
                F.col("sigma").alias("sigma_st"),
            ),
            ["s", "t"],
        )
        used = st.count()
        contrib = (
            st.alias("p")
            .join(self.fw.alias("f"), F.col("p.s") == F.col("f.s"))
            .join(
                self.bw.alias("b"),
                (F.col("p.t") == F.col("b.t"))
                & (F.col("f.node") == F.col("b.node")),
            )
            .where(
                (F.col("f.dist") + F.col("b.dist") == F.col("p.d_st"))
                & (F.col("f.node") != F.col("p.s"))
                & (F.col("f.node") != F.col("p.t"))
            )
            .groupBy(F.col("f.node").alias("node"))
            .agg(F.sum(F.col("f.sigma") * F.col("b.sigma") / F.col("p.sigma_st")).alias("p"))
        )
        return self.graph.vertices().join(
            contrib, F.col("id") == F.col("node"), "left"
        ).select(
            F.col("id").alias("node"),
            (F.coalesce("p", F.lit(0.0)) / F.lit(max(used, 1))).alias("score"),
        )


def _keyed_sigma_bfs(sym: DataFrame, sources: list[int], key: str) -> DataFrame:
    """(key, node, dist, sigma) — all sources advance together."""
    spark = sym.sparkSession
    cur = spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in sorted(set(sources))],
        f"{key} long, node long, dist int, sigma double",
    ).localCheckpoint(eager=True)
    out, d = cur, 0
    while True:
        d += 1
        nxt = (
            sym.join(cur.withColumnRenamed("node", "src"), "src")
            .groupBy(key, F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(out.select(key, "node"), [key, "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .select(key, "node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return out
        out = out.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt


def approx_betweenness_state(
    graph: EdgeGraph,
    epsilon: float = 0.1,
    delta: float = 0.1,
    seed: int = 42,
    max_samples: int | None = None,
) -> ApproxBetweennessState:
    """``DynApproxBetweenness::run``: r = (c/ε²)(⌊log₂(VD−2)⌋+1−ln δ)
    sampled pairs (the reference's RK bound), two keyed σ-BFS sweeps."""
    import hashlib
    import math as _m

    from networkit_spark.graph import random_nodes
    from networkit_spark.operators.bfs import diameter_range

    n = max(graph.num_nodes(), 3)
    _, hi = diameter_range(graph)
    vd = max(hi + 1, 3)
    r = int(_m.ceil(0.5 / (epsilon * epsilon) * (_m.floor(_m.log2(vd - 2)) + 1 - _m.log(delta))))
    if max_samples is not None:
        r = min(r, max_samples)
    r = max(r, 1)
    base = random_nodes(graph, k=min(2 * r + 8, n), seed=seed)

    def _pick(tag: str, i: int) -> int:
        h = hashlib.md5(f"{seed}:dab:{tag}:{i}".encode()).hexdigest()
        return base[int(h, 16) % len(base)]

    pairs = []
    for i in range(r):
        s, t = _pick("s", i), _pick("t", i)
        if s != t:
            pairs.append((i, s, t))
    sym = graph.sym().select("src", "dst").persist()
    tsym = (
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if graph.directed
        else sym
    )
    fw = _keyed_sigma_bfs(sym, [s for _, s, _ in pairs], "s")
    bw = _keyed_sigma_bfs(tsym, [t for _, _, t in pairs], "t")
    sym.unpersist()
    return ApproxBetweennessState(graph, pairs, fw, bw)


def _closed_form_edge_update(
    keyed: DataFrame, key: str, thru: DataFrame
) -> DataFrame:
    """Apply d'(k,w) = min(d, d(k,a) + 1 + d_b(w)) with the matching σ
    rule to a keyed σ-table.  ``thru`` = (key, node, cd, cs) candidate
    routes through the new edge (possibly two orientations already
    unioned); combines ties then min-merges with the old table."""
    best = thru.groupBy(key, "node").agg(F.min("cd").alias("mind"))
    cand = (
        thru.join(best, [key, "node"])
        .where(F.col("cd") == F.col("mind"))
        .groupBy(key, "node")
        .agg(F.min("cd").alias("cd"), F.sum("cs").alias("cs"))
    )
    inf = F.lit(float("inf"))
    od = F.coalesce(F.col("dist").cast("double"), inf)
    cd = F.coalesce(F.col("cd").cast("double"), inf)
    nd = F.least(od, cd)
    merged = keyed.join(cand, [key, "node"], "full_outer").select(
        key,
        "node",
        nd.alias("nd"),
        (
            F.when(od == nd, F.coalesce("sigma", F.lit(0.0))).otherwise(F.lit(0.0))
            + F.when(cd == nd, F.coalesce("cs", F.lit(0.0))).otherwise(F.lit(0.0))
        ).alias("nsigma"),
    )
    return (
        merged.where(F.col("nd") != inf)
        .select(
            key,
            "node",
            F.col("nd").cast("int").alias("dist"),
            F.col("nsigma").alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )


def incremental_approx_betweenness(
    state: ApproxBetweennessState, events: DataFrame
) -> ApproxBetweennessState:
    """``DynApproxBetweenness::update`` (insertions only): instead of
    re-running DynSSSP per sample, ONE σ-BFS from each new-edge
    endpoint (old graph) feeds the closed form
    d'(s,w) = min(d(s,w), d(s,u) + 1 + d_v(w)) for ALL samples at once
    — the per-edge cost is 2 single-source sweeps + keyed joins,
    independent of the sample count r."""
    from networkit_spark.operators.approx_centrality import _sigma_bfs
    from networkit_spark.streaming.events import apply_events

    if not _batch_is_incremental(events):
        raise ValueError("DynApproxBetweenness supports insertions only")
    if _readds_existing_edge(state.graph, events):
        raise ValueError(
            "batch re-adds an existing edge; rebuild with approx_betweenness_state"
        )
    graph = state.graph
    fw, bw = state.fw, state.bw
    added = (
        events.where(F.col("kind") == EDGE_ADDITION)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .collect()
    )
    for r in added:
        u, v = int(r["src"]), int(r["dst"])
        sym = graph.sym().select("src", "dst").persist()
        tsym = (
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            if graph.directed
            else sym
        )
        ends = [(u, v)] if graph.directed else [(u, v), (v, u)]
        fw_thru = None
        bw_thru = None
        for a, b in ends:
            dvb = _sigma_bfs(sym, b)  # dist/σ FROM b (old graph)
            dra = _sigma_bfs(tsym, a)  # dist/σ INTO a (old graph)
            f_part = (
                fw.where(F.col("node") == a)
                .select("s", F.col("dist").alias("d_sa"), F.col("sigma").alias("s_sa"))
                .crossJoin(
                    dvb.select(
                        F.col("node"), F.col("dist").alias("d_bw"),
                        F.col("sigma").alias("s_bw"),
                    )
                )
                .select(
                    "s",
                    "node",
                    (F.col("d_sa") + 1 + F.col("d_bw")).alias("cd"),
                    (F.col("s_sa") * F.col("s_bw")).alias("cs"),
                )
            )
            fw_thru = f_part if fw_thru is None else fw_thru.unionByName(f_part)
            b_part = (
                bw.where(F.col("node") == b)
                .select("t", F.col("dist").alias("d_bt"), F.col("sigma").alias("s_bt"))
                .crossJoin(
                    dra.select(
                        F.col("node"), F.col("dist").alias("d_xa"),
                        F.col("sigma").alias("s_xa"),
                    )
                )
                .select(
                    "t",
                    "node",
                    (F.col("d_xa") + 1 + F.col("d_bt")).alias("cd"),
                    (F.col("s_xa") * F.col("s_bt")).alias("cs"),
                )
            )
            bw_thru = b_part if bw_thru is None else bw_thru.unionByName(b_part)
        fw = _closed_form_edge_update(fw, "s", fw_thru)
        bw = _closed_form_edge_update(bw, "t", bw_thru)
        sym.unpersist()
        one = graph.spark.createDataFrame(
            [(0, EDGE_ADDITION, u, v, 1.0)],
            "batch long, kind string, u long, v long, w double",
        )
        graph = apply_events(graph, one)
    return ApproxBetweennessState(graph, state.pairs, fw, bw)
