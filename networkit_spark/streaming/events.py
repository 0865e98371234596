"""Dynamic graphs: event batches and incremental recompute.

Reference model (``cpp/dynamics/GraphEvent.h:24-40``): an ordered stream
of ``{NODE_ADDITION, NODE_REMOVAL, NODE_RESTORATION, EDGE_ADDITION,
EDGE_REMOVAL, EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT, TIME_STEP}``
events with ``(u, v, w)`` payload; ``GraphUpdater``
(``cpp/dynamics/GraphUpdater.h:19``) applies a batch to a ``Graph``;
``Dyn*`` algorithms expose ``update(event)`` / ``updateBatch(events)``
and are tested for equivalence with static recompute
(``ConnectedComponentsGTest.cpp:257-328``).

Spark mapping (SURVEY.md §2.11): the stream is an append-only event
DataFrame partitioned by batch id.  Each batch = apply the edge deltas
with union/anti-join (``apply_events``), then RESUME supersteps from the
prior converged state (``incremental_components``) — the checkpointed
superstep design is exactly what makes incremental recompute cheap;
per-event stateful streaming (``flatMapGroupsWithState``) is not a fit
because every event needs whole-graph joins.

``streaming_hourly_counts`` covers the Structured Streaming surface
proper (readStream → watermark → windowed agg → writeStream) for the
append-only analytics the reference lacks but a Spark engine owes its
users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph, canonicalize

EDGE_ADDITION = "EDGE_ADDITION"
EDGE_REMOVAL = "EDGE_REMOVAL"
NODE_ADDITION = "NODE_ADDITION"
NODE_REMOVAL = "NODE_REMOVAL"
NODE_RESTORATION = "NODE_RESTORATION"
EDGE_WEIGHT_UPDATE = "EDGE_WEIGHT_UPDATE"
EDGE_WEIGHT_INCREMENT = "EDGE_WEIGHT_INCREMENT"

EVENT_SCHEMA = "batch long, kind string, u long, v long, w double"


def apply_events(graph: EdgeGraph, events: DataFrame) -> EdgeGraph:
    """``GraphUpdater::update`` — apply one batch of edge events.

    Events canonicalize to ``src <= dst`` like the edge table.  Semantics
    per the reference: ADDITION appends (parallel additions sum),
    REMOVAL deletes the edge, WEIGHT_UPDATE replaces w, WEIGHT_INCREMENT
    adds w.  NODE_REMOVAL drops the node's incident edges
    (``GraphUpdater.cpp`` removeNode); NODE_ADDITION/RESTORATION are
    no-ops on an edge-derived vertex set (a restored node reappears
    with its first new edge) — documented deviation from the
    reference's explicit node slots.  Within one batch, node removals
    apply AFTER edge events (batch = set semantics, not a sequential
    log; split removals into their own batch to order them)."""
    ev = events.select(
        "kind",
        F.least("u", "v").alias("src"),
        F.greatest("u", "v").alias("dst"),
        F.col("w").cast("double"),
    )
    adds = canonicalize(
        ev.where(F.col("kind") == EDGE_ADDITION).select("src", "dst", F.col("w").alias("weight"))
    )
    removes = ev.where(F.col("kind") == EDGE_REMOVAL).select("src", "dst").distinct()
    updates = ev.where(F.col("kind") == EDGE_WEIGHT_UPDATE).select(
        "src", "dst", F.col("w").alias("new_w")
    )
    incs = (
        ev.where(F.col("kind") == EDGE_WEIGHT_INCREMENT)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("inc_w"))
    )
    e = graph.edges
    e = e.join(removes, ["src", "dst"], "left_anti")
    e = (
        e.join(updates, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("new_w", "weight").alias("weight"))
    )
    e = (
        e.join(incs, ["src", "dst"], "left")
        .select("src", "dst", (F.col("weight") + F.coalesce("inc_w", F.lit(0.0))).alias("weight"))
    )
    e = canonicalize(e.unionByName(adds))
    gone = events.where(F.col("kind") == NODE_REMOVAL).select(
        F.col("u").alias("node")
    ).distinct()
    e = e.join(gone.withColumnRenamed("node", "src"), "src", "left_anti").join(
        gone.withColumnRenamed("node", "dst"), "dst", "left_anti"
    ).select("src", "dst", "weight")
    return EdgeGraph(e, graph.directed, graph.weighted)


def apply_event_stream(graph: EdgeGraph, events: DataFrame) -> EdgeGraph:
    """Fold a MULTI-batch GraphEvent stream: :func:`apply_events` batch by
    batch in ascending batch order (an edge removed in batch i and
    re-added in batch j > i survives — set semantics only hold WITHIN a
    batch).  Lineage is truncated per batch so long streams stay
    plannable."""
    batches = sorted(
        r["batch"] for r in events.select("batch").distinct().collect()
    )
    g = graph
    for b in batches:
        g = apply_events(g, events.where(F.col("batch") == b))
        g = EdgeGraph(
            g.edges.localCheckpoint(eager=True), g.directed, g.weighted
        )
    return g


def incremental_components(
    graph: EdgeGraph, prev_labels: DataFrame, events: DataFrame
) -> tuple[EdgeGraph, DataFrame]:
    """``DynConnectedComponents`` analog: apply the batch, then resume
    min-label propagation from the previous fixpoint instead of from
    singletons.

    - EDGE_ADDITION may merge components: seed labels = previous labels
      (new nodes start as singletons); propagation converges in
      O(#merged-diameter) supersteps instead of O(graph diameter).
    - EDGE_REMOVAL may split a component, which min-label propagation
      cannot detect incrementally (labels only decrease) — batches
      containing removals recompute the affected components from
      singletons (the reference's DynCC similarly falls back to a BFS on
      removal, ``DynConnectedComponents.cpp``).
    Returns (new_graph, new_labels); equivalence with static recompute is
    the test contract (``ConnectedComponentsGTest.cpp:257-328``).
    """
    from networkit_spark.operators.components import connected_components

    new_graph = apply_events(graph, events)
    has_removals = (
        events.where(F.col("kind").isin(EDGE_REMOVAL)).limit(1).count() > 0
    )
    if has_removals:
        # removals can split: recompute affected components from scratch
        # (correct and simple; an affected-component-only recompute is the
        # next optimization)
        return new_graph, connected_components(new_graph, impl="sql")

    verts = new_graph.vertices()
    seeded = verts.join(prev_labels, verts["id"] == prev_labels["node"], "left").select(
        F.col("id").alias("node"), F.coalesce("label", F.col("id")).alias("label")
    )
    # resume: min-label propagation with warm-start labels
    labels = _propagate_from(new_graph, seeded)
    return new_graph, labels


def incremental_weakly_components(
    graph: EdgeGraph, prev_labels: DataFrame, events: DataFrame
) -> tuple[EdgeGraph, DataFrame]:
    """``DynWeaklyConnectedComponents`` (``cpp/components/
    DynWeaklyConnectedComponents.h:23-48``): weakly-connected components
    of a DIRECTED graph kept current under edge events.  Weak
    connectivity ignores direction, so the update runs on the UNDIRECTED
    view (a directed graph's ``sym()`` keeps arc direction — label
    propagation there would only follow arcs).  The returned graph keeps
    the original directed arcs with the batch applied; only the label
    machinery is symmetrized."""
    und = graph.to_undirected() if graph.directed else graph
    _, labels = incremental_components(und, prev_labels, events)
    return apply_events(graph, events), labels


def _propagate_from(graph: EdgeGraph, seed: DataFrame) -> DataFrame:
    """Min-label propagation to fixpoint from arbitrary seed labels
    (labels only decrease ⇒ converges to per-component minimum)."""
    sym = graph.sym().persist()
    labels = seed.localCheckpoint(eager=True)
    frontier = labels
    while True:
        msgs = frontier.select(F.col("node").alias("src"), F.col("label").alias("value"))
        agg = (
            sym.join(msgs, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("value").alias("agg"))
        )
        joined = labels.join(agg, "node", "left").select(
            "node",
            "label",
            F.least("label", F.coalesce("agg", "label")).alias("label_new"),
        ).localCheckpoint(eager=True)
        frontier = joined.where(F.col("label_new") < F.col("label")).select(
            "node", F.col("label_new").alias("label")
        )
        labels = joined.select("node", F.col("label_new").alias("label"))
        if frontier.count() == 0:
            break
    sym.unpersist()
    return labels


def incremental_pagerank(
    graph: EdgeGraph,
    prev_ranks: DataFrame,
    events: DataFrame,
    damp: float = 0.85,
    tol: float = 1e-8,
) -> tuple[EdgeGraph, DataFrame]:
    """Dyn* PageRank: apply the event batch, then resume the power
    iteration warm-started from the previous converged ranks — after a
    small batch the fixpoint is nearby, so convergence takes a handful
    of supersteps instead of O(100) (the checkpointed-superstep design's
    incremental payoff; equivalence with cold recompute is the test
    contract, mirroring ``ConnectedComponentsGTest.cpp:257-328``)."""
    from networkit_spark.operators.pagerank import pagerank

    new_graph = apply_events(graph, events)
    ranks = pagerank(new_graph, damp=damp, tol=tol, impl="sql", init_ranks=prev_ranks)
    return new_graph, ranks


def incremental_katz(
    graph: EdgeGraph,
    prev_scores: DataFrame,
    events: DataFrame,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
) -> tuple[EdgeGraph, DataFrame]:
    """DynKatzCentrality: apply the event batch, then resume the Katz
    fixed-point iteration ``x ← αAx + β`` warm-started from the previous
    converged scores. The map is a contraction for α < 1/λ_max, so a
    nearby start (small event batch) converges in a handful of
    supersteps — the Spark-native analogue of the reference's
    incremental bound maintenance (``cpp/centrality/DynKatzCentrality.h:30``);
    equivalence with cold recompute is the test contract."""
    from networkit_spark.operators.spectral import katz_centrality

    new_graph = apply_events(graph, events)
    scores = katz_centrality(
        new_graph, alpha=alpha, beta=beta, tol=tol, init_scores=prev_scores
    )
    return new_graph, scores


def streaming_hourly_counts(spark, source_dir: str, checkpoint_dir: str):
    """Structured Streaming: readStream (parquet source) → 10-minute
    watermark → 1-hour tumbling window per event_type → memory sink.
    Late rows beyond the watermark are dropped from the aggregation —
    the Spark-native stream surface (the reference has no
    watermark/window concept)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).parquet(source_dir)
    )
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("hourly_counts")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def graph_difference(g1: EdgeGraph, g2: EdgeGraph) -> DataFrame:
    """``GraphDifference`` (``cpp/dynamics/GraphDifference.{h,cpp}``):
    the edit script of GraphEvents that transforms ``g1`` into ``g2``
    — EDGE_REMOVAL for edges only in g1, EDGE_ADDITION (carrying g2's
    weight) for edges only in g2; like the reference, weight-only
    differences are NOT detected and directed graphs are rejected.

    One full-outer join on the canonical (src, dst) key — each side is
    scanned once, the join shuffles on the edge key only.  The result
    feeds ``apply_events`` directly (batch 1); a roundtrip
    ``apply_events(g1, graph_difference(g1, g2)) ≡ g2`` is the test
    contract."""
    if g1.directed or g2.directed:
        raise ValueError("GraphDifference supports undirected graphs only")
    a = g1.edges.select("src", "dst", F.col("weight").alias("w1"))
    b = g2.edges.select("src", "dst", F.col("weight").alias("w2"))
    j = a.join(b, ["src", "dst"], "full_outer")
    removals = j.where(F.col("w2").isNull()).select(
        F.lit(1).alias("batch"),
        F.lit(EDGE_REMOVAL).alias("kind"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(1.0).alias("w"),
    )
    additions = j.where(F.col("w1").isNull()).select(
        F.lit(1).alias("batch"),
        F.lit(EDGE_ADDITION).alias("kind"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("w2").alias("w"),
    )
    return removals.unionByName(additions)
