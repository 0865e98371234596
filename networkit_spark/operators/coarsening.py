"""Graph coarsening / contraction — the group-by of graphs.

``ParallelPartitionCoarsening(G, zeta)`` (``cpp/coarsening/
ParallelPartitionCoarsening.h:20-36``): one coarse node per label,
parallel-edge weights summed, intra-block edges become coarse
self-loops; also returns the fine→coarse node mapping.  Used by
``ParallelConnectedComponents``'s 8-iteration escape hatch and PLM's
multilevel recursion.

Spark: ``edges ⨝ labels(src) ⨝ labels(dst) → groupBy(srcLabel, dstLabel)
.agg(sum(weight))`` — pure DataFrame; Catalyst broadcasts the label
table when small, and the aggregation is map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph, truncate_lineage


def coarsen_by_partition(graph: EdgeGraph, labels: DataFrame) -> tuple[EdgeGraph, DataFrame]:
    """labels: (node, label).  Returns (coarse EdgeGraph, node_mapping).

    Coarse node ids are the labels themselves (already canonical when
    produced by our CC/PLP); ``Partition::compact``-style densification
    (dense_rank over labels) is available via ``graph.densify_ids``.
    """
    lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    coarse = (
        graph.edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .select(
            F.least("src_label", "dst_label").alias("src"),
            F.greatest("src_label", "dst_label").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return EdgeGraph(coarse, graph.directed, graph.weighted), labels


def coarsen_by_matching(
    graph: EdgeGraph, matching: DataFrame, no_self_loops: bool = True
) -> tuple[EdgeGraph, DataFrame]:
    """MatchingCoarsening (``cpp/coarsening/MatchingCoarsening.cpp:16-56``):
    contract each matched pair into one coarse node; unmatched nodes
    carry over.  ``matching``: (src, dst) pairs (e.g. from
    ``forest.parallel_matching``).

    The coarse id of a pair is the SMALLER endpoint's id (the reference
    assigns the carried-over vertex's slot: ``v < mate`` keeps v); dense
    0..cn-1 ids, when needed, come from ``graph.densify_ids`` — same
    convention as ``coarsen_by_partition``.  ``no_self_loops`` drops
    the contracted edges themselves (the reference's noSelfLoops)."""
    m = matching.select(
        F.least("src", "dst").alias("rep"), F.greatest("src", "dst").alias("other")
    )
    labels = (
        graph.vertices()
        .select(F.col("id").alias("node"))
        .join(m.select(F.col("other").alias("node"), "rep"), "node", "left")
        .select("node", F.coalesce("rep", F.col("node")).alias("label"))
    )
    coarse, mapping = coarsen_by_partition(graph, labels)
    if no_self_loops:
        coarse = EdgeGraph(
            coarse.edges.where(F.col("src") != F.col("dst")),
            coarse.directed,
            coarse.weighted,
        )
    return coarse, mapping


def parallel_agglomerative(
    graph: EdgeGraph,
    seed: int = 42,
    min_communities: int = 2,
    rel_repeat_threshold: float = 5e-3,
    max_levels: int = 32,
):
    """ParallelAgglomerativeClusterer (``cpp/community/
    ParallelAgglomerativeClusterer.cpp:18-84``): repeatedly (1) score
    every edge of the current coarse graph with the modularity gain of
    contracting it, Δmod(u,v) = ω(u,v)/ω(E) − wdeg(u)·wdeg(v)/(2ω(E))²
    (``cpp/scoring/ModularityScoring.h:46-57,84-92``), (2) match
    (handshake rounds — the reference's PathGrowingMatcher role — with
    the SCORE as the priority, hash tie-break, only positive-gain edges
    eligible), (3) contract via ``coarsen_by_matching``; stop when the
    shrinkage falls under ``rel_repeat_threshold`` or fewer than
    ``min_communities`` coarse nodes remain (``:55-61``).  The coarsest
    vertices are the clusters, projected back through the mapping
    hierarchy (``ClusteringProjector``, ``:73-80``).

    Documented deviation: the reference runs a MAXIMAL matching per
    level (LocalMaxMatcher); we run ONE mutual-best handshake round per
    level.  Missed pairs are re-scored and re-offered at the next level
    (gains are recomputed after every contraction anyway), so the
    greedy trajectory is equivalent in the limit — and each level costs
    a constant number of Spark jobs instead of O(rounds), which is what
    an iterative coarsening loop needs on a 1000-executor cluster.
    ``max_levels`` bounds the driver loop: on hub-dominated graphs a
    matching can only contract O(1) pairs per level (a star's maximal
    matching is ONE edge — the reference has the same asymptotics,
    ``:51`` TODO), so without a cap the level count is data-dependent
    and unbounded.  Levels the cap forgoes only mean a finer-grained
    (less agglomerated) partition, never a wrong one.

    Returns ``(node, label)`` over the ORIGINAL vertex set."""
    assignment = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    )
    g = graph
    n = g.num_nodes()
    # contraction below keeps self-loops, so total edge weight — and
    # with it the modularity volume 2m = 2·tw — is level-invariant:
    # compute it once
    tw = g.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    if tw <= 0:
        return assignment
    for lvl_no in range(max_levels):
        if n < min_communities:
            break
        # wdeg counts self-loops twice (Graph::weightedDegree) — the
        # volume term must see the contracted communities' internal
        # weight, so coarsening below KEEPS self-loops
        wdeg = g.degrees().select("node", "wdeg")
        scored = (
            g.edges.where(F.col("src") != F.col("dst"))
            .join(wdeg.select(F.col("node").alias("src"), F.col("wdeg").alias("wu")), "src")
            .join(wdeg.select(F.col("node").alias("dst"), F.col("wdeg").alias("wv")), "dst")
            .select(
                "src", "dst",
                (
                    F.col("weight") / tw
                    - F.col("wu") * F.col("wv") / (4.0 * tw * tw)
                ).alias("weight"),
            )
            .where(F.col("weight") > 0)
        )
        # one mutual-best handshake round, score-guided: every node
        # nominates its highest-score incident edge; edges nominated by
        # BOTH endpoints are matched.  The globally best edge is always
        # mutual, so wins == 0  ⟺  no positive-gain edge remains.
        pri = scored.select(
            "src", "dst",
            F.struct(
                (-F.col("weight")).alias("nw"),
                F.abs(F.xxhash64(F.lit(seed), F.lit(lvl_no), "src", "dst")).alias("h"),
            ).alias("p"),
        )
        ends = pri.select(F.col("src").alias("node"), "src", "dst", "p").unionByName(
            pri.select(F.col("dst").alias("node"), "src", "dst", "p")
        )
        best = ends.groupBy("node").agg(
            F.expr("min_by(struct(src, dst), struct(p, src, dst))").alias("e")
        ).select("node", "e.src", "e.dst")
        wins = (
            best.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c")).where("c = 2")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_wins = wins.count()
        if n_wins == 0:
            break
        coarse, mapping = coarsen_by_matching(g, wins, no_self_loops=False)
        # each win contracts exactly two distinct nodes into one
        cn = n - n_wins
        # mapping: (node, label) of THIS level — compose into the running
        # original-node assignment (ClusteringProjector role)
        lvl = mapping.select(F.col("node").alias("label"), F.col("label").alias("new_label"))
        assignment = assignment.join(lvl, "label", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        # compose lazily; materialize the running projection only every
        # 4 levels (each level adds one small equi-join to the plan)
        if (lvl_no + 1) % 4 == 0:
            assignment = truncate_lineage(assignment, lvl_no + 1, every=4)
        if cn < min_communities or (n - cn) / max(n, 1) <= rel_repeat_threshold:
            break
        g = EdgeGraph(
            truncate_lineage(coarse.edges, lvl_no + 1, every=8),
            coarse.directed,
            coarse.weighted,
        )
        n = cn
    return assignment
