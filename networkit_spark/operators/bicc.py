"""Biconnected components + articulation points (SURVEY §2.5.2 variant).

Reference: ``cpp/components/BiconnectedComponents.{h,cpp}`` — the
Hopcroft-Tarjan DFS-lowpoint algorithm, whose explicit edge stack is
inherently sequential.  This engine uses the fundamental-cycle
formulation that underlies Tarjan-Vishkin (SIAM J. Comput. 1985)
instead:

1. BFS spanning forest (one frontier superstep per level, every
   component in parallel; parent = min settled neighbor).
2. Every non-tree edge defines a fundamental cycle.  All cycles are
   walked **simultaneously**, one tree level per superstep: each
   pending cycle climbs its deeper endpoint to its parent, recording a
   (cycle-label, tree-edge-label) merge, until the two endpoints meet
   at the LCA.  Supersteps ≤ forest depth; per-superstep work is one
   join against the parent table.
3. Two edges are biconnected iff they are connected through shared
   fundamental cycles (the transitive closure of "lie on a common
   fundamental cycle" w.r.t. any spanning tree equals the
   biconnectivity relation — the fact Tarjan-Vishkin's auxiliary graph
   encodes).  Min-label propagation over the merge relation (a graph on
   EDGE labels, O(m) nodes) yields the component of every edge; tree
   edges merged with nothing are bridges (singleton components).

Outputs mirror the reference: ``componentsOfNode`` is the distinct
(node, component) cover over a node's incident edges, and a node is an
articulation point iff it belongs to more than one biconnected
component (the block-cut-tree characterization).

Scale notes: total cycle-walk work is Σ|fundamental cycle| ≤ m·(2·depth
+ 1); BFS-tree fundamental cycles are ≤ 2·diameter+1, so on small-world
graphs this is a small constant per edge.  Everything is joins +
aggregations on (node)- or (edge)-keyed tables; no driver-side graph.
Self-loops are ignored, as in the reference's DFS (a loop can never
enter the edge stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph, assign_dense_ids, truncate_lineage
from networkit_spark.operators.components import connected_components


def bfs_forest(graph: EdgeGraph) -> DataFrame:
    """``(node, dist, parent)`` — BFS forest rooted at each component's
    min-id node (parent NULL at roots); all components expand in the
    same frontier supersteps."""
    sym = (
        graph.sym()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .persist()
    )
    comp = connected_components(graph)
    settled = (
        comp.where(F.col("node") == F.col("label"))
        .select(
            "node",
            F.lit(0).cast("long").alias("dist"),
            F.lit(None).cast("long").alias("parent"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = settled.select("node")
    d = 0
    while True:
        d += 1
        cand = (
            sym.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(
                settled.select(F.col("node").alias("dst")), "dst", "left_anti"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("parent"))
            .select("node", F.lit(d).cast("long").alias("dist"), "parent")
            .localCheckpoint(eager=True)
        )
        if cand.isEmpty():
            break
        settled = truncate_lineage(settled.unionByName(cand), d)
        frontier = cand.select("node")
    sym.unpersist()
    return settled


def _ekey(a, b):
    """Canonical comparable label for the undirected edge {a, b}."""
    return F.struct(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))


def biconnected_edge_components(graph: EdgeGraph) -> DataFrame:
    """``(a, b, comp)`` — one row per non-loop undirected edge (a < b),
    ``comp`` a dense 0-based biconnected-component id.  Bridges are the
    edges alone in their component."""
    spark = graph.spark
    forest = bfs_forest(graph).persist()
    tree = forest.where(F.col("parent").isNotNull()).select(
        F.least("parent", "node").alias("a"),
        F.greatest("parent", "node").alias("b"),
    )
    all_edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    nontree = all_edges.join(tree, ["a", "b"], "left_anti")

    pstate = forest.select(
        "node", F.col("dist").alias("pd"), F.col("parent").alias("pp")
    ).persist()

    # pending fundamental-cycle walks: (x, y, lbl) — climb the deeper
    # endpoint one tree level per superstep, merging the traversed tree
    # edge's label into the cycle's label.
    pend = nontree.select(
        F.col("a").alias("x"), F.col("b").alias("y"), _ekey("a", "b").alias("lbl")
    ).localCheckpoint(eager=True)
    merge_parts: list[DataFrame] = []
    it = 0
    while not pend.isEmpty():
        it += 1
        st = (
            pend.join(
                pstate.select(
                    F.col("node").alias("x"),
                    F.col("pd").alias("dx"),
                    F.col("pp").alias("px"),
                ),
                "x",
            )
            .join(
                pstate.select(
                    F.col("node").alias("y"),
                    F.col("pd").alias("dy"),
                    F.col("pp").alias("py"),
                ),
                "y",
            )
            .withColumn("climb_x", F.col("dx") >= F.col("dy"))
            .withColumn("climb_y", F.col("dy") >= F.col("dx"))
            .localCheckpoint(eager=True)
        )
        m = st.where("climb_x").select(
            F.col("lbl").alias("la"), _ekey("px", "x").alias("lb")
        ).unionByName(
            st.where("climb_y").select(
                F.col("lbl").alias("la"), _ekey("py", "y").alias("lb")
            )
        )
        merge_parts.append(m.localCheckpoint(eager=True))
        pend = (
            st.select(
                F.when(F.col("climb_x"), F.col("px")).otherwise(F.col("x")).alias("x"),
                F.when(F.col("climb_y"), F.col("py")).otherwise(F.col("y")).alias("y"),
                "lbl",
            )
            .where(F.col("x") != F.col("y"))
            .localCheckpoint(eager=True)
        )

    # min-label closure over the merge relation (nodes = edge labels)
    keys = all_edges.select(_ekey("a", "b").alias("key"))
    lbl = keys.select("key", F.col("key").alias("comp")).localCheckpoint(eager=True)
    if merge_parts:
        merges = merge_parts[0]
        for p in merge_parts[1:]:
            merges = merges.unionByName(p)
        msym = (
            merges.select(F.col("la").alias("u"), F.col("lb").alias("v"))
            .unionByName(merges.select(F.col("lb").alias("u"), F.col("la").alias("v")))
            .distinct()
            .persist()
        )
        it = 0
        while True:
            it += 1
            nbr = (
                msym.join(lbl.withColumnRenamed("key", "u"), "u")
                .groupBy(F.col("v").alias("key"))
                .agg(F.min("comp").alias("ncomp"))
            )
            new_lbl = truncate_lineage(
                lbl.join(nbr, "key", "left").select(
                    "key",
                    F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias(
                        "comp"
                    ),
                    (
                        F.coalesce("ncomp", F.col("comp")) < F.col("comp")
                    ).alias("chg"),
                ),
                it,
            )
            changed = new_lbl.where("chg").limit(1).count()
            lbl = new_lbl.select("key", "comp")
            if changed == 0:
                break
        msym.unpersist()

    comp_ids = assign_dense_ids(lbl.select("comp").distinct(), key_col="comp")
    out = (
        lbl.join(comp_ids, "comp")
        .select(F.col("key.a").alias("a"), F.col("key.b").alias("b"), F.col("id").alias("comp"))
    )
    out = out.localCheckpoint(eager=True)
    forest.unpersist()
    all_edges.unpersist()
    pstate.unpersist()
    return out


def biconnected_components(graph: EdgeGraph) -> DataFrame:
    """``componentsOfNode`` (``BiconnectedComponents.cpp:116-126``):
    the distinct ``(node, comp)`` cover — a node belongs to every
    biconnected component an incident edge belongs to."""
    ec = biconnected_edge_components(graph)
    return (
        ec.select(F.col("a").alias("node"), "comp")
        .unionByName(ec.select(F.col("b").alias("node"), "comp"))
        .distinct()
    )


def component_count_per_node(graph: EdgeGraph) -> DataFrame:
    """``(node, n_bicomps)`` — how many biconnected components contain
    the node; articulation points are exactly the nodes with > 1
    (block-cut-tree fact, and the gate's oracle: the neighbors of v
    fall into n_bicomps(v) distinct connected components of G − v)."""
    return (
        biconnected_components(graph)
        .groupBy("node")
        .agg(F.countDistinct("comp").alias("n_bicomps"))
    )


def articulation_points(graph: EdgeGraph) -> DataFrame:
    """``(node,)`` — nodes belonging to more than one biconnected
    component."""
    return (
        component_count_per_node(graph)
        .where(F.col("n_bicomps") > 1)
        .select("node")
    )
