"""Spanning forests, independent sets, matchings — superstep combinatorics.

- ``minimum_spanning_forest``: Borůvka rounds (``KruskalMSF``'s output,
  ``cpp/graph/KruskalMSF.h:21``, computed the distributed way): each
  component picks its minimum outgoing edge (deterministic (weight, src,
  dst) tie-break), components merge, repeat — O(log n) rounds.
  ``RandomMaximumSpanningForest`` = the same on negated weights.
- ``luby_mis``: Luby's maximal independent set
  (``cpp/independentset/Luby.h:21``): per-round hash priorities; a node
  enters the MIS when its priority beats every active neighbor; winners
  and their neighbors deactivate.
- ``parallel_matching``: handshake maximal matching (the parallel
  counterpart of ``PathGrowingMatcher``, ``cpp/matching/Matching.h:19``):
  an edge matches when it is the minimum-priority incident edge of BOTH
  endpoints; matched endpoints retire; repeat.

All randomness is ``xxhash64(seed, round, …)`` — deterministic at any
parallelism.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.components import connected_components

# ``_aldous_broder_walk`` crosses the driver→executor boundary via
# applyInPandas; ship the module by value so executors don't need the
# package on PYTHONPATH (same idiom as ``linkgraph/superstep.py``).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def _boruvka_forest(
    graph: EdgeGraph, priority: str, annotate=None, max_rounds: int = 40
) -> DataFrame:
    """Shared Borůvka loop: per round, every component picks its
    ``min_by(struct(src, dst, weight), <priority>)`` outgoing edge,
    picked edges join the forest, components merge via CC over the
    forest.  ``annotate`` may add columns the priority references."""
    spark = graph.spark
    e = graph.edges.where(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    labels = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    forest = spark.createDataFrame([], "src long, dst long, weight double")

    for _ in range(max_rounds):
        ann = (
            e.join(labels.withColumnRenamed("node", "src").withColumnRenamed("label", "sl"), "src")
            .join(labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "dl"), "dst")
            .where(F.col("sl") != F.col("dl"))
        )
        if ann.limit(1).count() == 0:
            break
        both = ann.select(F.col("sl").alias("comp"), "src", "dst", "weight").unionByName(
            ann.select(F.col("dl").alias("comp"), "src", "dst", "weight")
        )
        if annotate is not None:
            both = annotate(both)
        picked = (
            both.groupBy("comp")
            .agg(F.expr(f"min_by(struct(src, dst, weight), {priority})").alias("e"))
            .select("e.src", "e.dst", "e.weight")
            .distinct()
        )
        forest = forest.unionByName(picked).localCheckpoint(eager=True)
        fgraph = EdgeGraph(forest, directed=False, weighted=True)
        # merged component labels = CC over the forest + isolated nodes
        cc = connected_components(fgraph, impl="sql")
        labels = (
            labels.select("node")
            .join(cc, "node", "left")
            .select("node", F.coalesce("label", F.col("node")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return forest


def minimum_spanning_forest(graph: EdgeGraph, max_rounds: int = 40) -> DataFrame:
    """(src, dst, weight) — MSF edges (Borůvka), deterministic
    (weight, src, dst) tie-break."""
    return _boruvka_forest(graph, "struct(weight, src, dst)", max_rounds=max_rounds)


def luby_mis(graph: EdgeGraph, seed: int = 42, max_rounds: int = 64) -> DataFrame:
    """(node) — a maximal independent set."""
    spark = graph.spark
    sym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    sym = sym.localCheckpoint(eager=True)
    active = graph.vertices().select(F.col("id").alias("node")).localCheckpoint(eager=True)
    mis = spark.createDataFrame([], "node long")

    for rnd in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        pri = active.select(
            "node", F.abs(F.xxhash64(F.lit(seed), F.lit(rnd), "node")).alias("p")
        )
        edges_a = (
            sym.join(pri.withColumnRenamed("node", "src").withColumnRenamed("p", "sp"), "src")
            .join(pri.withColumnRenamed("node", "dst").withColumnRenamed("p", "dp"), "dst")
        )
        # min neighbor priority per node (nodes with no active neighbor win)
        nbr_min = edges_a.select(F.col("src").alias("node"), F.col("dp").alias("np")).groupBy(
            "node"
        ).agg(F.min("np").alias("np"))
        winners = (
            pri.join(nbr_min, "node", "left")
            .where(F.col("p") < F.coalesce("np", F.lit(float("inf"))))
            .select("node")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(winners).localCheckpoint(eager=True)
        # retire winners + their neighbors
        nbrs = (
            sym.join(winners.withColumnRenamed("node", "src"), "src", "leftsemi")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        active = (
            active.join(winners, "node", "left_anti")
            .join(nbrs, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
    return mis


def parallel_matching(graph: EdgeGraph, seed: int = 42, max_rounds: int = 64) -> DataFrame:
    """(src, dst) — a maximal matching (handshake rounds)."""
    spark = graph.spark
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    matched = spark.createDataFrame([], "src long, dst long")

    for rnd in range(max_rounds):
        if e.limit(1).count() == 0:
            break
        pri = e.select(
            "src", "dst", F.abs(F.xxhash64(F.lit(seed), F.lit(rnd), "src", "dst")).alias("p")
        )
        ends = pri.select(F.col("src").alias("node"), "src", "dst", "p").unionByName(
            pri.select(F.col("dst").alias("node"), "src", "dst", "p")
        )
        best = ends.groupBy("node").agg(
            F.expr("min_by(struct(src, dst), struct(p, src, dst))").alias("e")
        ).select("node", "e.src", "e.dst")
        # an edge wins when it is the best edge of BOTH endpoints
        wins = best.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c")).where("c = 2")
        wins = wins.select("src", "dst").localCheckpoint(eager=True)
        if wins.count() == 0:
            break
        matched = matched.unionByName(wins).localCheckpoint(eager=True)
        used = wins.select(F.col("src").alias("node")).unionByName(
            wins.select(F.col("dst").alias("node"))
        ).distinct()
        e = (
            e.join(used.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(used.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    return matched


def random_maximum_spanning_forest(graph: EdgeGraph, seed: int = 42) -> DataFrame:
    """(src, dst, weight) — ONE maximum-weight spanning forest with the
    tie among equal weights broken by a seeded hash
    (``cpp/graph/RandomMaximumSpanningForest.h``: the reference shuffles
    equal-weight edges with its global RNG; the hash realizes the same
    "uniformly chosen among all maximum forests" contract
    deterministically).  Borůvka with priority (−weight, hash)."""
    return _boruvka_forest(
        graph,
        "struct(-weight, h, src, dst)",
        annotate=lambda b: b.withColumn(
            "h", F.abs(F.xxhash64(F.lit(seed), "src", "dst"))
        ),
    )


def union_maximum_spanning_forest(graph: EdgeGraph, max_levels: int = 10_000) -> DataFrame:
    """(src, dst, weight) — the UNION of all maximum-weight spanning
    forests (``cpp/graph/UnionMaximumSpanningForest.cpp:15-90``): Kruskal
    descending over weight LEVELS, merging components only after a whole
    level — so an edge belongs iff its endpoints are disconnected in the
    subgraph of strictly heavier edges.

    Distributed shape: one pass per DISTINCT weight level — the level's
    edges are contracted through the running component labels, accepted
    if the endpoints' components differ, then all level edges (accepted
    or not) merge components via a CC on the contracted level graph
    (small: one node per touched component).  Collects only the distinct
    weight values; with continuous (all-distinct) weights every spanning
    forest is unique — use :func:`random_maximum_spanning_forest` there,
    this operator is for score-graded graphs (sparsification scores,
    similarity levels) where level counts are small."""
    spark = graph.spark
    e = graph.edges.where(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    n_levels = e.select("weight").distinct().count()
    if n_levels > max_levels:
        # silently truncating would DROP forest edges from every lighter
        # level — wrong output, not a coarser one.  Fail loudly.
        raise ValueError(
            f"union_maximum_spanning_forest: {n_levels} distinct weight levels "
            f"exceed max_levels={max_levels}; quantize the weights (e.g. "
            f"F.round) or use random_maximum_spanning_forest for continuous scores"
        )
    levels = [
        r["weight"]
        for r in e.select("weight").distinct().orderBy(F.desc("weight")).collect()
    ]
    labels = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    out = spark.createDataFrame([], "src long, dst long, weight double")
    for w in levels:
        lvl = e.where(F.col("weight") == w)
        ann = (
            lvl.join(labels.withColumnRenamed("node", "src").withColumnRenamed("label", "sl"), "src")
            .join(labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "dl"), "dst")
        )
        accepted = ann.where(F.col("sl") != F.col("dl")).select("src", "dst", "weight")
        out = out.unionByName(accepted).localCheckpoint(eager=True)
        # merge ALL level edges (contracted): components after this level
        # = CC of everything with weight >= w
        contracted = ann.select(F.col("sl").alias("src"), F.col("dl").alias("dst")).where(
            F.col("src") != F.col("dst")
        ).withColumn("weight", F.lit(1.0))
        if contracted.limit(1).count() == 0:
            continue
        cc = connected_components(EdgeGraph(contracted, False, False), impl="sql")
        relabel = cc.select(F.col("node").alias("label"), F.col("label").alias("new_label"))
        labels = (
            labels.join(relabel, "label", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return out


def _aldous_broder_walk(pdf) -> "pd.DataFrame":
    """Aldous-Broder on ONE component's edge list (RandomSpanningForest
    .cpp:21-53): random walk from a random root; first-entry edges form
    a UNIFORM spanning tree.  Runs inside applyInPandas — plain dicts,
    numpy RNG seeded by the component id."""
    import numpy as np
    import pandas as pd

    comp = int(pdf["comp"].iloc[0])
    seed = int(pdf["seed"].iloc[0])
    adj: dict[int, list[int]] = {}
    for a, b in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    if not adj:
        return pd.DataFrame({"src": [], "dst": []}).astype("int64")
    rng = np.random.default_rng((seed * 1_000_003 + comp) & 0x7FFFFFFF)
    nodes = sorted(adj)
    curr = int(nodes[rng.integers(len(nodes))])
    visited = {curr}
    out_src, out_dst = [], []
    while len(visited) < len(nodes):
        nbrs = adj[curr]
        nxt = int(nbrs[rng.integers(len(nbrs))])
        if nxt not in visited:
            out_src.append(curr)
            out_dst.append(nxt)
            visited.add(nxt)
        curr = nxt
    return pd.DataFrame({"src": out_src, "dst": out_dst}).astype("int64")


def random_spanning_forest(
    graph: EdgeGraph,
    seed: int = 42,
    max_component: int = 100_000,
) -> DataFrame:
    """(src, dst) — ``RandomSpanningForest`` (``cpp/components/
    RandomSpanningForest.cpp:21-53``): a uniformly random spanning tree
    per connected component, via Aldous-Broder first-entry random walks.

    Spark shape: the walk is inherently sequential but LOCAL to one
    component, so each component's edge list is gathered into one
    ``applyInPandas`` group — parallel ACROSS components (the same
    per-group pattern as GCE / MaximalCliques).  Components larger than
    ``max_component`` nodes would make one unbounded task (and a walk
    whose expected length is the cover time, O(n·m) worst case), so they
    take a hash-random-weight Borůvka forest instead — still a random
    spanning tree, but NOT exactly uniform over spanning trees (the
    random-MST distribution differs); the cap and the deviation are the
    documented trade, matching the cap philosophy of ``max_ego_degree``.
    """
    labels = connected_components(graph, impl="sql").localCheckpoint(eager=True)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .join(labels.withColumnRenamed("node", "src"), "src")
        .join(F.broadcast(sizes), "label")
    )
    small = (
        e.where(F.col("sz") <= max_component)
        .select(
            F.col("label").alias("comp"), "src", "dst", F.lit(int(seed)).alias("seed")
        )
        .groupBy("comp")
        .applyInPandas(_aldous_broder_walk, "src long, dst long")
    )
    big_edges = e.where(F.col("sz") > max_component)
    if big_edges.limit(1).count() == 0:
        return small
    big_graph = EdgeGraph(
        big_edges.select(
            "src",
            "dst",
            (
                F.xxhash64(F.lit(seed), "src", "dst").cast("double")
                / F.lit(float(1 << 63))
            ).alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    big = minimum_spanning_forest(big_graph).select("src", "dst")
    return small.unionByName(big)
