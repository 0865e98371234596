"""Triangle counting — degree-ordered wedge joins.

Reference algorithm (``cpp/edgescores/TriangleEdgeScore.cpp:18-110``):
orient each undirected edge by degree with node-id tie-break
(``isOutEdge(u,v) = deg(u)>deg(v) || (deg(u)==deg(v) && u<v)``, ``:24-26``),
build a CSR over the oriented graph (``:31-47``; the fork's
``LowToHighDirectedGraph.h:14-42`` is the same structure low→high), and
intersect adjacencies so every triangle is found exactly once per corner
(``:61-94``).  Orientation bounds every oriented out-degree by O(√m),
which is what makes the join tractable on power-law graphs — the hub
skew defuser for this kernel.

Spark shape (the canonical wedge join, SURVEY.md §2.5.4): orient
low→high by ``(deg, id)`` (counts are invariant to the direction — F3
asserts this), then

  ``wedges  = D(u→v) ⋈ D(u→w) on src, v < w``   (pairs of out-neighbors)
  ``closed  = wedges ⋈ D on (v, w)``            (the closing edge)

Both joins are equi-joins: because orientation is a total order, the
closing edge of wedge (v, w) with key(v) < key(w) can only be stored as
v→w.  Catalyst picks sort-merge with the oriented table sorted once;
per-edge/per-node/global counts derive by exploding triangle corners.

Self-loops are excluded (the reference's LCC forbids them,
``cpp/centrality/LocalClusteringCoefficient.cpp:8``); counts are exact
integers (north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _oriented(graph: EdgeGraph) -> DataFrame:
    """Edges oriented by (deg, id) ascending: src strictly precedes dst.

    The reference keeps high→low with the inverse tie-break
    (``TriangleEdgeScore.cpp:24-26``); counts are orientation-invariant,
    and low→high matches the fork's ``LowToHighDirectedGraph``.
    Output columns: src, dst (both carrying their order keys pre-joined).
    """
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    if graph.directed:
        # directed graphs: triangle counting operates on the undirected view
        e = (
            e.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
            .distinct()
        )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ann = (
        e.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return ann.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_list(graph: EdgeGraph) -> DataFrame:
    """All triangles, one row each: (a, b, c) in oriented-key order."""
    d = _oriented(graph).persist()
    e1 = d.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = d.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    # NB: v < w by node id is NOT the oriented order when degrees differ —
    # the closing edge may be stored v→w or w→v. Join on the canonical
    # unordered pair instead (still a two-column equi-join).
    closing = d.select(
        F.least("src", "dst").alias("v"), F.greatest("src", "dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    return tri.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c"))


def triangle_counts(graph: EdgeGraph) -> DataFrame:
    """Per-edge triangle participation: (src, dst, triangles) on canonical
    ``src < dst`` id order — ``TriangleEdgeScore`` per-edge scores
    (``TriangleEdgeScore.cpp:97-102``). Edges in no triangle score 0."""
    tri = triangle_list(graph)
    corners = (
        tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(tri.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .unionByName(tri.select(F.col("b").alias("x"), F.col("c").alias("y")))
    )
    per_edge = corners.select(
        F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
    ).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("triangles"))
    base = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return base.join(per_edge, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def node_triangle_counts(graph: EdgeGraph) -> DataFrame:
    """Per-node triangle count (node, triangles); nodes in no triangle → 0."""
    tri = triangle_list(graph)
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    cnt = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices()
        .join(cnt, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def total_triangles(graph: EdgeGraph) -> int:
    """Global triangle count (Σ per-edge scores / 3, exactly)."""
    return triangle_list(graph).count()


def local_clustering_coefficient(graph: EdgeGraph) -> DataFrame:
    """LCC: ``c(u) = 2·tri(u)/(deg(u)·(deg(u)−1))``, 0 for deg<2
    (``cpp/centrality/LocalClusteringCoefficient.cpp:50-82``; turbo mode
    is the same degree-ordered CSR trick we always use).  Degree excludes
    self-loops, as the reference forbids them (``:8``)."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    nt = node_triangle_counts(graph)
    return nt.join(deg, "node", "left").select(
        "node",
        F.when(
            F.coalesce("deg", F.lit(0)) >= 2,
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def global_clustering_coefficient(graph: EdgeGraph) -> float:
    """``ClusteringCoefficient::exactGlobal`` (cpp/global/
    ClusteringCoefficient.cpp:168-218): 3·triangles / wedges where
    wedges = Σ deg(deg-1)/2."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2)).collect()[0][0] or 0
    if wedges == 0:
        return 0.0
    return 3.0 * total_triangles(graph) / float(wedges)


# ---------------------------------------------------------------------------
# wedge-sampling approximations (cpp/global/ClusteringCoefficient.cpp)
# ---------------------------------------------------------------------------


def _simple_sym(graph: EdgeGraph):
    """Loop-free simple undirected view + its degree table."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return e, sym, deg


def _closed_wedge_fraction(graph: EdgeGraph, centers, trials: int, seed: int) -> float:
    """Shared wedge-closure test: ``centers`` = (trial, node, deg) sampled
    centers with deg ≥ 2; picks two DISTINCT uniform neighbors per trial
    (the reference's resample-until-different loop collapses to one draw
    over deg−1 with an index shift, ``ClusteringCoefficient.cpp:146-156``)
    and returns the fraction whose closing edge exists."""
    from pyspark.sql import Window

    e, sym, _ = _simple_sym(graph)
    j1 = F.pmod(F.xxhash64(F.lit(seed + 1), F.col("trial")), F.col("deg"))
    j2r = F.pmod(F.xxhash64(F.lit(seed + 2), F.col("trial")), F.col("deg") - 1)
    picks = centers.select(
        "trial",
        "node",
        j1.alias("j1"),
        (j2r + (j2r >= j1).cast("long")).alias("j2"),
    )
    # indexed adjacency: neighbor position within each node's sorted list
    nw = Window.partitionBy("src").orderBy("dst")
    adj = sym.withColumn("pos", F.row_number().over(nw) - 1)
    u = picks.join(
        adj.select(F.col("src").alias("node"), F.col("pos").alias("j1"), F.col("dst").alias("u")),
        ["node", "j1"],
    )
    uw = u.join(
        adj.select(F.col("src").alias("node"), F.col("pos").alias("j2"), F.col("dst").alias("w")),
        ["node", "j2"],
    )
    pair = uw.select(F.least("u", "w").alias("src"), F.greatest("u", "w").alias("dst"))
    closed = pair.join(e, ["src", "dst"], "leftsemi").count()
    return closed / float(trials)


def approx_avg_local_cc(graph: EdgeGraph, trials: int = 10_000, seed: int = 42) -> float:
    """``ClusteringCoefficient::approxAvgLocal`` (``cpp/global/
    ClusteringCoefficient.cpp:133-165``): sample ``trials`` centers
    uniformly over nodes of degree ≥ 2 (the reference resamples sub-2
    nodes without counting the trial — same distribution), pick two
    distinct neighbors, return the closed fraction.  All draws are
    xxhash64(seed, trial); centers index into the eligible nodes through
    their deterministic ascending-id rank (:func:`assign_dense_ids`), so
    the estimate is reproducible at any parallelism."""
    from networkit_spark.graph import assign_dense_ids

    spark = graph.spark
    _, _, deg = _simple_sym(graph)
    elig = deg.where(F.col("deg") >= 2)
    n_elig = elig.count()
    if n_elig == 0:
        return 0.0
    ranked = assign_dense_ids(elig.select(F.col("node").alias("key"), "deg"), "key").select(
        F.col("id").alias("ridx"), F.col("key").alias("node")
    ).join(elig, "node")
    t = spark.range(trials).select(
        F.col("id").alias("trial"),
        F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(n_elig)).alias("ridx"),
    )
    centers = t.join(ranked, "ridx").select("trial", "node", "deg")
    return _closed_wedge_fraction(graph, centers, trials, seed)


def approx_global_cc(graph: EdgeGraph, trials: int = 10_000, seed: int = 42) -> float:
    """``ClusteringCoefficient::approxGlobal`` (``cpp/global/
    ClusteringCoefficient.cpp:221-281``): centers sampled with
    probability ∝ deg·(deg−1) (wedge count), then the same closed-wedge
    test — an unbiased estimator of 3·triangles/wedges.

    The reference's driver-side prefix-sum + binary search becomes a
    DISTRIBUTED weighted sampler: per-node cumulative weight ranges from
    per-partition sums + broadcast offsets (the assign_dense_ids
    pattern), quantized into ~n buckets of width W = total/n; each node
    explodes to the buckets its range spans (Σ spans ≈ 2n rows), each
    trial hashes r ∈ [0, total) to bucket r//W — an EQUI-join, no
    nested-loop range join, no driver-side O(n) state."""
    from pyspark.sql import Window

    spark = graph.spark
    _, _, deg = _simple_sym(graph)
    wdf = deg.where(F.col("deg") >= 2).select(
        "node", "deg", (F.col("deg") * (F.col("deg") - 1)).alias("w")
    )
    # per-partition cumulative sums + broadcast offsets → [lo, hi) per node
    P = spark.sparkContext.defaultParallelism
    parted = (
        wdf.repartitionByRange(P, F.col("node"))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.sum("w").over(
                Window.partitionBy("_pid").orderBy("node")
            ) - F.col("w"),
        )
        .persist()
    )
    psums = parted.groupBy("_pid").agg(F.sum("w").alias("_s")).collect()
    acc, rows = 0, []
    for r in sorted(psums, key=lambda r: r["_pid"]):
        rows.append((r["_pid"], acc))
        acc += r["_s"]
    total = acc
    if total == 0:
        return 0.0
    off = spark.createDataFrame(rows, "_pid int, _off long")
    ranges = parted.join(F.broadcast(off), "_pid").select(
        "node", "deg", (F.col("_off") + F.col("_local")).alias("lo"),
        (F.col("_off") + F.col("_local") + F.col("w")).alias("hi"),
    )
    # bucket width ~ mean weight: each range spans ≈ 1 + w/W buckets
    n_nodes = max(1, wdf.count())
    width = max(1, total // n_nodes)
    spanned = ranges.select(
        "node", "deg", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("long"),
                F.floor((F.col("hi") - 1) / width).cast("long"),
            )
        ).alias("bucket"),
    )
    t = spark.range(trials).select(
        F.col("id").alias("trial"),
        F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(total)).alias("r"),
    ).withColumn("bucket", F.floor(F.col("r") / width).cast("long"))
    centers = (
        t.join(spanned, "bucket")
        .where((F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")))
        .select("trial", "node", "deg")
    )
    frac = _closed_wedge_fraction(graph, centers, trials, seed)
    parted.unpersist()
    return frac
