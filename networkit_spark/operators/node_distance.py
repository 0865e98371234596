"""Node distances: AlgebraicDistance and CommuteTimeDistance.

AlgebraicDistance (``cpp/distance/AlgebraicDistance.cpp:24-140``,
Chen-Safro): ``numSystems`` random load vectors are smoothed
``numIters`` times by Jacobi over-relaxation
``x ← (1-ω)·x + ω·(Σ_v w_uv x_v / Σ_v w_uv)``, then min-max normalized
PER SYSTEM; the distance of (u,v) is the max-norm (norm=0) or p-norm
of the per-system load differences.  Distances become small inside
dense subgraphs.

Spark shape: state is the exploded (node, sys, load) table — K·n rows,
hash-partitioned on node, so a superstep is one join with the symmetric
edge list + one (node, sys) aggregation, all whole-stage codegen; the
random init is md5-keyed (seed, node, sys) — deterministic at any
parallelism, reproducible in the NumPy test oracle.

CommuteTimeDistance (``cpp/distance/CommuteTimeDistance.cpp:38-198``):
ECTD(u,v) = sqrt(R_eff(u,v) · vol(G)) where L x = e_u - e_v and
R_eff = x_u - x_v; vol = 2m (2·totalWeight when weighted).  The
reference solves with LAMG; this engine runs CONJUGATE GRADIENT as
supersteps over the edge table, solving ALL requested pairs
simultaneously (state keyed (pair, node)) — one gather join + two
small aggregations per iteration, no per-pair driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _u01(*cols):
    h = F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 13), 16, 10).cast(
        "double"
    )
    return h / float(16**13)


def algebraic_distance_loads(
    graph: EdgeGraph,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(node, sys, load) after smoothing + per-system min-max
    normalization (``AlgebraicDistance.cpp:randomInit/preprocess``)."""
    spark = graph.spark
    sym = graph.sym().persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    systems = spark.range(num_systems).select(F.col("id").alias("sys"))
    loads = (
        graph.vertices()
        .select(F.col("id").alias("node"))
        .crossJoin(F.broadcast(systems))
        .select("node", "sys", _u01(F.lit(seed), F.lit("ad"), "node", "sys").alias("load"))
        .localCheckpoint(eager=True)
    )
    for _ in range(num_iterations):
        gathered = (
            sym.join(
                loads.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "sys")
            .agg(F.sum(F.col("weight") * F.col("load")).alias("wsum"))
        )
        loads = (
            loads.join(gathered, ["node", "sys"], "left")
            .join(wdeg, "node", "left")
            .select(
                "node",
                "sys",
                F.when(
                    F.col("wsum").isNotNull() & (F.col("wdeg") > 0),
                    (1.0 - omega) * F.col("load")
                    + omega * F.col("wsum") / F.col("wdeg"),
                )
                .otherwise(F.col("load"))  # isolated nodes keep their load
                .alias("load"),
            )
            .localCheckpoint(eager=True)
        )
    mm = loads.groupBy("sys").agg(F.min("load").alias("mn"), F.max("load").alias("mx"))
    out = loads.join(F.broadcast(mm), "sys").select(
        "node",
        "sys",
        # reference: (min - load) / (min - max)
        ((F.col("mn") - F.col("load")) / (F.col("mn") - F.col("mx"))).alias("load"),
    )
    sym.unpersist()
    return out


def algebraic_distance_edge_scores(
    graph: EdgeGraph,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    norm: int = 0,
    seed: int = 42,
    loads: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, score) — ad(u,v) per edge
    (``AlgebraicDistance.cpp:distance``, withEdgeScores).  norm=0 is
    the max-norm; otherwise the p-norm."""
    if loads is None:
        loads = algebraic_distance_loads(graph, num_systems, num_iterations, omega, seed)
    e = graph.edges.select("src", "dst")
    j = (
        e.join(loads.withColumnRenamed("node", "src").withColumnRenamed("load", "lu"), "src")
        .join(
            loads.select(
                F.col("node").alias("dst"), "sys", F.col("load").alias("lv")
            ),
            ["dst", "sys"],
        )
        .withColumn("absdiff", F.abs(F.col("lu") - F.col("lv")))
    )
    if norm == 0:
        agg = j.groupBy("src", "dst").agg(F.max("absdiff").alias("score"))
    else:
        agg = j.groupBy("src", "dst").agg(
            F.pow(F.sum(F.pow("absdiff", float(norm))), 1.0 / norm).alias("score")
        )
    return agg.select("src", "dst", F.coalesce("score", F.lit(0.0)).alias("score"))


def commute_time_distance(
    graph: EdgeGraph,
    pairs: DataFrame,
    tol: float = 1e-9,
    max_iter: int = 200,
) -> DataFrame:
    """(u, v, ectd) for each requested pair
    (``CommuteTimeDistance.cpp:run/distance``): solve L x = e_u - e_v
    with CG, ectd = sqrt(|x_u - x_v| · vol(G)).  Assumes u and v are in
    the same connected component (as the reference's setupConnected
    does).  All pairs solve simultaneously; per-pair CG scalars live in
    a broadcast-joined coefficient table."""
    spark = graph.spark
    e = graph.edges.where(F.col("src") != F.col("dst"))
    sym = graph.sym().where(F.col("src") != F.col("dst")).persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    vol = sym.agg(F.sum("weight")).collect()[0][0] or 0.0  # = 2m (weighted: 2W)

    p_id = pairs.select(
        F.monotonically_increasing_id().alias("pair"), F.col("u"), F.col("v")
    ).localCheckpoint(eager=True)
    verts = graph.vertices().select(F.col("id").alias("node"))

    # state: x=0, r = p = b = e_u - e_v
    b = (
        verts.crossJoin(F.broadcast(p_id))
        .select(
            "pair",
            "node",
            (
                F.when(F.col("node") == F.col("u"), 1.0)
                .when(F.col("node") == F.col("v"), -1.0)
                .otherwise(0.0)
            ).alias("b"),
        )
    )
    state = b.select(
        "pair", "node", F.lit(0.0).alias("x"), F.col("b").alias("r"), F.col("b").alias("p")
    ).localCheckpoint(eager=True)

    def lap_apply(vec: DataFrame, col: str) -> DataFrame:
        """(pair, node, lv) = (L·vec) rows."""
        gathered = (
            sym.join(
                vec.select("pair", F.col("node").alias("src"), F.col(col)), "src"
            )
            .groupBy("pair", F.col("dst").alias("node"))
            .agg(F.sum(F.col("weight") * F.col(col)).alias("nsum"))
        )
        return (
            vec.join(gathered, ["pair", "node"], "left")
            .join(wdeg, "node", "left")
            .select(
                "pair",
                "node",
                (
                    F.coalesce("wdeg", F.lit(0.0)) * F.col(col)
                    - F.coalesce("nsum", F.lit(0.0))
                ).alias("lv"),
            )
        )

    for it in range(max_iter):
        lp = lap_apply(state.select("pair", "node", "p"), "p")
        s = state.join(lp, ["pair", "node"])
        coeff = s.groupBy("pair").agg(
            F.sum(F.col("r") * F.col("r")).alias("rr"),
            F.sum(F.col("p") * F.col("lv")).alias("plp"),
        )
        live = coeff.where(F.col("rr") > tol)
        if live.isEmpty():
            break
        s = s.join(F.broadcast(live.select("pair", "rr", "plp")), "pair", "left")
        s2 = s.select(
            "pair",
            "node",
            F.when(
                F.col("rr").isNotNull(),
                F.col("x") + F.col("rr") / F.col("plp") * F.col("p"),
            ).otherwise(F.col("x")).alias("x"),
            F.when(
                F.col("rr").isNotNull(),
                F.col("r") - F.col("rr") / F.col("plp") * F.col("lv"),
            ).otherwise(F.col("r")).alias("r"),
            "p",
            F.col("rr").isNotNull().alias("live"),
        )
        # project out the mean of r per pair (L's null space) to stop drift
        rmean = s2.groupBy("pair").agg(F.avg("r").alias("rm"))
        s2 = s2.join(F.broadcast(rmean), "pair").withColumn(
            "r", F.when(F.col("live"), F.col("r") - F.col("rm")).otherwise(F.col("r"))
        )
        rr_new = s2.where("live").groupBy("pair").agg(
            F.sum(F.col("r") * F.col("r")).alias("rr2")
        )
        state = (
            s2.join(F.broadcast(rr_new), "pair", "left")
            .join(F.broadcast(coeff.select("pair", "rr")), "pair")
            .select(
                "pair",
                "node",
                "x",
                "r",
                F.when(
                    F.col("live"), F.col("r") + F.col("rr2") / F.col("rr") * F.col("p")
                ).otherwise(F.col("p")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )

    xu = state.join(
        p_id.select("pair", "u", "v"), "pair"
    )
    diff = (
        xu.groupBy("pair", "u", "v")
        .agg(
            F.sum(F.when(F.col("node") == F.col("u"), F.col("x")).otherwise(0.0)).alias("xu"),
            F.sum(F.when(F.col("node") == F.col("v"), F.col("x")).otherwise(0.0)).alias("xv"),
        )
        .select(
            "u",
            "v",
            F.sqrt(F.abs(F.col("xu") - F.col("xv")) * F.lit(float(vol))).alias("ectd"),
        )
    )
    sym.unpersist()
    return diff


def jaccard_distance(graph: EdgeGraph) -> DataFrame:
    """``JaccardDistance`` (``cpp/distance/JaccardDistance.h:18-23``):
    per EDGE, 1 − neighborhood-Jaccard similarity."""
    from networkit_spark.operators.sparsification import jaccard_score

    return jaccard_score(graph).select(
        "src", "dst", (1.0 - F.col("score")).alias("distance")
    )


def adamic_adar_distance(graph: EdgeGraph) -> DataFrame:
    """``AdamicAdarDistance`` (``cpp/distance/AdamicAdarDistance.cpp:
    22-58``): per EDGE (u, v), 1 / Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w) —
    infinity (the reference's 1/0) becomes NULL here; filter or
    ``fillna`` by taste.  One wedge join, AA-weighted."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    a = sym.select(F.col("dst").alias("z"), F.col("src").alias("u"))
    b = sym.select(F.col("dst").alias("z"), F.col("src").alias("v"))
    wed = (
        a.join(b, "z")
        .where(F.col("u") < F.col("v"))
        .join(deg.withColumnRenamed("node", "z").withColumnRenamed("deg", "zdeg"), "z")
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(F.sum(1.0 / F.log("zdeg")).alias("aa"))
    )
    return e.join(wed, ["src", "dst"], "left").select(
        "src", "dst", (1.0 / F.col("aa")).alias("distance")
    )


def graph_distance(graph: EdgeGraph, u: int, v: int, weighted: bool = False) -> float:
    """``GraphDistance::weightedDistance/unweightedDistance``
    (``cpp/distance/GraphDistance.h``): one shortest-path distance;
    ``inf`` when unreachable."""
    from networkit_spark.operators.bfs import bfs, sssp

    d = sssp(graph, u) if weighted else bfs(graph, u)
    row = d.where(F.col("node") == v).collect()
    return float(row[0]["dist"]) if row else float("inf")


def hop_plot(graph: EdgeGraph, max_h: int = 8) -> DataFrame:
    """``HopPlotApproximation`` surface (``cpp/distance/
    HopPlotApproximation.h:20-52``): (h, fraction) — the fraction of
    connected node pairs reachable within h hops.  Exact small-scale
    form over ``neighborhood_function``; at 100 TB the HyperANF
    register path (``operators/anf``) produces the same curve
    approximately."""
    from networkit_spark.operators.bfs import neighborhood_function

    nf = neighborhood_function(graph, max_h=max_h)
    n = graph.num_nodes()
    denom = float(n) * n
    return nf.select("h", (F.col("reachable_pairs") / F.lit(denom)).alias("fraction"))


def spanning_edge_centrality(
    graph: EdgeGraph, edges: DataFrame | None = None, tol: float = 1e-9
) -> DataFrame:
    """``SpanningEdgeCentrality`` (``cpp/centrality/SpanningEdgeCentrality
    .cpp:33-56``): per edge, its effective resistance — the fraction of
    spanning trees containing it.  Rides ``commute_time_distance``
    (R = ectd² / vol); pass ``edges`` to score a subset (all canonical
    edges by default — every pair's CG solve runs simultaneously, so use
    a sample at scale like the reference's JL-projection variant)."""
    e = (edges or graph.edges).where(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    sym = graph.sym().where(F.col("src") != F.col("dst"))
    vol = sym.agg(F.sum("weight")).collect()[0][0] or 1.0
    ectd = commute_time_distance(graph, e, tol=tol)
    return ectd.select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        ((F.col("ectd") * F.col("ectd")) / vol).alias("score"),
    )
