"""Laplacian linear algebra — the ``numerics`` family (SURVEY §2).

Reference: ``cpp/numerics/ConjugateGradient.h`` (preconditioned CG with
Identity/Diagonal preconditioners, incl. ``parallelSolve`` for many
right-hand sides), ``cpp/numerics/GaussSeidelRelaxation.h`` (the
``Smoother`` used by LAMG), ``cpp/numerics/LinearSolver.h``.

Spark shape: vectors are (sys, node, val) DataFrames — many systems
solve SIMULTANEOUSLY, the built-in ``parallelSolve``.  One matvec is
one edge join + a groupBy; CG scalars (α, β, residuals) are per-system
aggregates broadcast-joined back, exactly the pattern proven inside
``commute_time_distance``.  Gauss-Seidel's sequential-update semantics
distribute via MULTI-COLOR ordering: a greedy (Luby-round) coloring
partitions nodes into independent classes; within a class no two nodes
are adjacent, so updating a whole class at once with the latest other-
class values IS Gauss-Seidel under the coloring-induced ordering — the
standard parallel formulation (red-black GS generalized).  A damped
Jacobi smoother is included for when a coloring isn't worth it.

The matrix is the graph Laplacian L = D − A of the loop-free
symmetrized graph (loops cancel in L).  L is singular (nullspace =
per-component constants); like the reference's usage, the rhs must be
component-compatible — ``project_nullspace=True`` re-centers residuals
per system the way ``commute_time_distance`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _with_sys(vec: DataFrame, col: str) -> DataFrame:
    if "sys" in vec.columns:
        return vec.select("sys", "node", F.col(col))
    return vec.select(F.lit(0).alias("sys"), "node", F.col(col))


def laplacian_matvec(graph: EdgeGraph, vec: DataFrame, col: str = "val") -> DataFrame:
    """(sys, node, val) = L·vec, one edge join + groupBy per call."""
    v = _with_sys(vec, col)
    sym = graph.sym().where(F.col("src") != F.col("dst"))
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    gathered = (
        sym.join(v.select("sys", F.col("node").alias("src"), col), "src")
        .groupBy("sys", F.col("dst").alias("node"))
        .agg(F.sum(F.col("weight") * F.col(col)).alias("nsum"))
    )
    return (
        v.join(gathered, ["sys", "node"], "left")
        .join(wdeg, "node", "left")
        .select(
            "sys",
            "node",
            (
                F.coalesce("wdeg", F.lit(0.0)) * F.col(col)
                - F.coalesce("nsum", F.lit(0.0))
            ).alias("val"),
        )
    )


def conjugate_gradient(
    graph: EdgeGraph,
    b: DataFrame,
    preconditioner: str = "identity",
    tol: float = 1e-5,
    max_iter: int = 200,
    project_nullspace: bool = True,
) -> DataFrame:
    """(sys, node, x) — solve L·x = b per system by preconditioned CG
    (``ConjugateGradient.h:solve`` — same update order: α from the
    preconditioned residual product, β from its ratio).  ``b``: (node,
    val) or (sys, node, val) rows (absent nodes read as 0).  The
    reference's convergence test ‖r‖ ≤ tol·‖b‖ is applied per system;
    converged systems freeze while the rest keep iterating (its
    ``parallelSolve``)."""
    if preconditioner not in ("identity", "diagonal"):
        raise ValueError("preconditioner must be 'identity' or 'diagonal'")
    bb = _with_sys(b, "val")
    sym = graph.sym().where(F.col("src") != F.col("dst")).persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    verts = graph.vertices().select(F.col("id").alias("node"))
    systems = bb.select("sys").distinct()

    dense_b = (
        verts.crossJoin(F.broadcast(systems))
        .join(bb, ["sys", "node"], "left")
        .select("sys", "node", F.coalesce("val", F.lit(0.0)).alias("b"))
    )
    # per-system target: tol² · ‖b‖²
    targets = dense_b.groupBy("sys").agg(
        (F.lit(tol * tol) * F.sum(F.col("b") * F.col("b"))).alias("target")
    ).localCheckpoint(eager=True)

    def precond(df: DataFrame, col: str) -> DataFrame:
        """z = M⁻¹ r with M = I or D (DiagonalPreconditioner.h)."""
        if preconditioner == "identity":
            return df.select("sys", "node", F.col(col).alias("z"))
        return df.join(wdeg, "node", "left").select(
            "sys",
            "node",
            F.when(
                F.coalesce("wdeg", F.lit(0.0)) > 0, F.col(col) / F.col("wdeg")
            ).otherwise(F.col(col)).alias("z"),
        )

    state = (
        dense_b.join(precond(dense_b, "b"), ["sys", "node"])
        .select(
            "sys", "node", F.lit(0.0).alias("x"), F.col("b").alias("r"),
            F.col("z").alias("p"), "z",
        )
        .localCheckpoint(eager=True)
    )

    def mv(df: DataFrame, col: str) -> DataFrame:
        gathered = (
            sym.join(df.select("sys", F.col("node").alias("src"), col), "src")
            .groupBy("sys", F.col("dst").alias("node"))
            .agg(F.sum(F.col("weight") * F.col(col)).alias("nsum"))
        )
        return (
            df.join(gathered, ["sys", "node"], "left")
            .join(wdeg, "node", "left")
            .select(
                "sys", "node",
                (
                    F.coalesce("wdeg", F.lit(0.0)) * F.col(col)
                    - F.coalesce("nsum", F.lit(0.0))
                ).alias("lp"),
            )
        )

    target_map = {r["sys"]: r["target"] for r in targets.collect()}
    spark = graph.spark
    for it in range(max_iter):
        lp = mv(state.select("sys", "node", "p"), "p")
        s = state.join(lp, ["sys", "node"]).localCheckpoint(eager=True)
        # per-system CG scalars are driver-sized BY CONSTRUCTION (one row
        # per system): collect them instead of broadcast-join chains —
        # one job per iteration instead of three.
        coeff = {
            r["sys"]: r
            for r in s.groupBy("sys")
            .agg(
                F.sum(F.col("r") * F.col("r")).alias("rr"),
                F.sum(F.col("r") * F.col("z")).alias("rz"),
                F.sum(F.col("p") * F.col("lp")).alias("plp"),
            )
            .collect()
        }
        live = {
            k: v
            for k, v in coeff.items()
            if v["rr"] > target_map.get(k, 0.0) and v["plp"] and v["plp"] > 0
        }
        if not live:
            break
        alpha_rows = [
            (int(k), float(v["rz"] / v["plp"])) for k, v in live.items()
        ]
        alpha_df = spark.createDataFrame(alpha_rows, "sys long, alpha double")
        s2 = (
            s.join(F.broadcast(alpha_df), "sys", "left")
            .select(
                "sys", "node",
                F.when(
                    F.col("alpha").isNotNull(),
                    F.col("x") + F.col("alpha") * F.col("p"),
                ).otherwise("x").alias("x"),
                F.when(
                    F.col("alpha").isNotNull(),
                    F.col("r") - F.col("alpha") * F.col("lp"),
                ).otherwise("r").alias("r"),
                "p",
                F.col("alpha").isNotNull().alias("live"),
            )
        )
        if project_nullspace:
            rmean = s2.where("live").groupBy("sys").agg(F.avg("r").alias("rm"))
            s2 = s2.join(F.broadcast(rmean), "sys", "left").withColumn(
                "r",
                F.when(
                    F.col("live"), F.col("r") - F.coalesce("rm", F.lit(0.0))
                ).otherwise(F.col("r")),
            ).drop("rm")
        z2 = precond(s2.select("sys", "node", "r"), "r")
        s2 = s2.join(z2, ["sys", "node"]).localCheckpoint(eager=True)
        rz_new = {
            r["sys"]: r["rz2"]
            for r in s2.where("live")
            .groupBy("sys")
            .agg(F.sum(F.col("r") * F.col("z")).alias("rz2"))
            .collect()
        }
        beta_rows = [
            (int(k), float(rz_new[k] / live[k]["rz"]))
            for k in rz_new
            if live[k]["rz"]
        ]
        beta_df = spark.createDataFrame(beta_rows, "sys long, beta double")
        state = (
            s2.join(F.broadcast(beta_df), "sys", "left")
            .select(
                "sys", "node", "x", "r",
                F.when(
                    F.col("beta").isNotNull(),
                    F.col("z") + F.col("beta") * F.col("p"),
                ).otherwise(F.col("p")).alias("p"),
                "z",
            )
        )
    sym.unpersist()
    return state.select("sys", "node", F.col("x"))


def greedy_coloring(graph: EdgeGraph, seed: int = 42, max_rounds: int = 256) -> DataFrame:
    """(node, color) — iterated-Luby greedy coloring: color c = a maximal
    independent set of the still-uncolored subgraph.  #colors is small
    for sparse graphs (≤ Δ+1-ish); each round is one MIS."""
    from networkit_spark.operators.forest import luby_mis

    remaining = graph
    out = None
    for c in range(max_rounds):
        verts = remaining.vertices()
        if verts.isEmpty():
            break
        mis = luby_mis(remaining, seed=seed + c).select(
            "node", F.lit(c).alias("color")
        ).localCheckpoint(eager=True)
        out = mis if out is None else out.unionByName(mis)
        keep = verts.join(mis.select(F.col("node").alias("id")), "id", "left_anti")
        e = (
            remaining.edges.join(keep.select(F.col("id").alias("src")), "src")
            .join(keep.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst", "weight")
        )
        lonely = (
            keep.join(e.select(F.col("src").alias("id")).union(
                e.select(F.col("dst").alias("id"))).distinct(), "id", "left_anti")
            .select(F.col("id").alias("node"), F.lit(c + 1).alias("color"))
        )
        if not lonely.isEmpty():
            out = out.unionByName(lonely.localCheckpoint(eager=True))
            keep = keep.join(
                lonely.select(F.col("node").alias("id")), "id", "left_anti"
            )
        if keep.isEmpty():
            break
        remaining = EdgeGraph(
            e.localCheckpoint(eager=True), remaining.directed, remaining.weighted
        )
    return out


def gauss_seidel_relaxation(
    graph: EdgeGraph,
    b: DataFrame,
    x0: DataFrame | None = None,
    sweeps: int = 10,
    tol: float = 1e-15,
    colors: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(sys, node, x) — Gauss-Seidel sweeps on L·x = b
    (``GaussSeidelRelaxation.h:relax``: x_i ← (b_i − Σ_{j≠i} a_ij x_j)/
    a_ii with the freshest x_j available).  Distributed as MULTI-COLOR
    GS: nodes of one color class are pairwise non-adjacent, so a whole
    class updates at once using the other classes' latest values — the
    update order is the coloring-induced order instead of the
    reference's 0..n-1, a standard reordering (GS convergence holds for
    any ordering on L).  One sweep = #colors join rounds.  Stops early
    when ‖x_new − x_old‖² ≤ tol per the reference's loop guard."""
    if colors is None:
        colors = greedy_coloring(graph, seed=seed)
    colors = colors.localCheckpoint(eager=True)
    ncolors = [r["color"] for r in colors.select("color").distinct().orderBy("color").collect()]
    bb = _with_sys(b, "val")
    sym = graph.sym().where(F.col("src") != F.col("dst")).persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    verts = graph.vertices().select(F.col("id").alias("node"))
    systems = bb.select("sys").distinct()
    dense_b = (
        verts.crossJoin(F.broadcast(systems))
        .join(bb, ["sys", "node"], "left")
        .select("sys", "node", F.coalesce("val", F.lit(0.0)).alias("b"))
    )
    if x0 is None:
        x = dense_b.select("sys", "node", F.lit(0.0).alias("x"))
    else:
        x = _with_sys(x0, "x")
    x = x.join(colors, "node").localCheckpoint(eager=True)

    for _ in range(sweeps):
        prev = x
        for c in ncolors:
            gathered = (
                sym.join(x.select("sys", F.col("node").alias("src"), "x"), "src")
                .groupBy("sys", F.col("dst").alias("node"))
                .agg(F.sum(F.col("weight") * F.col("x")).alias("nsum"))
            )
            x = (
                x.join(gathered, ["sys", "node"], "left")
                .join(dense_b, ["sys", "node"])
                .join(wdeg, "node", "left")
                .select(
                    "sys", "node", "color",
                    F.when(
                        (F.col("color") == c) & (F.coalesce("wdeg", F.lit(0.0)) > 0),
                        # off-diagonal of L is −w, so Σ_{j≠i} a_ij x_j = −nsum
                        (F.col("b") + F.coalesce("nsum", F.lit(0.0))) / F.col("wdeg"),
                    ).otherwise(F.col("x")).alias("x"),
                )
                .localCheckpoint(eager=True)
            )
        delta = (
            x.select("sys", "node", F.col("x").alias("xn"))
            .join(prev.select("sys", "node", F.col("x").alias("xo")), ["sys", "node"])
            .agg(F.sum((F.col("xn") - F.col("xo")) ** 2).alias("d"))
            .collect()[0]["d"]
        )
        if delta is not None and delta <= tol:
            break
    sym.unpersist()
    return x.select("sys", "node", "x")


def jacobi_smoother(
    graph: EdgeGraph,
    b: DataFrame,
    x0: DataFrame | None = None,
    sweeps: int = 10,
    omega: float = 2.0 / 3.0,
) -> DataFrame:
    """(sys, node, x) — damped Jacobi on L·x = b: x ← x + ω·D⁻¹(b − Lx).
    The fully synchronous ``Smoother`` (``cpp/numerics/Smoother.h``
    role) for when a coloring isn't worth building; ω = 2/3 is the
    standard smoothing factor."""
    bb = _with_sys(b, "val")
    sym = graph.sym().where(F.col("src") != F.col("dst")).persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    verts = graph.vertices().select(F.col("id").alias("node"))
    systems = bb.select("sys").distinct()
    dense_b = (
        verts.crossJoin(F.broadcast(systems))
        .join(bb, ["sys", "node"], "left")
        .select("sys", "node", F.coalesce("val", F.lit(0.0)).alias("b"))
    )
    if x0 is None:
        x = dense_b.select("sys", "node", F.lit(0.0).alias("x"))
    else:
        x = _with_sys(x0, "x")
    for _ in range(sweeps):
        gathered = (
            sym.join(x.select("sys", F.col("node").alias("src"), "x"), "src")
            .groupBy("sys", F.col("dst").alias("node"))
            .agg(F.sum(F.col("weight") * F.col("x")).alias("nsum"))
        )
        x = (
            x.join(gathered, ["sys", "node"], "left")
            .join(dense_b, ["sys", "node"])
            .join(wdeg, "node", "left")
            .select(
                "sys", "node",
                F.when(
                    F.coalesce("wdeg", F.lit(0.0)) > 0,
                    F.col("x")
                    + F.lit(omega)
                    * (
                        F.col("b")
                        - (F.col("wdeg") * F.col("x") - F.coalesce("nsum", F.lit(0.0)))
                    )
                    / F.col("wdeg"),
                ).otherwise(F.col("x")).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return x
