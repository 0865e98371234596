"""Graph layout + PostScript rendering (the reference's ``viz`` family).

Reference: ``cpp/viz/PivotMDS.cpp``, ``cpp/viz/FruchtermanReingold.cpp``,
``cpp/viz/Layouter.cpp``, ``cpp/viz/PostscriptWriter.cpp``.

Spark shapes
------------
* :func:`pivot_mds` — the k pivot BFS/SSSP sweeps run as ONE tagged
  multi-source relaxation (state ``(pivot, node, dist)``, k·n rows);
  double-centering is two marginal joins; ``CᵀC`` (k×k) is accumulated
  from per-partition NumPy partials via ``mapInPandas`` — the only
  driver-sized object is k×k.  The reference's power-method + deflation
  (``PivotMDS.cpp:78-105``) is replaced by a driver-side ``numpy.eigh``
  of the same k×k matrix — identical subspace, deterministic.
* :func:`fruchterman_reingold` — attractive forces are one edge join per
  iteration.  Repulsive forces are all-pairs O(n²) in the reference
  (``parallelForNodePairs``); here ``repulsion="exact"`` reproduces that
  with a crossJoin (small n), while ``repulsion="grid"`` buckets nodes
  into cells of ~optimal-distance size and only repels the 3×3 cell
  neighborhood — the O(n) shape that survives scale (far-field 1/d²
  forces are negligible by construction; documented deviation).
* :func:`write_postscript` — single-stream text format ⇒ driver-side
  serialization (same class as the GML/METIS writers); coordinates and
  colors are computed distributed and only the final draw list is
  collected.
"""

from __future__ import annotations

import math
import sys
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from networkit_spark.graph import EdgeGraph, truncate_lineage


def _multi_source_dist(
    graph: EdgeGraph, sources: list[int], max_rounds: int = 64
) -> DataFrame:
    """(pivot, node, dist) — weighted shortest-path distance from every
    pivot at once (tagged Bellman-Ford supersteps; hop-BFS when weights
    are 1).  Matches the reference's per-pivot Dijkstra sweeps
    (``PivotMDS.cpp:27-44``) at convergence."""
    sym = graph.sym().select("src", "dst", "weight").persist()
    dist = graph.spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "pivot long, node long, dist double"
    ).localCheckpoint(eager=True)
    frontier = dist
    for it in range(max_rounds):
        cand = (
            frontier.join(sym, frontier.node == sym.src)
            .select("pivot", F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("dist"))
            .groupBy("pivot", "node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("pivot", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        improved = merged.join(
            dist.withColumnRenamed("dist", "old"), ["pivot", "node"], "left"
        ).where(F.col("old").isNull() | (F.col("dist") < F.col("old"))).select(
            "pivot", "node", "dist"
        ).localCheckpoint(eager=True)
        if improved.isEmpty():
            dist = merged
            break
        dist = merged
        frontier = improved
    sym.unpersist()
    return dist


def _ctc_partials(k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((k, k))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["c"].to_numpy())  # rows × k
            acc += mat.T @ mat
        yield pd.DataFrame({"part": [acc.flatten().tolist()]})

    return gen


def pivot_mds(
    graph: EdgeGraph, dim: int = 2, num_pivots: int = 32, seed: int = 42
) -> DataFrame:
    """(node, coords: array<double>[dim]) — PivotMDS layout
    (``cpp/viz/PivotMDS.{h,cpp}``, Brandes-Pich): distances from k
    pivots, double-centered (unsquared, as the reference's triplets
    are), projected onto the top-``dim`` eigenvectors of CᵀC.
    Deviation: pivots are a seeded-hash sample (the reference draws with
    a global RNG); eigenvectors come from ``numpy.eigh`` instead of
    power iteration — same subspace up to sign."""
    verts = graph.vertices().select(F.col("id").alias("node"))
    n = verts.count()
    k = min(num_pivots, n)
    pivots = [
        int(r["node"])
        for r in verts.orderBy(F.xxhash64("node", F.lit(seed)), "node").limit(k).collect()
    ]
    d = _multi_source_dist(graph, pivots)
    # pivot index 0..k-1 in sample order (column order is arbitrary but fixed)
    pidx = {p: j for j, p in enumerate(pivots)}
    pmap = graph.spark.createDataFrame(
        [(p, j) for p, j in pidx.items()], "pivot long, j int"
    )
    d = d.join(F.broadcast(pmap), "pivot").select("j", "node", "dist")
    # double centering: value − rowMean(node) − colMean(j) + grandMean.
    # Unreached (node, j) cells are implicit zeros (the reference never
    # pushes their triplets), so marginals divide by k and n, not counts.
    row_mean = d.groupBy("node").agg((F.sum("dist") / k).alias("rmean"))
    col_mean = d.groupBy("j").agg((F.sum("dist") / n).alias("cmean"))
    grand = (
        row_mean.agg(F.sum(F.col("rmean") / (2.0 * n))).collect()[0][0] or 0.0
    ) + (col_mean.agg(F.sum(F.col("cmean") / (2.0 * k))).collect()[0][0] or 0.0)
    # complete the grid so zero cells are centered too
    grid = verts.crossJoin(F.broadcast(pmap.select("j")))
    c = (
        grid.join(d, ["node", "j"], "left")
        .join(row_mean, "node", "left")
        .join(F.broadcast(col_mean), "j", "left")
        .select(
            "node", "j",
            (
                F.coalesce("dist", F.lit(0.0))
                - F.coalesce("rmean", F.lit(0.0))
                - F.coalesce("cmean", F.lit(0.0))
                + F.lit(float(grand))
            ).alias("v"),
        )
    )
    rows = (
        c.groupBy("node")
        .agg(F.array_sort(F.collect_list(F.struct("j", "v"))).alias("_s"))
        .select("node", F.transform("_s", lambda s: s["v"]).alias("c"))
        .localCheckpoint(eager=True)
    )
    parts = rows.select("c").mapInPandas(_ctc_partials(k), "part array<double>").collect()
    ctc = np.zeros((k, k))
    for r in parts:
        ctc += np.array(r["part"]).reshape(k, k)
    evals, evecs = np.linalg.eigh(ctc)
    top = evecs[:, np.argsort(evals)[::-1][:dim]]  # k × dim

    @F.pandas_udf("array<double>")
    def project(cs: pd.Series) -> pd.Series:
        mat = np.stack(cs.to_numpy())
        return pd.Series(list(mat @ top))

    return rows.select("node", project("c").alias("coords"))


def _unit_random(col, seed: int):
    h = F.abs(F.xxhash64(col, F.lit(seed)))
    return (h % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def fruchterman_reingold(
    graph: EdgeGraph,
    max_iter: int = 30,
    precision: float = 1e-3,
    repulsion: str = "exact",
    init: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(node, x, y) in the unit square — force-directed layout
    (``cpp/viz/FruchtermanReingold.cpp``): repulsion optDist²/d² between
    node pairs, attraction d/optDist along edges, unit-normalized moves
    with the reference's 1/(1 + 0.1·t) cooling, clamped to [0,1]²
    (``FruchtermanReingold.cpp:66-78``), stopping when total movement
    < ``precision`` or after ``max_iter`` rounds.

    ``repulsion="exact"`` = the reference's all-pairs loop (crossJoin —
    quadratic, small graphs).  ``repulsion="grid"`` = cell-bucketed
    3×3-neighborhood repulsion, the linear-shuffle shape for large n
    (far-field terms dropped; documented deviation)."""
    if repulsion not in ("exact", "grid"):
        raise ValueError("repulsion must be 'exact' or 'grid'")
    verts = graph.vertices().select(F.col("id").alias("node"))
    n = verts.count()
    if n == 0:
        return graph.spark.createDataFrame([], "node long, x double, y double")
    opt_sq = 0.3 / n  # OPT_PAIR_SQR_DIST_SCALE · area(=1) / n
    opt = math.sqrt(opt_sq)
    pos = (
        init.select("node", "x", "y")
        if init is not None
        else verts.select(
            "node",
            _unit_random(F.col("node"), seed).alias("x"),
            _unit_random(F.col("node"), seed + 1).alias("y"),
        )
    ).localCheckpoint(eager=True)
    e = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst").persist()
    cell = 2.0 * opt  # grid cell edge; 3×3 cells cover radius ≥ 2·opt

    for it in range(max_iter):
        p1 = pos.select(F.col("node").alias("u"), F.col("x").alias("xu"), F.col("y").alias("yu"))
        p2 = pos.select(F.col("node").alias("v"), F.col("x").alias("xv"), F.col("y").alias("yv"))
        if repulsion == "exact":
            pairs = p1.crossJoin(p2).where(F.col("u") != F.col("v"))
        else:
            cells1 = p1.select(
                "u", "xu", "yu",
                F.floor(F.col("xu") / cell).alias("cx"),
                F.floor(F.col("yu") / cell).alias("cy"),
            )
            offs = graph.spark.createDataFrame(
                [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
            )
            probe = cells1.crossJoin(F.broadcast(offs)).select(
                "u", "xu", "yu",
                (F.col("cx") + F.col("dx")).alias("cx"),
                (F.col("cy") + F.col("dy")).alias("cy"),
            )
            cells2 = p2.select(
                "v", "xv", "yv",
                F.floor(F.col("xv") / cell).alias("cx"),
                F.floor(F.col("yv") / cell).alias("cy"),
            )
            pairs = probe.join(cells2, ["cx", "cy"]).where(F.col("u") != F.col("v"))
        sqd = (F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2
        rep = pairs.select(
            F.col("u").alias("node"),
            F.when(sqd > 0, (F.col("xu") - F.col("xv")) * opt_sq / sqd).otherwise(0.0).alias("fx"),
            F.when(sqd > 0, (F.col("yu") - F.col("yv")) * opt_sq / sqd).otherwise(0.0).alias("fy"),
        )
        # attraction: for edge (u,v): force on u −= (p_u − p_v)·d/opt
        att = (
            e.join(p1.withColumnRenamed("u", "src"), "src")
            .join(p2.withColumnRenamed("v", "dst"), "dst")
            .select(
                F.col("src").alias("node"),
                (-(F.col("xu") - F.col("xv"))
                 * F.sqrt((F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2)
                 / opt).alias("fx"),
                (-(F.col("yu") - F.col("yv"))
                 * F.sqrt((F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2)
                 / opt).alias("fy"),
            )
        )
        force = rep.unionByName(att).groupBy("node").agg(
            F.sum("fx").alias("fx"), F.sum("fy").alias("fy")
        )
        # reference cooling: iteration 0 uses the initial step 1.0; after
        # each iteration step += 0.1 and the NEXT one uses 1/step
        step = 1.0 if it == 0 else 1.0 / (1.0 + 0.1 * it)
        flen = F.sqrt(F.col("fx") ** 2 + F.col("fy") ** 2)
        moved = (
            pos.join(force, "node", "left")
            .select(
                "node",
                F.col("x").alias("ox"), F.col("y").alias("oy"),
                F.when(
                    F.coalesce(flen, F.lit(0.0)) > 0,
                    F.col("x") + step * F.col("fx") / flen,
                ).otherwise(F.col("x")).alias("nx"),
                F.when(
                    F.coalesce(flen, F.lit(0.0)) > 0,
                    F.col("y") + step * F.col("fy") / flen,
                ).otherwise(F.col("y")).alias("ny"),
            )
            .select(
                "node", "ox", "oy",
                F.least(F.greatest("nx", F.lit(0.0)), F.lit(1.0)).alias("x"),
                F.least(F.greatest("ny", F.lit(0.0)), F.lit(1.0)).alias("y"),
            )
            .localCheckpoint(eager=True)
        )
        change = moved.agg(
            F.sum(F.sqrt((F.col("x") - F.col("ox")) ** 2 + (F.col("y") - F.col("oy")) ** 2))
        ).collect()[0][0] or 0.0
        pos = truncate_lineage(moved.select("node", "x", "y"), it)
        if change < precision:
            break
    e.unpersist()
    return pos


_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]


def write_postscript(
    graph: EdgeGraph,
    coords: DataFrame,
    path: str,
    clustering: DataFrame | None = None,
) -> None:
    """``PostscriptWriter`` (``cpp/viz/PostscriptWriter.cpp``): 1020×1020
    EPS with the reference's macros, 24-color cluster palette, grey
    inter-cluster edges and dot-size-2 vertices.  ``coords`` is
    (node, x, y) or (node, coords array).  Single-stream text ⇒
    driver-side write; the draw lists are assembled distributed and
    collected once."""
    if "coords" in coords.columns:
        coords = coords.select(
            "node",
            F.element_at("coords", 1).alias("x"),
            F.element_at("coords", 2).alias("y"),
        )
    bounds = coords.agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()[0]
    border, size = 10.0, 1020.0
    stretch = size - 2 * border
    dx = (bounds["x1"] - bounds["x0"]) or 1.0
    dy = (bounds["y1"] - bounds["y0"]) or 1.0

    def adj(xc, yc):
        return (
            (xc - bounds["x0"]) * stretch / dx + border,
            (yc - bounds["y0"]) * stretch / dy + border,
        )

    lab = (
        clustering.select("node", "label")
        if clustering is not None
        else coords.select("node", F.lit(None).cast("long").alias("label"))
    )
    pts = {
        r["node"]: (r["x"], r["y"], r["label"])
        for r in coords.join(lab, "node", "left").collect()
    }
    edges = graph.edges.select("src", "dst").collect()
    with open(path, "w") as fh:
        fh.write("%!PS-Adobe-1.0\n%%Title: NetworKit visualization\n")
        fh.write(f"%%BoundingBox: 0.000 0.000 {size:.3f} {size:.3f}\n")
        fh.write("%%EndComments\n%%EndProlog\ngsave\n")
        for m in ("/p {newpath} bind def", "/m {moveto} bind def",
                  "/r {rmoveto} bind def", "/k {rlineto} bind def",
                  "/l {lineto} bind def", "/n {rlineto} bind def",
                  "/c {setrgbcolor} bind def", "/s {stroke} bind def",
                  "/w {setlinewidth} bind def", "/h {show} bind def",
                  "/a {arc closepath fill} bind def",
                  "/b {closepath eofill} bind def"):
            fh.write(m + "\n")
        fh.write("0.000 0.000 0.000 c\n")
        for r in edges:
            u, v = r["src"], r["dst"]
            if u not in pts or v not in pts:
                continue
            lu, lv = pts[u][2], pts[v][2]
            if lu is not None and lu == lv:
                cr, cg, cb = _PS_COLORS[int(lu) % 24]
                fh.write(f"{cr:.2f} {cg:.2f} {cb:.2f} c ")
            else:
                fh.write("0.80 0.80 0.80 c 1.0 w ")
            sx, sy = adj(pts[u][0], pts[u][1])
            ex, ey = adj(pts[v][0], pts[v][1])
            fh.write(f"p {sx:.3f} {sy:.3f} m {ex:.3f} {ey:.3f} l s\n")
        for node, (xc, yc, lu) in sorted(pts.items()):
            if lu is not None:
                cr, cg, cb = _PS_COLORS[int(lu) % 24]
                fh.write(f"{cr:.2f} {cg:.2f} {cb:.2f} c ")
            else:
                fh.write("0.0 0.0 0.0 c ")
            ax, ay = adj(xc, yc)
            fh.write(f"p {ax:.3f} {ay:.3f} 2.0 0.00 360.00 a s\n")
        fh.write("grestore\n")


def multilevel_layout(
    graph: EdgeGraph,
    n_coarsest: int = 15,
    max_levels: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(node, x, y) — MultilevelLayouter
    (``cpp/viz/MultilevelLayouter.cpp``): PLP-cluster → contract until
    ≤ ``n_coarsest`` nodes, lay the coarsest graph out with FR from
    scratch, then prolong coordinates through each fine level (every node
    starts at its coarse representative) and refine with warm-started FR.
    The reference's MaxentStress refinement pass is replaced by a second
    FR sweep (we do not ship an algebraic solver backend; documented).
    All contraction levels are DataFrame joins; only level metadata hits
    the driver."""
    from networkit_spark.operators.coarsening import coarsen_by_partition
    from networkit_spark.operators.plp import plp

    # (fine graph, fine->coarse mapping) per level, finest first
    levels: list[tuple[EdgeGraph, DataFrame]] = []
    g = graph
    n = g.num_nodes()
    for _ in range(max_levels):
        if n <= n_coarsest:
            break
        labels = plp(g, max_iter=8)
        coarse, mapping = coarsen_by_partition(g, labels)
        cn = coarse.num_nodes()
        if cn >= n:  # no contraction progress — stop coarsening
            break
        levels.append((g, mapping.localCheckpoint(eager=True)))
        g, n = coarse, cn
    pos = fruchterman_reingold(g, max_iter=30, repulsion="exact", seed=seed)
    # walk back up: prolong coarse coordinates to the finer level, refine
    for fine, mapping in reversed(levels):
        fine_nodes = mapping.select("node", F.col("label").alias("cnode"))
        pos = fine_nodes.join(
            pos.withColumnRenamed("node", "cnode"), "cnode"
        ).select("node", "x", "y")
        pos = fruchterman_reingold(
            fine, max_iter=15, repulsion="grid", init=pos, seed=seed
        )
    return pos


def maxent_stress(
    graph: EdgeGraph,
    max_iter: int = 20,
    q: float = 0.0,
    alpha: float = 1.0,
    alpha_reduction: float = 0.3,
    final_alpha: float = 0.008,
    init: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(node, x, y) — MaxentStress layout (``cpp/viz/MaxentStress.{h,cpp}``,
    Gansner-Hu-North): minimize stress Σ_{(u,v)∈E} w_uv(||x_u−x_v||−d_uv)²
    plus a maximum-entropy repulsion −α Σ_{u≁v} sign(q)·||x_u−x_v||^{−q},
    with the reference's α-annealing (×``alpha_reduction`` per round down
    to ``final_alpha``).

    Deviation, documented: the reference solves the weighted-Laplacian
    system per round with the LAMG algebraic backend (scoped out here);
    this is the LOCAL-ITERATION form of the same objective (Gansner et
    al. §2.2, eq. 8 — the Jacobi splitting of that solve), and the
    non-neighbor entropy term is grid-cell approximated to the 3×3
    neighborhood of ~optimal-distance cells like
    :func:`fruchterman_reingold` (far-field ||·||^{−(q+1)} terms decay).
    Every round is two joins (edge attraction, cell repulsion) + one
    aggregation — no n×n system and no driver-side solve."""
    verts = graph.vertices().select(F.col("id").alias("node"))
    n = verts.count()
    if n == 0:
        return graph.spark.createDataFrame([], "node long, x double, y double")
    e = (
        graph.sym()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("weight").alias("d"))
        .persist()
    )
    # mean target distance sets the repulsion cell size
    dbar = e.agg(F.avg("d")).collect()[0][0] or 1.0
    pos = (
        init.select("node", "x", "y")
        if init is not None
        else verts.select(
            "node",
            (_unit_random(F.col("node"), seed) * 2 * dbar).alias("x"),
            (_unit_random(F.col("node"), seed + 1) * 2 * dbar).alias("y"),
        )
    ).localCheckpoint(eager=True)
    cell = 2.0 * dbar
    cur_alpha = alpha
    for it in range(max_iter):
        p1 = pos.select(F.col("node").alias("src"), F.col("x").alias("xu"), F.col("y").alias("yu"))
        p2 = pos.select(F.col("node").alias("dst"), F.col("x").alias("xv"), F.col("y").alias("yv"))
        dist = F.sqrt((F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2)
        safe = F.greatest(dist, F.lit(1e-9))
        # attraction: Σ w_uv (x_v + d_uv (x_u − x_v)/||..||), w_uv = 1/d²
        att = (
            e.join(p1, "src").join(p2, "dst")
            .select(
                F.col("src").alias("node"),
                (1.0 / (F.col("d") ** 2)).alias("w"),
                ((F.col("xv") + F.col("d") * (F.col("xu") - F.col("xv")) / safe)
                 / (F.col("d") ** 2)).alias("ax"),
                ((F.col("yv") + F.col("d") * (F.col("yu") - F.col("yv")) / safe)
                 / (F.col("d") ** 2)).alias("ay"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("rho"), F.sum("ax").alias("ax"), F.sum("ay").alias("ay"))
        )
        # entropy repulsion over non-neighbor cell pairs
        c1 = pos.select(
            F.col("node").alias("u"), F.col("x").alias("xu"), F.col("y").alias("yu"),
            F.floor(F.col("x") / cell).alias("cx"), F.floor(F.col("y") / cell).alias("cy"),
        )
        offs = graph.spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
        )
        probe = c1.crossJoin(F.broadcast(offs)).select(
            "u", "xu", "yu",
            (F.col("cx") + F.col("dx")).alias("cx"), (F.col("cy") + F.col("dy")).alias("cy"),
        )
        c2 = pos.select(
            F.col("node").alias("v"), F.col("x").alias("xv"), F.col("y").alias("yv"),
            F.floor(F.col("x") / cell).alias("cx"), F.floor(F.col("y") / cell).alias("cy"),
        )
        nbr = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        rdist = F.sqrt((F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2)
        rsafe = F.greatest(rdist, F.lit(1e-9))
        rep = (
            probe.join(c2, ["cx", "cy"])
            .where(F.col("u") != F.col("v"))
            .join(nbr, ["u", "v"], "left_anti")
            .select(
                F.col("u").alias("node"),
                ((F.col("xu") - F.col("xv")) / rsafe ** (q + 2.0)).alias("rx"),
                ((F.col("yu") - F.col("yv")) / rsafe ** (q + 2.0)).alias("ry"),
            )
            .groupBy("node")
            .agg(F.sum("rx").alias("rx"), F.sum("ry").alias("ry"))
        )
        # truncate_lineage, not bare localCheckpoint: chained local
        # checkpoints degrade superlinearly past ~10 iterations (see
        # graph.truncate_lineage's docstring — measured again here:
        # 1.3 s/iter flat with the parquet reset vs 2×/iter growth)
        pos = truncate_lineage(
            pos.join(att, "node", "left")
            .join(rep, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("rho").isNotNull(),
                    (F.col("ax") + cur_alpha * F.coalesce("rx", F.lit(0.0))) / F.col("rho"),
                ).otherwise(F.col("x")).alias("x"),
                F.when(
                    F.col("rho").isNotNull(),
                    (F.col("ay") + cur_alpha * F.coalesce("ry", F.lit(0.0))) / F.col("rho"),
                ).otherwise(F.col("y")).alias("y"),
            ),
            it,
        )
        cur_alpha = max(cur_alpha * alpha_reduction, final_alpha)
    e.unpersist()
    return pos
