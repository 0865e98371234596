"""Traversal / distance kernels.

- ``BFS(G, source)`` (``cpp/distance/BFS.h:20``): unweighted SSSP —
  iterative frontier semi-joins; returns (node, dist), unreachable nodes
  absent (the reference marks them ∞).
- ``Dijkstra`` (``cpp/distance/Dijkstra.h:21``): weighted SSSP — no
  distributed priority queue; Bellman-Ford-style relax supersteps
  (converges in O(diameter) rounds on positive weights).
- ``Diameter`` bounds via double-sweep (``cpp/distance/Diameter.h:22``
  EstimatedRange mode): BFS from u → farthest w → BFS from w; lower
  bound = ecc(w).
- ``EffectiveDiameterApproximation`` (``cpp/distance/
  EffectiveDiameterApproximation.h:19``): HyperANF-style — per-vertex
  neighborhood-function estimate via iterated HLL register merging; we
  expose the exact small-scale neighborhood function via repeated
  frontier expansion and document the HLL variant as the at-scale path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _bfs_fused_local(graph: EdgeGraph, source: int, max_depth: int | None) -> DataFrame:
    """Small-graph escape hatch (same family as plp/linkpred fused
    paths): every frontier level of the distributed loop is a Spark job
    with a ~0.5 s floor, so a diameter-d BFS pays d job floors for
    microseconds of work on a small store.  One single-task numpy level
    loop instead; distributed loop above $SPARK_GRAFT_FUSED_EDGES."""
    import numpy as np
    import pandas as pd

    src_id = int(source)

    def kernel(batches):
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        s = np.concatenate([b["src"].to_numpy(np.int64) for b in pdfs])
        d = np.concatenate([b["dst"].to_numpy(np.int64) for b in pdfs])
        nodes = np.unique(np.concatenate([s, d]))
        n = len(nodes)
        si, di = np.searchsorted(nodes, s), np.searchsorted(nodes, d)
        order = np.argsort(si, kind="stable")
        s_o, d_o = si[order], di[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, s_o + 1, 1)
        indptr = np.cumsum(indptr)
        pos = np.searchsorted(nodes, src_id)
        if pos >= n or nodes[pos] != src_id:
            yield pd.DataFrame({"node": [src_id], "dist": [0]})
            return
        dist = np.full(n, -1, dtype=np.int64)
        dist[pos] = 0
        frontier = np.array([pos], dtype=np.int64)
        lvl = 0
        while len(frontier):
            lvl += 1
            if max_depth is not None and lvl > max_depth:
                break
            cnt = indptr[frontier + 1] - indptr[frontier]
            total = int(cnt.sum())
            offs = np.cumsum(cnt) - cnt
            flat = np.repeat(indptr[frontier], cnt) + (
                np.arange(total, dtype=np.int64) - np.repeat(offs, cnt)
            )
            nxt = np.unique(d_o[flat])
            nxt = nxt[dist[nxt] < 0]
            dist[nxt] = lvl
            frontier = nxt
        reached = np.flatnonzero(dist >= 0)
        yield pd.DataFrame({"node": nodes[reached], "dist": dist[reached]})

    out = (
        graph.sym()
        .select("src", "dst")
        .coalesce(1)
        .mapInPandas(kernel, "node long, dist long")
    )
    # a source isolated from every edge still reports itself at dist 0
    srcrow = graph.spark.createDataFrame([(src_id, 0)], "node long, dist long")
    return out.unionByName(srcrow).groupBy("node").agg(F.min("dist").alias("dist"))


def bfs(
    graph: EdgeGraph,
    source: int,
    max_depth: int | None = None,
    fused_local: bool | None = None,
) -> DataFrame:
    """(node, dist) — hop distance from source; reachable nodes only."""
    if fused_local is None:
        import os

        fused_local = graph.num_edges() <= int(
            os.environ.get("SPARK_GRAFT_FUSED_EDGES", str(1 << 23))
        ) // 4
    if fused_local:
        return _bfs_fused_local(graph, source, max_depth)
    sym = graph.sym().select("src", "dst").persist()
    dist = graph.spark.createDataFrame([(int(source), 0)], "node long, dist long")
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    d = 0
    while True:
        d += 1
        if max_depth is not None and d > max_depth:
            break
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.count() == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    sym.unpersist()
    return dist


def sssp(graph: EdgeGraph, source: int, max_rounds: int = 64) -> DataFrame:
    """(node, dist) — weighted shortest paths (Bellman-Ford supersteps,
    positive weights; the Dijkstra surface)."""
    sym = graph.sym().persist()
    inf = float("inf")
    dist = graph.vertices().select(
        F.col("id").alias("node"),
        F.when(F.col("id") == source, 0.0).otherwise(F.lit(inf)).alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        cand = (
            sym.join(dist.withColumnRenamed("node", "src").withColumnRenamed("dist", "sdist"), "src")
            .where(F.col("sdist") != inf)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("sdist") + F.col("weight")).alias("cand"))
        )
        new = dist.join(cand, "node", "left").select(
            "node",
            F.least("dist", F.coalesce("cand", "dist")).alias("dist"),
            (F.coalesce("cand", F.lit(inf)) < F.col("dist")).alias("chg"),
        ).localCheckpoint(eager=True)
        changed = new.where("chg").count()
        dist = new.select("node", "dist")
        if changed == 0:
            break
    sym.unpersist()
    return dist.where(F.col("dist") != inf)


def eccentricity(graph: EdgeGraph, source: int) -> int:
    """``Eccentricity`` — max BFS depth from source."""
    d = bfs(graph, source)
    return d.agg(F.max("dist")).collect()[0][0] or 0


def diameter_range(graph: EdgeGraph, start: int | None = None) -> tuple[int, int]:
    """Double-sweep bounds (iFub seed, ``Diameter.h`` EstimatedRange):
    returns (lower, upper) = (ecc(w), 2·ecc(w)) from the double sweep."""
    if start is None:
        start = graph.vertices().agg(F.min("id")).collect()[0][0]
    d1 = bfs(graph, start)
    far = d1.orderBy(F.desc("dist"), F.asc("node")).first()["node"]
    d2 = bfs(graph, far)
    ecc = d2.agg(F.max("dist")).collect()[0][0] or 0
    return ecc, 2 * ecc


def neighborhood_function(graph: EdgeGraph, max_h: int = 8) -> DataFrame:
    """(h, reachable_pairs) — exact N(h) via h-hop frontier closure
    (small graphs / validation).  At 100 TB use the HyperANF form:
    per-vertex HLL registers ORed along edges per superstep
    (``approx_count_distinct``-style union), identical loop structure."""
    sym = graph.sym().select("src", "dst").persist()
    reach = sym.select("src", "dst").unionByName(
        graph.vertices().select(F.col("id").alias("src"), F.col("id").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    rows = [(0, graph.num_nodes()), (1, reach.count())]
    for h in range(2, max_h + 1):
        nxt = (
            reach.join(sym.withColumnRenamed("src", "mid").withColumnRenamed("dst", "nxt"),
                       reach["dst"] == F.col("mid"))
            .select("src", F.col("nxt").alias("dst"))
            .unionByName(reach.select("src", "dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        c = nxt.count()
        rows.append((h, c))
        if c == rows[-2][1]:
            break
        reach = nxt
    sym.unpersist()
    return graph.spark.createDataFrame(rows, "h int, reachable_pairs long")


def volume(
    graph: EdgeGraph,
    r: float,
    samples: int = 500,
    seed: int = 42,
    sources: list | None = None,
) -> float:
    """``Volume::volume`` (``cpp/distance/Volume.cpp:40-46``): the mean
    number of nodes within weighted distance ``r`` of a sampled node
    (the sampled node itself included, distance 0).  Sampling uses the
    engine's deterministic hash order (``GraphTools::randomNode``
    analog); pass ``sources`` to pin the sample (oracle-testable).

    All samples expand together: one (source, node, dist) bounded
    multi-source relax — the same superstep shape as ``apsp_state``
    with an r-radius cut, so the cost is O(vol(balls)), not O(n·m)."""
    from networkit_spark.graph import random_nodes

    if sources is None:
        sources = random_nodes(graph, k=samples, seed=seed)
    if not sources:
        return 0.0
    spark = graph.spark
    sym = graph.sym().persist()
    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "src long, dst long, dist double"
    ).localCheckpoint(eager=True)
    frontier = dist
    for rnd in range(512):
        hop = sym.select(F.col("src").alias("dst"), F.col("dst").alias("nxt"), "weight")
        cand = (
            frontier.join(hop, "dst")
            .select("src", F.col("nxt").alias("dst"), (F.col("dist") + F.col("weight")).alias("cand"))
            .where(F.col("cand") <= r)
            .groupBy("src", "dst")
            .agg(F.min("cand").alias("cand"))
        )
        merged = dist.join(cand, ["src", "dst"], "full_outer").select(
            "src", "dst",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("dist"),
            (
                F.coalesce("cand", F.lit(float("inf")))
                < F.coalesce("dist", F.lit(float("inf")))
            ).alias("chg"),
        ).localCheckpoint(eager=True)
        frontier = merged.where("chg").select("src", "dst", "dist")
        dist = merged.select("src", "dst", "dist")
        if frontier.limit(1).count() == 0:
            break
    sym.unpersist()
    total = dist.count()
    return total / len(sources)


def incomplete_dijkstra(
    graph: EdgeGraph,
    sources: list[int],
    max_dist: float,
    max_rounds: int = 64,
) -> DataFrame:
    """``IncompleteDijkstra`` (``cpp/distance/IncompleteDijkstra.h:27``,
    via ``IncompleteSSSP``): multi-source weighted shortest paths
    EXPLORED ONLY within ``max_dist`` — the pruning is the point (the
    reference pops the heap until dist ≥ bound).  Spark shape: the same
    Bellman-Ford relax supersteps as :func:`sssp`, but candidates at or
    beyond the bound are dropped BEFORE the next gather, so the frontier
    (and the join) stays proportional to the ball volume, not the
    graph.  Returns (node, dist) with dist < max_dist."""
    sym = graph.sym().persist()
    src = graph.spark.createDataFrame(
        [(int(s), 0.0) for s in sources], "node long, dist double"
    )
    dist = src.groupBy("node").agg(F.min("dist").alias("dist"))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            sym.join(
                frontier.withColumnRenamed("node", "src").withColumnRenamed(
                    "dist", "sdist"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("sdist") + F.col("weight")).alias("cand"))
            .where(F.col("cand") < max_dist)  # the incomplete-SSSP prune
        )
        merged = (
            dist.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.coalesce("cand", F.lit(float("inf")))
                    < F.coalesce("dist", F.lit(float("inf")))
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.where("chg").select("node", "dist")
        dist = merged.select("node", "dist")
        if frontier.count() == 0:
            break
    sym.unpersist()
    return dist


def all_simple_paths(
    graph: EdgeGraph,
    source: int,
    target: int,
    cutoff: int,
) -> DataFrame:
    """``AllSimplePaths`` (``cpp/distance/AllSimplePaths.h:21``):
    enumerate every simple path source→target of length ≤ ``cutoff``
    (the reference's directed unweighted semantics; undirected graphs
    walk the symmetrized adjacency).  Spark shape: breadth-synchronous
    path extension — each round joins live partial paths against the
    adjacency and drops revisits (``array_contains``), so the work
    distributes over the path population (which is worst-case
    exponential — ``cutoff`` is mandatory, as in the reference, where
    ``none`` means unbounded only for DAG-ish inputs).  Returns one row
    per path: (path array<long>, length)."""
    if cutoff < 1:
        raise ValueError("cutoff must be >= 1")
    sym = graph.sym().select("src", "dst").persist()
    live = graph.spark.createDataFrame(
        [([int(source)],)], "path array<long>"
    )
    done = None
    for _ in range(cutoff):
        ext = (
            live.withColumn("src", F.element_at("path", -1))
            .join(sym, "src")
            .where(~F.array_contains("path", F.col("dst")))
            .select(F.concat("path", F.array("dst")).alias("path"))
        )
        ext = ext.localCheckpoint(eager=True)
        hit = ext.where(F.element_at("path", -1) == target)
        done = hit if done is None else done.unionByName(hit)
        live = ext.where(F.element_at("path", -1) != target)
        if live.count() == 0:
            break
    sym.unpersist()
    out = done if done is not None else live.limit(0)
    return out.select("path", (F.size("path") - 1).alias("length"))


def dfs_from(graph: EdgeGraph, source: int) -> DataFrame:
    """``Graph.DFSfrom/DFSEdgesFrom`` (pyx:1198-1269): depth-first visit
    order + tree parent from ``source``.  DFS has no data-parallel
    analog (each step depends on the full visited set), so — like the
    reference, whose DFSfrom is a sequential stack walk — the traversal
    runs driver-side over the source's component (gathered with one
    distributed reachability pass + one collect; documented bound, same
    class as EdmondsKarp/CutClustering).  Neighbors are visited in
    ascending id (the reference visits adjacency order; ours is the
    canonical deterministic order).  Returns (node, ord, parent),
    parent NULL at the source."""
    reach = bfs(graph, source).select("node")
    rows = (
        graph.sym()
        .join(reach.withColumnRenamed("node", "src"), "src")
        .select("src", "dst")
        .collect()
    )
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
    for v in adj:
        # reverse-sorted: the stack pops the SMALLEST neighbor first
        adj[v].sort(reverse=True)
    order: list[tuple[int, int, int | None]] = []
    seen: set[int] = set()
    stack: list[tuple[int, int | None]] = [(int(source), None)]
    # mark at POP time so the order matches the recursive preorder
    while stack:
        u, par = stack.pop()
        if u in seen:
            continue
        seen.add(u)
        order.append((u, len(order), par))
        for w in adj.get(u, []):
            if w not in seen:
                stack.append((w, u))
    return graph.spark.createDataFrame(
        order, "node long, ord long, parent long"
    )


def reverse_bfs(graph: EdgeGraph, source: int, max_depth: int | None = None) -> DataFrame:
    """``ReverseBFS`` (``cpp/distance/ReverseBFS.h``): hop distances TO
    ``source`` — a BFS over the transposed edge relation.  Undirected
    graphs: identical to ``bfs``."""
    if not graph.directed:
        return bfs(graph, source, max_depth=max_depth)
    t = EdgeGraph(
        graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        ),
        directed=True,
        weighted=graph.weighted,
    )
    return bfs(t, source, max_depth=max_depth)


def _keyed_bfs(sym: DataFrame, sources: list[int]) -> DataFrame:
    """(s, node, dist) for every source — all wavefronts advance in ONE
    superstep loop (frontier keyed by (s, node); one edge join + one
    distinct per hop)."""
    spark = sym.sparkSession
    cur = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sorted(set(sources))],
        "s long, node long, dist int",
    ).localCheckpoint(eager=True)
    out, d = cur, 0
    while True:
        d += 1
        nxt = (
            sym.join(cur.withColumnRenamed("node", "src"), "src")
            .select("s", F.col("dst").alias("node"))
            .distinct()
            .join(out.select("s", "node"), ["s", "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return out
        out = out.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt


def neighborhood_function_heuristic(
    graph: EdgeGraph,
    nsamples: int = 0,
    strategy: str = "split",
    seed: int = 42,
) -> DataFrame:
    """(h, reachable_pairs) — sampled neighborhood function
    (``cpp/distance/NeighborhoodFunctionHeuristic.cpp:33-104``).

    ``nsamples`` BFS runs scaled by n/samples (0 → max(√m, 0.15·n), the
    reference default); cumulative over h with the reference's exact
    anchors N(1) = 2m and N(diameter) = n·(n−1).  All sampled BFS
    wavefronts run in ONE keyed superstep loop.  Strategies: ``random``
    (hash-seeded) or ``split`` — the reference picks every
    (n/samples)-th node of the degree-sorted node list; here each
    degree-quantile band contributes its smallest node (same
    spread-over-the-degree-distribution intent, no global sorted index
    needed — a groupBy instead of a total order).
    """
    from networkit_spark.graph import random_nodes

    n = graph.num_nodes()
    m = graph.num_edges()
    if nsamples <= 0:
        nsamples = max(int(math.sqrt(m)), int(0.15 * n))
    nsamples = max(1, min(nsamples, n))
    if strategy == "random":
        sources = random_nodes(graph, k=nsamples, seed=seed)
    elif strategy == "split":
        degs = graph.degrees().select("node", "deg")
        qs = [i / nsamples for i in range(nsamples)]
        bounds = degs.approxQuantile("deg", qs, 0.01)
        cond = F.lit(0)
        for b in sorted(set(bounds)):
            cond = cond + (F.col("deg") >= F.lit(float(b))).cast("int")
        picked = (
            degs.withColumn("band", cond)
            .groupBy("band")
            .agg(F.min("node").alias("node"))
            .collect()
        )
        sources = [int(r["node"]) for r in picked][:nsamples]
    else:
        raise ValueError("unknown strategy, choose either split or random")

    sym = graph.sym().select("src", "dst").persist()
    dists = _keyed_bfs(sym, sources)
    counts = {
        int(r["dist"]): int(r["c"])
        for r in dists.where(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    sym.unpersist()
    dia = max(counts) if counts else 1
    norm = n / float(len(sources))
    rows: list[tuple[int, int]] = []
    acc = 0
    for h in range(1, dia + 1):
        if h == 1:
            acc = 2 * m if not graph.directed else m
        elif h == dia and dia > 1:
            acc = n * (n - 1)
        else:
            acc += int(round(counts.get(h, 0) * norm))
        rows.append((h, acc))
    return graph.spark.createDataFrame(rows, "h int, reachable_pairs long")


def diameter_exact(
    graph: EdgeGraph, error: float = 0.0, max_bfs: int | None = None
) -> tuple[int, int]:
    """(lower, upper) diameter bounds — the exactSumSweep loop
    (``cpp/distance/Diameter.cpp:81-229``, Borassi et al.); error=0 runs
    until the bounds MEET, i.e. the exact diameter
    (``Diameter::exactDiameter``).  Unweighted undirected graphs, like
    the reference.

    Spark shape: per round ONE keyed multi-source BFS (a start node per
    component — every component's wavefront advances in the same
    superstep loop), then the reference's per-node eccentricity bound
    updates as one join + aggregate; start-node selection is a
    per-component ``max_by`` aggregate (even rounds: largest
    (ecc_ub, dist); odd rounds: the reference's central-but-far
    heuristic).  Rounds are adaptive — typically a handful of BFS on
    real-world graphs.

    Distances are HOPS (the reference rejects weighted graphs; here the
    weight column is simply ignored, matching ``bfs`` and
    ``diameter_range``)."""
    if graph.directed:
        raise ValueError("diameter_exact: undirected graphs only")
    from networkit_spark.operators.components import connected_components

    spark = graph.spark
    n = graph.num_nodes()
    if n == 0:
        return (0, 0)
    comp = connected_components(graph, impl="sql").select(
        "node", F.col("label").alias("comp")
    )
    deg = graph.degrees().select("node", "deg")
    sym = graph.sym().select("src", "dst").persist()

    state = (
        comp.join(deg, "node")
        .select(
            "node", "comp", "deg",
            F.lit(0).alias("ecc_lb"), F.lit(int(n)).alias("ecc_ub"),
        )
        .localCheckpoint(eager=True)
    )

    # first start nodes: per component, max degree (ties: larger node —
    # the reference keeps the LAST max-degree node in id order)
    starts = [
        r["s"]
        for r in state.groupBy("comp")
        .agg(F.expr("max_by(node, struct(deg, node))").alias("s"))
        .collect()
    ]

    lb, ub = 0, n
    budget = max_bfs if max_bfs is not None else 2 * n
    dist_first = {}
    for i in range(budget):
        kd = _keyed_bfs(sym, starts)  # (s, node, dist)
        d = kd.join(
            state.select("node", "comp", "deg"), "node"
        ).select("comp", "node", "dist", "deg")
        ca = (
            d.groupBy("comp")
            .agg(
                F.max("dist").alias("ecc_c"),
                F.min(F.when(F.col("deg") > 1, F.col("dist"))).alias("dist_first"),
            )
            .select(
                "comp", "ecc_c",
                F.coalesce("dist_first", F.lit(0)).alias("dist_first"),
            )
        )
        state = (
            state.select("node", "comp", "deg", "ecc_lb", "ecc_ub")
            .join(d.select("node", "dist"), "node")
            .join(F.broadcast(ca), "comp")
            .select(
                "node", "comp", "deg", "dist", "dist_first",
                F.greatest(
                    "ecc_lb", F.greatest("dist", F.col("ecc_c") - F.col("dist"))
                ).alias("ecc_lb"),
                F.when(
                    F.col("dist") <= F.col("dist_first"),
                    F.greatest("dist", F.col("ecc_c") - F.col("dist")),
                )
                .otherwise(
                    F.least(
                        "ecc_ub",
                        F.col("dist") + F.col("ecc_c") - 2 * F.col("dist_first"),
                    )
                )
                .alias("ecc_ub"),
            )
            .localCheckpoint(eager=True)
        )
        row = state.agg(
            F.max("ecc_lb").alias("lb"), F.max("ecc_ub").alias("ub")
        ).collect()[0]
        lb, ub = int(row["lb"]), int(row["ub"])
        if ub <= lb + error * lb:
            break
        if i % 2 == 0:
            sel = state.groupBy("comp").agg(
                F.expr("max_by(node, struct(ecc_ub, dist))").alias("s")
            )
        else:
            # central (small ecc_lb + dist) but beyond dist_first; among
            # equals the farthest from the previous start
            eligible = state.where(F.col("dist") > F.col("dist_first"))
            fallback = state.groupBy("comp").agg(F.min("node").alias("fb"))
            sel = (
                eligible.groupBy("comp")
                .agg(
                    F.expr(
                        "min_by(node, struct(ecc_lb + dist, -dist, node))"
                    ).alias("s")
                )
                .join(fallback, "comp", "right")
                .select("comp", F.coalesce("s", F.col("fb")).alias("s"))
            )
        starts = [r["s"] for r in sel.collect()]
    sym.unpersist()
    return (lb, ub)
