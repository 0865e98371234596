"""Closeness / harmonic centrality — BFS aggregation.

Reference: ``Closeness`` / ``HarmonicCloseness`` + ``TopCloseness``
(pruned-bound top-k, ``cpp/centrality/TopCloseness.cpp``).  The engine's
scale strategy (SURVEY.md §2.6) is full scores + ``limit(k)`` for exact
small graphs, and sampled estimates (Eppstein-Wang style: mean distance
from k sampled sources) for large ones — each source is one BFS
superstep sequence, embarrassingly parallel across sources.

closeness(v) = (n-1) / Σ_u d(v,u)   (0 for isolated; component-local n
              when the graph is disconnected, per the reference's
              variant with ``checkConnectedness`` off)
harmonic(v)  = Σ_u 1/d(v,u)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.bfs import bfs


def _sources_sample(graph: EdgeGraph, nsamples: int | None) -> list[int]:
    """Deterministic sample of BFS sources.  The sampled path collects
    only the k chosen ids — the md5 ranking runs distributed as a
    TakeOrdered (ORDER BY md5 LIMIT k), never materializing the node
    set on the driver.  Exhaustive mode (nsamples=None) collects all
    ids because the per-source driver loop needs them (fixture scale)."""
    if nsamples is None or nsamples >= graph.num_nodes():
        return [r["id"] for r in graph.vertices().orderBy("id").collect()]
    picked = (
        graph.vertices()
        .orderBy(F.md5(F.concat(F.lit("cl:"), F.col("id").cast("string"))))
        .limit(nsamples)
        .collect()
    )
    return [r["id"] for r in picked]


def closeness(
    graph: EdgeGraph, nsamples: int | None = None, harmonic: bool = False
) -> DataFrame:
    """(node, score).  Exact when nsamples is None (n BFS — fixture
    scale); otherwise the sampled estimator (distances measured FROM the
    sampled sources; by symmetry of undirected BFS these are distances
    TO every node, scaled by n/k)."""
    sources = _sources_sample(graph, nsamples)
    n = graph.num_nodes()
    total = None
    for s in sources:
        d = bfs(graph, s).where(F.col("node") != s)
        part = d.select(
            "node",
            (1.0 / F.col("dist")).alias("h") if harmonic else F.col("dist").cast("double").alias("h"),
        )
        total = part if total is None else (
            total.unionByName(part).groupBy("node").agg(F.sum("h").alias("h"))
        )
        total = total.localCheckpoint(eager=True)
    scale = n / len(sources)
    if harmonic:
        out_score = F.coalesce("h", F.lit(0.0)) * scale
    else:
        # closeness: (n-1) / (scaled distance sum); unreached → 0
        out_score = F.when(
            F.coalesce("h", F.lit(0.0)) > 0, (n - 1) / (F.col("h") * scale)
        ).otherwise(F.lit(0.0))
    return (
        graph.vertices()
        .join(total, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), out_score.alias("score"))
    )


def top_closeness(graph: EdgeGraph, k: int = 10, nsamples: int | None = None) -> DataFrame:
    """TopCloseness surface: full (or sampled) scores + deterministic
    top-k (score desc, node asc)."""
    return (
        closeness(graph, nsamples=nsamples)
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
    )


def top_closeness_pruned(
    graph: EdgeGraph,
    k: int = 10,
    batch_size: int = 256,
    max_rounds: int = 64,
    stats: dict | None = None,
    harmonic: bool = False,
) -> DataFrame:
    """Exact top-k closeness via the reference's pruned-bound BFScut
    (``cpp/centrality/TopCloseness.cpp``, BFScut/BFSbound family),
    re-expressed as a keyed level-synchronous multi-source BFS with a
    per-level DROP of dominated sources:

    - sources run in degree-descending batches (likely winners first, so
      the k-th-best score rises early and prunes harder — the
      reference's degree-order heuristic);
    - after BFS level l, source s has reached r nodes with distance sum
      S; its remaining ``nc − r`` reachable nodes (nc = s's connected-
      component size, precomputed — the reference's reachability
      bound) sit at distance ≥ l+1, so
      ``closeness(s) ≤ (n−1)/(S + (nc−r)(l+1))``.  A source whose bound
      falls strictly below the current k-th finalized score leaves the
      frontier AND the distance state — its remaining BFS work is never
      scheduled;
    - a source whose frontier empties finalizes exactly:
      ``(n−1)/S`` (0 when S = 0), identical to :func:`closeness`.

    Result ≡ ``top_closeness(graph, k)`` (pytest-asserted), with the
    per-level collect bounded by the batch size (a few scalar aggregates
    per source).  ``stats`` (optional dict) receives ``expanded`` (sum
    of frontier sizes actually processed) vs ``full`` (Σ component
    sizes = the exhaustive algorithm's visit count) for the measured
    work reduction.

    ``harmonic=True`` ranks by harmonic closeness instead
    (``TopHarmonicCloseness.cpp``, same bound structure): with H the
    partial Σ 1/d over reached nodes, the remaining ``nc − r`` nodes
    contribute at most ``(nc − r)/(l+1)``, so
    ``harmonic(s) ≤ H + (nc−r)/(l+1)`` — result ≡
    ``closeness(harmonic=True)`` top-k."""
    from networkit_spark.operators.components import connected_components

    spark = graph.spark
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "node long, score double")
    sym = graph.sym().select("src", "dst").persist()
    comp = connected_components(graph, impl="sql")
    nc = (
        comp.join(
            comp.groupBy("label").agg(F.count(F.lit(1)).alias("nc")), "label"
        )
        .select("node", "nc")
    )
    order = (
        graph.degrees()
        .join(nc, "node")
        .orderBy(F.desc("deg"), F.asc("node"))
        .select("node", "nc")
        .collect()
    )
    if stats is not None:
        stats["expanded"] = 0
        stats["full"] = int(sum(r["nc"] for r in order))
    best: list[tuple[float, int]] = []  # (score, node) finalized

    def kth_score() -> float:
        if len(best) < k:
            return float("-inf")
        return sorted(best, key=lambda t: (-t[0], t[1]))[k - 1][0]

    for lo in range(0, len(order), batch_size):
        chunk = order[lo : lo + batch_size]
        nc_of = {int(r["node"]): int(r["nc"]) for r in chunk}
        active = dict(nc_of)  # source -> nc
        dist = spark.createDataFrame(
            [(s, s, 0) for s in active], "s long, node long, dist long"
        ).localCheckpoint(eager=True)
        frontier = dist
        S = {s: 0 for s in active}
        H = {s: 0.0 for s in active}
        r = {s: 1 for s in active}
        level = 0
        while active and level < max_rounds:
            level += 1
            cand = (
                sym.join(frontier.select("s", F.col("node").alias("src")), "src")
                .select("s", F.col("dst").alias("node"))
                .distinct()
                .join(dist, ["s", "node"], "left_anti")
                .withColumn("dist", F.lit(level).cast("long"))
                .localCheckpoint(eager=True)
            )
            grown = {
                int(row["s"]): int(row["f"])
                for row in cand.groupBy("s").agg(F.count(F.lit(1)).alias("f")).collect()
            }
            if stats is not None:
                stats["expanded"] += sum(grown.values())
            kth = kth_score()

            def _final(s):
                if harmonic:
                    return H[s]
                return (n - 1) / S[s] if S[s] > 0 else 0.0

            done, pruned = [], []
            for s in list(active):
                f = grown.get(s, 0)
                S[s] += f * level
                H[s] += f / level
                r[s] += f
                if f == 0:  # BFS exhausted: exact
                    best.append((_final(s), s))
                    done.append(s)
                    continue
                rem = active[s] - r[s]
                if harmonic:
                    bound = H[s] + rem / (level + 1)
                else:
                    bound = (
                        (n - 1) / (S[s] + rem * (level + 1))
                        if (S[s] + rem) > 0
                        else 0.0
                    )
                if rem == 0:
                    # component fully reached mid-frontier bookkeeping
                    best.append((_final(s), s))
                    done.append(s)
                elif bound < kth:
                    pruned.append(s)
            for s in done + pruned:
                active.pop(s, None)
            if not active:
                break
            dropped = set(done + pruned)
            if dropped:
                keep = spark.createDataFrame(
                    [(s,) for s in active], "s long"
                )
                dist = dist.join(F.broadcast(keep), "s", "leftsemi")
                cand = cand.join(F.broadcast(keep), "s", "leftsemi")
            dist = dist.unionByName(cand).localCheckpoint(eager=True)
            frontier = cand
        # sources still active at max_rounds: finalize with what they have
        for s in list(active):
            best.append((_final(s), s))
    top = sorted(best, key=lambda t: (-t[0], t[1]))[:k]
    sym.unpersist()
    return spark.createDataFrame(
        [(int(node), float(score)) for score, node in top], "node long, score double"
    )


def _keyed_sssp(sym: DataFrame, sources: list[int], max_rounds: int = 64) -> DataFrame:
    """(s, node, dist) — weighted multi-source distances, all sources'
    Bellman-Ford relaxations advancing in ONE superstep loop (keyed by
    (s, node), like :func:`~networkit_spark.operators.bfs._keyed_bfs`
    but carrying weighted distances)."""
    spark = sym.sparkSession
    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sorted(set(sources))],
        "s long, node long, dist double",
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            sym.join(
                frontier.select("s", F.col("node").alias("src"), "dist"), "src"
            )
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = (
            dist.join(cand, ["s", "node"], "full")
            .select(
                "s",
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
        frontier = merged.where("chg").select("s", "node", "dist")
        dist = merged.select("s", "node", "dist")
        if frontier.limit(1).count() == 0:
            break
    return dist


def approx_closeness(
    graph: EdgeGraph,
    nsamples: int = 64,
    epsilon: float = 0.1,
    normalized: bool = False,
    seed: int = 42,
) -> DataFrame:
    """(node, score, sqerr) — ``ApproxCloseness`` (``cpp/centrality/
    ApproxCloseness.cpp:64-117,266-365``, the Cohen-Delling-Pajor-Werneck
    pivot estimator) for UNDIRECTED graphs.

    Machinery, re-expressed as joins over the (sample, node, dist) table
    from one keyed multi-source BFS/SSSP:

    * pivot c(u) = nearest sample, δ_u = d(u, c(u)) — one min-struct
      aggregate (the reference's multi-source Dijkstra Voronoi;
      deviation: ties break on smallest sample id, the reference
      inherits an arbitrary propagation order);
    * per (node u, sample i): LC iff d(i,u) ≤ δ_u(1/ε − 1) or
      d(i, c(u)) ≤ δ_u/ε, else HC (``runOnPivot``'s direct + deferred
      classification) — LCSum/LCNum/LCSumSQ/HCSum/HCSumSQErr are one
      groupBy over that table;
    * HSum[u]/HNum[u] = Σ/count of δ_v over CELL-mates v with
      δ_v > δ_u/ε (``runOnPivot``'s threshold bins + tail sums) — a
      per-(cell, distance-level) suffix-sum window joined back by an
      as-of join on the level table (levels ≤ eccentricity for hop
      distances, so the join side is small);
    * sampled nodes get their exact closeness (their BFS is on hand);
      non-sampled: score = 1/(HSum + HCSum + LCSum/p) with
      p = LCNum/LNum, LNum = n−1−HNum−k+LCNum, times (n−1) when
      ``normalized`` — and ``sqerr`` is ``getSquareErrorEstimates``'s
      per-node variance estimate.

    Directed graphs: the reference's directed path is a sequentially
    PRUNED per-node BFS sweep (its per-node stop condition couples the
    runs — ``computeClosenessForDirectedUnweightedGraph``); use
    :func:`closeness` with ``nsamples`` for directed estimates instead.
    Like the reference, n is the GLOBAL node count — on disconnected
    graphs the far-set extrapolation assumes one component."""
    from pyspark.sql.window import Window

    from networkit_spark.graph import random_nodes
    from networkit_spark.operators.bfs import _keyed_bfs

    if graph.directed:
        raise ValueError(
            "approx_closeness implements the undirected pivot estimator; "
            "use closeness(nsamples=...) for directed graphs"
        )
    if epsilon < 0:
        raise ValueError("epsilon must be >= 0")
    n = graph.num_nodes()
    k = min(nsamples, n)
    samples = random_nodes(graph, k=k, seed=seed)
    sym = graph.sym().persist()
    if graph.weighted:
        sd = _keyed_sssp(sym, samples)
    else:
        sd = _keyed_bfs(sym.select("src", "dst"), samples).select(
            "s", "node", F.col("dist").cast("double").alias("dist")
        )
    sd = sd.persist()

    # pivot Voronoi: δ_u and c(u)
    piv = (
        sd.groupBy("node")
        .agg(F.min(F.struct("dist", "s")).alias("m"))
        .select("node", F.col("m.dist").alias("delta"), F.col("m.s").alias("pivot"))
        .localCheckpoint(eager=True)
    )
    sample_set = {int(s) for s in samples}
    is_sample = F.col("node").isin(sample_set)

    # exact closeness for the sampled nodes themselves
    sample_scores = sd.groupBy(F.col("s").alias("node")).agg(
        F.sum("dist").alias("raw")
    )

    # classification table: one row per (non-sample node u, sample i),
    # carrying d(i,u), δ_u, c(u), and d(i, c(u))
    dpc = sd.select("s", F.col("node").alias("pivot"), F.col("dist").alias("dpc"))
    cls = (
        sd.where(~is_sample)
        .join(piv, "node")
        .join(dpc, ["s", "pivot"])
    )
    big = F.lit(float("inf"))
    inv_eps = F.lit(1.0 / epsilon) if epsilon > 0 else big
    lc = (
        (F.lit(epsilon) == 0.0)
        | (F.col("dist") <= F.col("delta") * (inv_eps - 1.0))
        | (F.col("dpc") <= F.col("delta") * inv_eps)
    )
    agg = cls.groupBy("node").agg(
        F.sum(F.when(lc, F.col("dist")).otherwise(0.0)).alias("lcsum"),
        F.sum(F.when(lc, 1).otherwise(0)).alias("lcnum"),
        F.sum(F.when(lc, F.col("dist") * F.col("dist")).otherwise(0.0)).alias("lcsumsq"),
        F.sum(F.when(~lc, F.col("dist")).otherwise(0.0)).alias("hcsum"),
        F.sum(
            F.when(~lc, (F.col("dist") - F.col("dpc")) * (F.col("dist") - F.col("dpc")))
            .otherwise(0.0)
        ).alias("hcsqerr"),
        F.sum(F.when(~lc, 1).otherwise(0)).alias("hcnum"),
    )

    # HSum/HNum: per pivot cell, suffix sums of δ over distance levels
    if epsilon > 0:
        cell = piv.where(~is_sample)  # samples are their own pivots, excluded
        levels = cell.groupBy("pivot", F.col("delta").alias("lvl")).agg(
            F.sum("delta").alias("lsum"), F.count(F.lit(1)).alias("lcnt")
        )
        w = Window.partitionBy("pivot").orderBy(F.desc("lvl")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        suffix = levels.select(
            "pivot", "lvl", F.sum("lsum").over(w).alias("ssum"), F.sum("lcnt").over(w).alias("scnt")
        )
        hs = (
            cell.join(suffix, "pivot")
            .where(F.col("lvl") > F.col("delta") * inv_eps)
            .groupBy("node")
            .agg(F.min(F.struct("lvl", "ssum", "scnt")).alias("m"))
            .select("node", F.col("m.ssum").alias("hsum"), F.col("m.scnt").alias("hnum"))
        )
    else:
        hs = graph.spark.createDataFrame([], "node long, hsum double, hnum long")

    est = (
        agg.join(hs, "node", "left")
        .select(
            "node",
            "lcsum", "lcnum", "lcsumsq", "hcsum", "hcsqerr", "hcnum",
            F.coalesce("hsum", F.lit(0.0)).alias("hsum"),
            F.coalesce("hnum", F.lit(0)).alias("hnum"),
        )
        .withColumn("lnum", F.lit(n - 1) - F.col("hnum") - F.lit(k) + F.col("lcnum"))
        .withColumn(
            "raw",
            F.when(
                (F.col("lcnum") > 0) & (F.col("lnum") > 0),
                F.col("hsum") + F.col("hcsum")
                + F.col("lcsum") * F.col("lnum") / F.col("lcnum"),
            ),
        )
        .withColumn(
            "sqerr",
            F.when(
                F.col("lcnum") > 0,
                (
                    F.col("lcsumsq") / F.col("lcnum")
                    - (F.col("lcsum") / F.col("lcnum")) * (F.col("lcsum") / F.col("lcnum"))
                )
                / F.col("lcnum")
                * F.col("lnum")
                + F.when(
                    F.col("hcnum") > 0,
                    F.col("hcsqerr") / F.col("hcnum") * F.col("hnum"),
                ).otherwise(0.0),
            ).otherwise(0.0),
        )
        .select("node", "raw", "sqerr")
    )

    numer = F.lit(float(n - 1)) if normalized else F.lit(1.0)
    nonsample = est.select(
        "node",
        F.when(F.coalesce("raw", F.lit(0.0)) > 0, numer / F.col("raw"))
        .otherwise(0.0)
        .alias("score"),
        "sqerr",
    )
    sampled = sample_scores.where(F.col("node").isin(sample_set)).select(
        "node",
        F.when(F.col("raw") > 0, numer / F.col("raw")).otherwise(0.0).alias("score"),
        F.lit(0.0).alias("sqerr"),
    )
    out = (
        graph.vertices()
        .join(nonsample.unionByName(sampled), F.col("id") == F.col("node"), "left")
        .select(
            F.col("id").alias("node"),
            F.coalesce("score", F.lit(0.0)).alias("score"),
            F.coalesce("sqerr", F.lit(0.0)).alias("sqerr"),
        )
        .localCheckpoint(eager=True)
    )
    sd.unpersist()
    sym.unpersist()
    return out
