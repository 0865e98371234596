"""Sampling-based centralities with error guarantees — SURVEY §2.8
rows promoted from non-goals: ``ApproxBetweenness``
(``cpp/centrality/ApproxBetweenness.cpp:25-90``, Riondato–Kornaropoulos)
and ``KPathCentrality`` (``cpp/centrality/KPathCentrality.cpp:17-104``).

ApproxBetweenness: the reference samples r = ⌈(c/ε²)(⌊log2(vd−2)⌋ + 1 −
ln δ)⌉ (s,t) pairs and ONE random shortest path each; a node scores the
fraction of sampled paths through it (normalized betweenness, ±ε with
probability 1−δ).  Spark variant: instead of sampling one path per
pair, we add each node's EXACT conditional path probability
σ_s(v)·σ_t(v)/σ_st for v on the s–t shortest-path DAG
(Rao–Blackwellized estimator — same expectation, never higher variance,
so the reference's Hoeffding bound still holds; values stay in [0,1]).
The probability is two sigma-BFS sweeps + one join per sample — no
sequential path walk, every step a frontier join.

KPathCentrality: t = 2k²·n^(1−2α)·ln n random simple walks of
hash-drawn length ℓ ∈ [1,k]; every stepped-on node counts once per
walk; score = k·n·counter/t (the reference's scaling).  Walks are
independent rows — each round extends the whole walk population with
one adjacency join; the per-walk neighbor draw is a hash argmin
(weighted graphs: exponential race with rate 1/w, matching the
reference's 1/ew proposal weights).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import EdgeGraph, random_nodes


def _sigma_bfs(sym: DataFrame, source: int) -> DataFrame:
    """(node, dist, sigma): hop distance and shortest-path counts."""
    spark = sym.sparkSession
    cur = spark.createDataFrame(
        [(int(source), 0, 1.0)], "node long, dist int, sigma double"
    ).localCheckpoint(eager=True)
    out = cur
    d = 0
    while True:
        d += 1
        nxt = (
            sym.join(cur.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(out.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .select("node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return out
        out = out.unionByName(nxt).localCheckpoint(eager=True)
        cur = nxt


def approx_betweenness(
    graph: EdgeGraph,
    epsilon: float = 0.2,
    delta: float = 0.1,
    universal_constant: float = 1.0,
    max_samples: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(node, score) — normalized betweenness within ±ε of the true
    value w.p. ≥ 1−δ (``ApproxBetweenness.cpp:47`` sample bound).  The
    vertex-diameter estimate is the double-sweep upper bound.
    ``max_samples`` caps r for harness runs (the guarantee then holds
    for the implied larger ε)."""
    from networkit_spark.operators.bfs import diameter_range

    sym = graph.sym().select("src", "dst").persist()
    # the t-side sweep needs distances INTO t — on directed graphs that
    # is a BFS over transposed edges (undirected: same relation)
    tsym = (
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if graph.directed
        else sym
    )
    vertices = graph.vertices().persist()
    lo, hi = diameter_range(graph)
    vd = max(hi + 1, 3)
    r = math.ceil(
        (universal_constant / (epsilon * epsilon))
        * (math.floor(math.log2(max(vd - 2, 2))) + 1 - math.log(delta))
    )
    if max_samples is not None:
        r = min(r, max_samples)
    # r (s,t) pairs WITH replacement, as the reference samples: a hash
    # of the sample index picks from a base pool of min(2r, n) distinct
    # nodes (the pool itself is a distributed TakeOrdered).
    import hashlib

    base = random_nodes(graph, k=min(2 * r, graph.num_nodes()), seed=seed)

    def _pick(tag: str, i: int) -> int:
        h = hashlib.md5(f"{seed}:{tag}:{i}".encode()).hexdigest()
        return base[int(h, 16) % len(base)]

    pairs = [(_pick("s", i), _pick("t", i)) for i in range(r)]
    total = None
    used = 0
    for s, t in pairs:
        if s == t:
            continue
        fs = _sigma_bfs(sym, s)
        ft = _sigma_bfs(tsym, t)
        dst_row = fs.where(F.col("node") == t).collect()
        used += 1
        if not dst_row:
            continue  # unreachable pair contributes nothing (ref: resamples)
        d_st, sigma_st = dst_row[0]["dist"], dst_row[0]["sigma"]
        contrib = (
            fs.alias("a")
            .join(ft.alias("b"), "node")
            .where(
                (F.col("a.dist") + F.col("b.dist") == d_st)
                & (F.col("node") != s)
                & (F.col("node") != t)
            )
            .select(
                "node",
                (F.col("a.sigma") * F.col("b.sigma") / F.lit(sigma_st)).alias("p"),
            )
        )
        total = contrib if total is None else (
            total.unionByName(contrib)
            .groupBy("node")
            .agg(F.sum("p").alias("p"))
        )
        total = total.localCheckpoint(eager=True)
    denom = max(used, 1)
    out = vertices.join(
        total if total is not None else vertices.limit(0).select(
            F.col("id").alias("node"), F.lit(0.0).alias("p")
        ),
        vertices["id"] == F.col("node"),
        "left",
    ).select(
        vertices["id"].alias("node"),
        (F.coalesce("p", F.lit(0.0)) / denom).alias("score"),
    )
    sym.unpersist()
    vertices.unpersist()
    return out


def k_path_centrality(
    graph: EdgeGraph,
    alpha: float = 0.2,
    k: int = 0,
    seed: int = 42,
    max_walks: int | None = None,
) -> DataFrame:
    """(node, score) — ``KPathCentrality.cpp`` semantics: t random
    simple walks, score = k·n·counter/t.  ``max_walks`` subsamples the
    walk population (the t in the scaling shrinks with it, keeping the
    estimator unbiased)."""
    if not (-0.5 <= alpha <= 0.5):
        raise ValueError("alpha must lie in [-0.5, 0.5]")
    n = graph.num_nodes()
    m = graph.num_edges()
    if k == 0:
        k = max(int(math.log(n + m)), 1)
    t = max(int(2 * k * k * (n ** (1 - 2 * alpha)) * math.log(n)), 1)
    if max_walks is not None:
        t = min(t, max_walks)
    spark = graph.spark
    sym = graph.sym().persist()
    # dense 0..n-1 rank → uniform start-node draw per walk; assigned by
    # the distributed per-partition-offset path (n can be web-scale).
    from networkit_spark.graph import assign_dense_ids

    ranks = assign_dense_ids(
        graph.vertices().select(F.col("id").alias("start")), key_col="start"
    ).select("start", F.col("id").alias("rk"))
    walks = (
        spark.range(t)
        .select(
            F.col("id").alias("walk"),
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("start")), F.lit(n)).alias("rk"),
            (1 + F.pmod(F.xxhash64("id", F.lit(seed), F.lit("len")), F.lit(k))).alias("l"),
        )
        .join(ranks, "rk")
        .select("walk", "l", F.array("start").alias("path"))
        .localCheckpoint(eager=True)
    )
    finished = []
    for j in range(1, k + 1):
        live = walks.where(F.size("path") - 1 < F.col("l"))
        done = walks.where(F.size("path") - 1 >= F.col("l"))
        finished.append(done.select("path"))
        if live.count() == 0:
            walks = live
            break
        cand = (
            live.withColumn("src", F.element_at("path", -1))
            .join(sym, "src")
            .where(~F.array_contains("path", F.col("dst")))
        )
        # weighted: exponential race with rate 1/w (min draw wins ⇒
        # P(pick x) ∝ 1/w_x, the reference's proposal); unweighted
        # weights are all 1.0 ⇒ uniform.
        u = (
            F.pmod(
                F.xxhash64("walk", F.lit(j), "dst", F.lit(seed)), F.lit(1_000_003)
            )
            + 1
        ) / 1_000_004.0
        cand = cand.withColumn("draw", -F.log(u) * F.col("weight"))
        step = (
            cand.groupBy("walk")
            .agg(
                F.min_by(F.struct("l", "path", "dst"), "draw").alias("s")
            )
            .select(
                "walk",
                F.col("s.l").alias("l"),
                F.concat(F.col("s.path"), F.array(F.col("s.dst"))).alias("path"),
            )
        )
        # walks whose every neighbor is already on the path die here
        dead = live.join(step.select("walk"), "walk", "left_anti").select("path")
        finished.append(dead)
        walks = step.localCheckpoint(eager=True)
    if walks.count() > 0:
        finished.append(walks.select("path"))
    allp = finished[0]
    for f in finished[1:]:
        allp = allp.unionByName(f)
    counter = (
        allp.select(F.explode(F.slice("path", 2, k)).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        graph.vertices()
        .join(counter, F.col("id") == F.col("node"), "left")
        .select(
            F.col("id").alias("node"),
            (F.lit(float(k * n)) * F.coalesce("c", F.lit(0)) / t).alias("score"),
        )
    )
    sym.unpersist()
    return out
