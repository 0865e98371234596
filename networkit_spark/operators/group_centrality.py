"""Group centralities — SURVEY §2.8 rows ``GroupDegree``,
``GroupCloseness``, ``ApproxGroupBetweenness`` — plus the adaptive
``KadabraBetweenness`` sampler.

References (semantic parity, not translation):

* ``cpp/centrality/GroupDegree.{h,cpp}`` — greedy submodular
  maximization of one-hop group coverage (Everett et al. 1999);
  1/2-approx, or (1−1/e) with ``countGroupNodes``.
* ``cpp/centrality/GroupCloseness.{h,cpp}`` — Bergamini et al.
  (ALENEX 2018) greedy farness minimization with pruned candidate
  BFS; optional depth cap ``H``.
* ``cpp/centrality/ApproxGroupBetweenness.{h,cpp}`` — Mahmoody /
  Tsourakakis / Upfal sampling: ``k·log n / ε²`` sampled shortest
  paths become hyperedges; greedy max-cover picks the group.
* ``cpp/centrality/KadabraBetweenness.{h,cpp}`` — adaptive sampling
  (Borassi–Natale) with per-node error bounds; the sample budget
  ω = (c/ε²)(⌊log₂(VD−1)⌋ + 1 + ln(1/2δ)) matches
  ``KadabraBetweenness.cpp:321``.

Spark shapes (the whole family shares ONE primitive):

* ``_sigma_bfs_keyed`` runs a multi-source σ-BFS — frontier keyed by
  (source, node) so ALL sampled sources advance in the same
  diameter-bounded superstep loop; each superstep is one edge join +
  one groupBy.  No per-source driver loop: 100 samples cost the same
  number of Spark jobs as one.
* Path sampling (ApproxGroupBetweenness) walks ALL sampled pairs
  backwards simultaneously: one superstep per hop, per-pair
  predecessor drawn by a hash-seeded exponential race weighted by
  forward σ (uniform shortest path, as the reference's
  ``bfs.getPaths`` + uniform pick).
* Greedy selections are k rounds of (anti-join uncovered → groupBy
  count → TakeOrdered 1) — the argmax never materializes more than
  one row on the driver; covered-set updates are distinct unions,
  lineage-truncated per round.
* Kadabra uses the Rao–Blackwellized per-pair contribution (exact
  conditional path probability σ_s(v)·σ_t(v)/σ_st, like
  ``approx_betweenness``) instead of a single sampled path — same
  expectation, never-higher variance, so the additive Hoeffding /
  empirical-Bernstein bounds still hold; adaptive batches stop when
  every node's half-width is below ``err`` (absolute mode) or the
  top-k order is resolved (top-k mode).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _lineage(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _sigma_bfs_keyed(sym: DataFrame, sources: list[int]) -> DataFrame:
    """(s, node, dist, sigma) for every source in ``sources`` — all
    wavefronts share each edge scan (one superstep loop total)."""
    spark = sym.sparkSession
    cur = _lineage(
        spark.createDataFrame(
            [(int(s), int(s), 0, 1.0) for s in sorted(set(sources))],
            "s long, node long, dist int, sigma double",
        )
    )
    out = cur
    d = 0
    while True:
        d += 1
        nxt = _lineage(
            sym.join(cur.withColumnRenamed("node", "src"), "src")
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(out.select("s", "node"), ["s", "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .select("s", "node", "dist", "sigma")
        )
        if nxt.limit(1).count() == 0:
            return out
        out = _lineage(out.unionByName(nxt))
        cur = nxt


def _hash_unit(*cols) -> F.Column:
    """Deterministic U(0,1) from the md5 of the concatenated columns."""
    h = F.md5(F.concat_ws(":", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + 0.5) / float(
        16**15
    )


@dataclass
class GroupDegreeResult:
    group: list[int]
    score: int


def group_degree(
    graph: EdgeGraph, k: int = 1, count_group_nodes: bool = True
) -> GroupDegreeResult:
    """Greedy max group degree (``cpp/centrality/GroupDegree.cpp:40``).

    Marginal gain of u ∉ S: |N_out(u) \\ covered| plus (with
    ``count_group_nodes``) 1 if u itself is uncovered, or minus 1 if u
    is already dominated by S (without).  The reference keeps a lazy
    bucket queue; here every round recomputes gains exactly — one
    anti-join + groupBy over the out-edge table, argmax by
    TakeOrdered(1) with smallest-id tie-break.  Score = |N_out(S) \\ S|
    (+k with ``count_group_nodes``), per ``computeScore``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = graph.edges.sparkSession
    out_edges = (
        graph.edges.select("src", "dst")
        if graph.directed
        else graph.sym().select("src", "dst")
    ).persist()
    in_edges = (
        out_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if graph.directed
        else out_edges
    )
    vertices = graph.vertices().persist()
    group: list[int] = []
    # covered = S ∪ N_out(S) (the reference's `reachable`)
    covered = _lineage(
        spark.createDataFrame([], "node long")
    )
    for _ in range(k):
        in_group = F.col("id").isin([int(g) for g in group]) if group else F.lit(False)
        base = (
            out_edges.join(
                covered.withColumnRenamed("node", "dst"), "dst", "left_anti"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("nb_gain"))
        )
        cand = (
            vertices.where(~in_group)
            .join(base, "id", "left")
            .withColumn("nb_gain", F.coalesce("nb_gain", F.lit(0)))
        )
        if count_group_nodes:
            self_term = F.when(F.col("cov_self").isNull(), 1).otherwise(0)
            cand = cand.join(
                covered.select(F.col("node").alias("id"), F.lit(1).alias("cov_self")),
                "id",
                "left",
            ).withColumn("gain", F.col("nb_gain") + self_term)
        elif group:
            dominated = (
                in_edges.where(F.col("src").isin([int(g) for g in group]))
                .select(F.col("dst").alias("id"))
                .distinct()
                .withColumn("dom", F.lit(1))
            )
            cand = cand.join(dominated, "id", "left").withColumn(
                "gain", F.col("nb_gain") - F.coalesce("dom", F.lit(0))
            )
        else:
            cand = cand.withColumn("gain", F.col("nb_gain"))
        pick = cand.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()[0]
        u = int(pick["id"])
        group.append(u)
        covered = _lineage(
            covered.unionByName(
                out_edges.where(F.col("src") == u).select(F.col("dst").alias("node"))
            )
            .unionByName(spark.createDataFrame([(u,)], "node long"))
            .distinct()
        )
    score = covered.join(
        spark.createDataFrame([(int(g),) for g in group], "node long"),
        "node",
        "left_anti",
    ).count()
    if count_group_nodes:
        score += len(group)
    out_edges.unpersist()
    vertices.unpersist()
    return GroupDegreeResult(group=sorted(group), score=int(score))


@dataclass
class GroupClosenessResult:
    group: list[int]
    farness: float
    score: float


def group_closeness(
    graph: EdgeGraph, k: int = 1, H: int = 0, pool: int | None = None
) -> GroupClosenessResult:
    """Greedy group closeness (``cpp/centrality/GroupCloseness.cpp:81``,
    Bergamini et al. ALENEX 2018).

    Seed: the top-closeness node (H=0) or the max-degree node (H>0),
    as in the reference.  Each later round evaluates the EXACT marginal
    improvement gain(x) = Σ_v max(0, d_S(v) − d(x,v)) for every
    candidate with ONE keyed pruned BFS: the frontier keeps (cand,
    node, dist) only while dist < d_S(node) — expanding past a
    non-improving node cannot improve anything beyond it (triangle
    inequality), which is the same pruning the reference's
    ``computeImprovement`` BFS applies; ``H`` > 0 additionally caps the
    depth.  ``pool`` restricts candidates to the top-``pool`` nodes by
    degree (scale path; None = all nodes, the reference's behavior).

    Farness = Σ_v d(v, S) over reached nodes; score = (n−k)/farness
    (0 when farness is 0).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = graph.edges.sparkSession
    sym = graph.sym().select("src", "dst").persist()
    vertices = graph.vertices().persist()
    n = graph.num_nodes()

    if H == 0:
        from networkit_spark.operators.closeness import top_closeness

        seed = int(top_closeness(graph, k=1).collect()[0]["node"])
    else:
        seed = int(
            graph.degrees()
            .orderBy(F.desc("deg"), F.asc("node"))
            .limit(1)
            .collect()[0]["node"]
        )
    group = [seed]

    def _ms_bfs(sources: list[int]) -> DataFrame:
        """(node, dist) multi-source BFS from `sources`."""
        cur = _lineage(
            spark.createDataFrame(
                [(int(s), 0) for s in sources], "node long, dist int"
            )
        )
        out, d = cur, 0
        while True:
            d += 1
            nxt = _lineage(
                sym.join(cur.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(out.select("node"), "node", "left_anti")
                .withColumn("dist", F.lit(d))
            )
            if nxt.limit(1).count() == 0:
                return out
            out = _lineage(out.unionByName(nxt))
            cur = nxt

    d_s = _ms_bfs(group)  # (node, dist)
    for _ in range(1, k):
        cands = vertices.where(~F.col("id").isin([int(g) for g in group]))
        if pool is not None:
            cands = (
                graph.degrees()
                .withColumnRenamed("node", "id")
                .join(cands, "id")
                .orderBy(F.desc("deg"), F.asc("id"))
                .limit(pool)
                .select("id")
            )
        # keyed pruned BFS: rows survive only where they improve d_S
        cur = _lineage(
            cands.join(
                d_s.withColumnRenamed("node", "id"), "id", "left"
            )
            .where(F.coalesce("dist", F.lit(2**31)) > 0)
            .select(
                F.col("id").alias("cand"),
                F.col("id").alias("node"),
                F.lit(0).alias("dist"),
            )
        )
        visited = cur
        d = 0
        while True:
            d += 1
            if H > 0 and d > H:
                break
            nxt = (
                sym.join(cur.withColumnRenamed("node", "src"), "src")
                .select("cand", F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("cand", "node"), ["cand", "node"], "left_anti")
                .join(d_s.withColumnRenamed("dist", "ds"), "node", "left")
                .where(F.lit(d) < F.coalesce("ds", F.lit(2**31)))
                .select("cand", "node", F.lit(d).alias("dist"))
            )
            nxt = _lineage(nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = _lineage(visited.unionByName(nxt))
            cur = nxt
        gains = (
            visited.join(d_s.withColumnRenamed("dist", "ds"), "node", "left")
            .withColumn(
                "impr",
                F.coalesce("ds", F.lit(n).cast("int")) - F.col("dist"),
            )
            .where(F.col("impr") > 0)
            .groupBy("cand")
            .agg(F.sum("impr").alias("gain"))
        )
        top = gains.orderBy(F.desc("gain"), F.asc("cand")).limit(1).collect()
        if not top:
            break
        u = int(top[0]["cand"])
        group.append(u)
        upd = visited.where(F.col("cand") == u).select("node", F.col("dist").alias("nd"))
        d_s = _lineage(
            d_s.join(upd, "node", "full_outer").select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(2**31)), F.coalesce("nd", F.lit(2**31))
                ).alias("dist"),
            )
        )
    farness = float(
        d_s.agg(F.sum(F.col("dist").cast("double"))).collect()[0][0] or 0.0
    )
    score = (n - len(group)) / farness if farness > 0 else 0.0
    sym.unpersist()
    vertices.unpersist()
    return GroupClosenessResult(group=sorted(group), farness=farness, score=score)


@dataclass
class ApproxGroupBetweennessResult:
    group: list[int]
    covered_paths: int
    samples: int


def approx_group_betweenness(
    graph: EdgeGraph,
    k: int,
    epsilon: float = 0.2,
    seed: int = 42,
    max_samples: int | None = None,
) -> ApproxGroupBetweennessResult:
    """Mahmoody–Tsourakakis–Upfal sampled group betweenness
    (``cpp/centrality/ApproxGroupBetweenness.cpp:36-130``).

    ``samples = k·log(n)/ε²`` (s,t) pairs (hash-seeded, as the
    reference draws via its RNG); for each pair ONE uniform shortest
    path is sampled and its interior nodes form a hyperedge; the group
    is the greedy max-cover of the hyperedges.

    Spark shape: one keyed σ-BFS grows ALL forward wavefronts
    together; the uniform path is drawn by walking all pairs backward
    SIMULTANEOUSLY — per superstep one join onto the predecessor
    relation (dist_s(u)+1 = dist_s(v)) and a per-pair exponential race
    with rate σ_s(u) (hash-seeded), which picks predecessor u with
    probability σ_s(u)/Σσ — exactly a uniform draw over shortest
    paths.  Greedy cover: k rounds of groupBy-count + TakeOrdered(1).
    """
    spark = graph.edges.sparkSession
    sym = graph.sym().select("src", "dst").persist()
    vertices = graph.vertices().persist()
    n = max(graph.num_nodes(), 2)
    r = int(math.ceil(k * math.log(n) / (epsilon * epsilon)))
    if max_samples is not None:
        r = min(r, max_samples)
    r = max(r, 1)

    from networkit_spark.graph import random_nodes

    base = random_nodes(graph, k=min(2 * r + 8, n), seed=seed)
    import hashlib

    def _pick(tag: str, i: int) -> int:
        h = hashlib.md5(f"{seed}:{tag}:{i}".encode()).hexdigest()
        return base[int(h, 16) % len(base)]

    pairs = []
    for i in range(r):
        s, t = _pick("s", i), _pick("t", i)
        if s != t:
            pairs.append((i, s, t))
    pairs_df = spark.createDataFrame(pairs, "pid long, s long, t long")

    fw = _sigma_bfs_keyed(sym, [s for _, s, _ in pairs]).persist()

    # start the backward walk at t where t is reachable from s
    walk = _lineage(
        pairs_df.join(
            fw.select(F.col("s"), F.col("node").alias("t"), F.col("dist").alias("d_st")),
            ["s", "t"],
        ).select("pid", "s", F.col("t").alias("cur"), F.col("d_st").alias("dist"))
    )
    incidence = None  # (pid, node) interior nodes
    used = walk.count()
    step = 0
    while True:
        step += 1
        active = walk.where(F.col("dist") > 1)
        if active.limit(1).count() == 0:
            break
        # predecessors of cur on the shortest-path DAG for this pair
        preds = (
            active.join(
                sym.select(F.col("src").alias("p"), F.col("dst").alias("cur")), "cur"
            )
            .join(
                fw.select(
                    "s", F.col("node").alias("p"), F.col("dist").alias("pd"),
                    F.col("sigma").alias("psigma"),
                ),
                ["s", "p"],
            )
            .where(F.col("pd") == F.col("dist") - 1)
        )
        # exponential race with rate sigma: min of -ln(U)/sigma
        race = preds.withColumn(
            "key",
            -F.log(_hash_unit(F.lit(seed), F.lit(step), F.col("pid"), F.col("p")))
            / F.col("psigma"),
        )
        w = (
            race.groupBy("pid", "s")
            .agg(F.min_by(F.struct("p", "pd"), "key").alias("win"))
            .select(
                "pid",
                "s",
                F.col("win.p").alias("cur"),
                F.col("win.pd").alias("dist"),
            )
        )
        walk = _lineage(w)
        interior = walk.where(F.col("dist") > 0).select(
            "pid", F.col("cur").alias("node")
        )
        nxt_inc = interior if incidence is None else incidence.unionByName(interior)
        incidence = _lineage(nxt_inc)

    group: list[int] = []
    covered = 0
    if incidence is not None:
        remaining = incidence
        for _ in range(k):
            top = (
                remaining.groupBy("node")
                .agg(F.countDistinct("pid").alias("c"))
                .orderBy(F.desc("c"), F.asc("node"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] == 0:
                break
            u = int(top[0]["node"])
            group.append(u)
            covered += int(top[0]["c"])
            hit = remaining.where(F.col("node") == u).select("pid").distinct()
            remaining = _lineage(remaining.join(hit, "pid", "left_anti"))
    # pad with highest-degree unused nodes, as the reference pads from
    # its (never-covering) queue tail when fewer than k nodes cover
    if len(group) < k:
        pad = (
            graph.degrees()
            .where(~F.col("node").isin([int(g) for g in group]))
            .orderBy(F.desc("deg"), F.asc("node"))
            .limit(k - len(group))
            .collect()
        )
        group.extend(int(rw["node"]) for rw in pad)
    fw.unpersist()
    sym.unpersist()
    vertices.unpersist()
    return ApproxGroupBetweennessResult(
        group=sorted(group), covered_paths=covered, samples=int(used)
    )


def kadabra_betweenness(
    graph: EdgeGraph,
    err: float = 0.1,
    delta: float = 0.1,
    k: int = 0,
    seed: int = 42,
    batch: int = 16,
    start_factor: int = 4,
) -> DataFrame:
    """(node, score, half_width) — adaptive-sampling betweenness
    (``cpp/centrality/KadabraBetweenness.cpp``, Borassi–Natale KADABRA).

    Budget ω = (1/2ε²)(⌊log₂(VD−1)⌋ + 1 + ln(1/2δ)) as in the
    reference (``:321``); sampling proceeds in batches of ``batch``
    pairs and stops EARLY when every node's empirical-Bernstein
    half-width is ≤ ``err`` (absolute mode, k=0) or when the top-k
    order is separated (k>0) — the reference's ``computeFinished``
    plays the same role with its per-node errL/errU.

    Per-pair contribution: the Rao–Blackwellized conditional path
    probability σ_s(v)·σ_t(v)/σ_st over the s–t DAG (bounded in [0,1],
    same expectation as the reference's single sampled path, never
    higher variance — the additive bounds transfer).  All pairs of a
    batch share one keyed σ-BFS sweep per direction.
    """
    import hashlib

    from networkit_spark.graph import random_nodes
    from networkit_spark.operators.bfs import diameter_range

    spark = graph.edges.sparkSession
    sym = graph.sym().select("src", "dst").persist()
    tsym = (
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if graph.directed
        else sym
    )
    vertices = graph.vertices().persist()
    n = max(graph.num_nodes(), 3)
    _, hi = diameter_range(graph)
    vd = max(hi + 1, 3)
    omega = int(
        math.ceil(
            0.5 / (err * err) * (math.floor(math.log2(vd - 1)) + 1 + math.log(0.5 / delta))
        )
    )
    base = random_nodes(graph, k=min(4 * batch + 16, n), seed=seed)

    def _pick(tag: str, i: int) -> int:
        h = hashlib.md5(f"{seed}:kad:{tag}:{i}".encode()).hexdigest()
        return base[int(h, 16) % len(base)]

    tot = None  # (node, s1, s2) running sums of p and p²
    n_pairs = 0
    i = 0
    while n_pairs < omega:
        want = min(batch, omega - n_pairs)
        batch_pairs = []
        while len(batch_pairs) < want:
            s, t = _pick("s", i), _pick("t", i)
            i += 1
            if s != t:
                batch_pairs.append((len(batch_pairs) + n_pairs, s, t))
        pdf = spark.createDataFrame(batch_pairs, "pid long, s long, t long")
        fw = _sigma_bfs_keyed(sym, [s for _, s, _ in batch_pairs])
        bw = _sigma_bfs_keyed(tsym, [t for _, _, t in batch_pairs])
        st = pdf.join(
            fw.select("s", F.col("node").alias("t"), F.col("dist").alias("d_st"),
                      F.col("sigma").alias("sigma_st")),
            ["s", "t"],
        )
        contrib = (
            st.alias("p")
            .join(fw.alias("f"), F.col("p.s") == F.col("f.s"))
            .join(
                bw.alias("b"),
                (F.col("p.t") == F.col("b.s")) & (F.col("f.node") == F.col("b.node")),
            )
            .where(
                (F.col("f.dist") + F.col("b.dist") == F.col("p.d_st"))
                & (F.col("f.node") != F.col("p.s"))
                & (F.col("f.node") != F.col("p.t"))
            )
            .select(
                F.col("f.node").alias("node"),
                (F.col("f.sigma") * F.col("b.sigma") / F.col("p.sigma_st")).alias("p"),
            )
        )
        part = contrib.groupBy("node").agg(
            F.sum("p").alias("s1"), F.sum(F.col("p") * F.col("p")).alias("s2")
        )
        tot = part if tot is None else (
            tot.unionByName(part)
            .groupBy("node")
            .agg(F.sum("s1").alias("s1"), F.sum("s2").alias("s2"))
        )
        tot = _lineage(tot)
        n_pairs += len(batch_pairs)
        if n_pairs >= omega:
            break
        # first bound check at tau = omega/start_factor pairs, like the
        # reference's tau warm-up (KadabraBetweenness.cpp:324)
        if n_pairs < max(omega // start_factor, batch):
            continue
        # empirical-Bernstein half width per node
        log_term = math.log(3.0 * n / delta)
        stats = tot.select(
            "node",
            (F.col("s1") / n_pairs).alias("mean"),
            (
                F.sqrt(
                    2.0
                    * F.greatest(
                        F.col("s2") / n_pairs
                        - (F.col("s1") / n_pairs) * (F.col("s1") / n_pairs),
                        F.lit(0.0),
                    )
                    * log_term
                    / n_pairs
                )
                + 3.0 * log_term / n_pairs
            ).alias("hw"),
        )
        if k <= 0:
            worst = stats.agg(F.max("hw")).collect()[0][0] or 0.0
            if worst <= err:
                break
        else:
            rows = (
                stats.orderBy(F.desc("mean"), F.asc("node")).limit(k + 1).collect()
            )
            if len(rows) > k and all(
                rows[j]["mean"] - rows[j]["hw"] > rows[k]["mean"] + rows[k]["hw"]
                for j in range(k)
            ):
                break
    log_term = math.log(3.0 * n / delta)
    out = (
        vertices.join(tot, vertices["id"] == F.col("node"), "left")
        .select(
            vertices["id"].alias("node"),
            (F.coalesce("s1", F.lit(0.0)) / n_pairs).alias("score"),
            (
                F.sqrt(
                    2.0
                    * F.greatest(
                        F.coalesce("s2", F.lit(0.0)) / n_pairs
                        - (F.coalesce("s1", F.lit(0.0)) / n_pairs)
                        * (F.coalesce("s1", F.lit(0.0)) / n_pairs),
                        F.lit(0.0),
                    )
                    * log_term
                    / n_pairs
                )
                + 3.0 * log_term / n_pairs
            ).alias("half_width"),
        )
    )
    out = _lineage(out)
    sym.unpersist()
    vertices.unpersist()
    return out
