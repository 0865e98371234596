"""Edge scores + sparsification — per-edge column transforms + filters.

EdgeScore family (``cpp/edgescores/EdgeScore.h:20``): a score column on
the canonical edge table.  Sparsification (``cpp/sparsification/*``,
py façade ``networkit/sparsification.py``): score edges, then
``GlobalThresholdFilter`` (``sparsification/GlobalThresholdFilter.h:18``)
keeps edges with score ≥/> a threshold — a pure DataFrame filter.

Implemented scores:
- triangle score (``TriangleEdgeScore``, §2.5.4) via the wedge join
- ``EdgeScoreNormalizer``: min-max rescale to [lo, hi]
- ``EdgeScoreLinearizer``: rank-based linearization (rank/m)
- ``GeometricMeanScore``: score / sqrt(deg(u)·deg(v)) shape
  (the local-similarity normalization family)
- ``LocalDegreeScore`` (``sparsification/LocalDegreeScore.h:19``): keep
  edge (u,v) in u's view if v ranks within deg(u)^alpha of u's neighbors
  by degree — expressed as the exponent threshold score
- ``RandomEdgeScore``: deterministic pseudo-random per-edge score
  (md5-keyed, reproducible)
- ``JaccardSimilarityAttributizer``: per-edge neighborhood Jaccard
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.triangles import triangle_counts


def triangle_score(graph: EdgeGraph) -> DataFrame:
    """(src, dst, score) — per-edge triangle counts as a score."""
    return triangle_counts(graph).select(
        "src", "dst", F.col("triangles").cast("double").alias("score")
    )


def jaccard_score(graph: EdgeGraph) -> DataFrame:
    """(src, dst, score) — neighborhood Jaccard per EDGE (u,v):
    |N(u)∩N(v)| / |N(u)∪N(v)| (JaccardSimilarityAttributizer)."""
    tri = triangle_counts(graph)
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        tri.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .select(
            "src",
            "dst",
            (
                F.col("triangles")
                / (F.col("sdeg") + F.col("ddeg") - F.col("triangles"))
            ).alias("score"),
        )
    )


def geometric_mean_score(graph: EdgeGraph, scores: DataFrame) -> DataFrame:
    """score / sqrt(deg(u)·deg(v)) (GeometricMeanScore)."""
    deg = graph.degrees().select("node", "deg")
    return (
        scores.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .select("src", "dst", (F.col("score") / F.sqrt(F.col("sdeg") * F.col("ddeg"))).alias("score"))
    )


def normalize_score(scores: DataFrame, lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """EdgeScoreNormalizer — min-max rescale into [lo, hi]."""
    mm = scores.agg(F.min("score").alias("mn"), F.max("score").alias("mx")).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    span = (mx - mn) or 1.0
    return scores.select(
        "src", "dst", (lo + (F.col("score") - mn) / span * (hi - lo)).alias("score")
    )


def linearize_score(scores: DataFrame) -> DataFrame:
    """EdgeScoreLinearizer — replace scores by their rank/m quantile
    (rank by score asc, ties by edge key for determinism).  The rank is
    a distributed global_row_number (range partition + prefix offsets),
    not a single-task ``Window.orderBy`` over all m edges."""
    from networkit_spark.plans.rank import global_row_number

    m = scores.count()
    ranked = global_row_number(scores, ["score", "src", "dst"], out_col="_rk")
    return ranked.select(
        "src", "dst", ((F.col("_rk") + 1) / F.lit(float(m))).alias("score")
    )


def random_edge_score(graph: EdgeGraph, seed: int = 42) -> DataFrame:
    """RandomEdgeScore — deterministic md5-keyed uniform(0,1) per edge."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), "src", "dst")), 1, 13), 16, 10
    ).cast("double")
    return graph.edges.select("src", "dst", (h / float(16**13)).alias("score"))


def local_degree_score(graph: EdgeGraph) -> DataFrame:
    """LocalDegreeScore (``sparsification/LocalDegreeScore.h:19``): for
    each edge in each endpoint's view, score = 1 - log(rank)/log(deg)
    where rank = position of the neighbor among u's neighbors ordered by
    degree desc; the edge keeps its best score from either side."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    ann = (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    w = Window.partitionBy("src").orderBy(F.desc("ddeg"), F.asc("dst"))
    ranked = ann.withColumn("rnk", F.row_number().over(w)).select(
        "src",
        "dst",
        F.when(F.col("sdeg") > 1, 1.0 - F.log("rnk") / F.log(F.col("sdeg").cast("double")))
        .otherwise(F.lit(1.0))
        .alias("side_score"),
    )
    return (
        ranked.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"), "side_score"
        )
        .groupBy("src", "dst")
        .agg(F.max("side_score").alias("score"))
    )


def global_threshold_filter(
    graph: EdgeGraph, scores: DataFrame, threshold: float, above: bool = True
) -> EdgeGraph:
    """GlobalThresholdFilter — keep edges with score ≥ t (or ≤ t)."""
    keep = scores.where(
        F.col("score") >= threshold if above else F.col("score") <= threshold
    ).select("src", "dst")
    return EdgeGraph(
        graph.edges.join(keep, ["src", "dst"], "leftsemi"), graph.directed, graph.weighted
    )


def scan_score(graph: EdgeGraph) -> DataFrame:
    """SCANStructuralSimilarityScore
    (``sparsification/SCANStructuralSimilarityScore.cpp:10-16``):
    per edge (u,v): (triangles + 1) / sqrt((deg u + 1)·(deg v + 1)) —
    the SCAN structural similarity with both endpoints counted into
    their own neighborhoods."""
    tri = triangle_counts(graph)
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        tri.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .select(
            "src",
            "dst",
            (
                (F.col("triangles") + 1)
                / F.sqrt((F.col("sdeg") + 1) * (F.col("ddeg") + 1))
            ).alias("score"),
        )
    )


def chance_corrected_triangle_score(graph: EdgeGraph) -> DataFrame:
    """ChanceCorrectedTriangleScore
    (``sparsification/ChanceCorrectedTriangleScore.cpp:22-28``):
    triangles·(n-2) / ((deg u - 1)·(deg v - 1)) when the edge closes a
    triangle; 1.0 for edges pendant at either end; else 0."""
    n = graph.num_nodes()
    tri = triangle_counts(graph)
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        tri.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("triangles") > 0,
                F.col("triangles") * F.lit(float(n - 2))
                / ((F.col("sdeg") - 1) * (F.col("ddeg") - 1)),
            )
            .when((F.col("sdeg") == 1) | (F.col("ddeg") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def multiscale_score(graph: EdgeGraph, scores: DataFrame | None = None) -> DataFrame:
    """MultiscaleScore (``sparsification/MultiscaleScore.cpp:14-63``,
    Serrano-Boguñá multiscale backbone): per endpoint u, normalize the
    attribute over N(u) (p = a_uv / Σ a_u·) and score the edge
    1 - (1-p)^(deg u - 1) — the probability a uniform null produces a
    weight that large; the edge keeps the max over its two endpoint
    views.  ``scores`` defaults to the edge weight."""
    if scores is None:
        scores = graph.edges.where(F.col("src") != F.col("dst")).select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("score"),
        ).groupBy("src", "dst").agg(F.first("score").alias("score"))
    sym = scores.unionByName(
        scores.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    agg = sym.groupBy("src").agg(
        F.sum("score").alias("ssum"), F.count(F.lit(1)).alias("deg")
    )
    side = sym.join(agg, "src").select(
        "src",
        "dst",
        # deg==1 ⇒ p=1 and (1-p)^0 = 1 ⇒ score 0, as in the reference
        (1.0 - F.pow(1.0 - F.col("score") / F.col("ssum"), F.col("deg") - 1)).alias(
            "side_score"
        ),
    )
    return (
        side.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "side_score",
        )
        .groupBy("src", "dst")
        .agg(F.max("side_score").alias("score"))
    )


def local_similarity_score(graph: EdgeGraph) -> DataFrame:
    """LocalSimilarityScore (``sparsification/LocalSimilarityScore.cpp:
    17-66``): per node i, rank neighbors by edge Jaccard
    tri/(deg i + deg j - tri) descending; the edge's sparsification
    exponent from i's view is 1 - log(rank)/log(deg i) (1.0 when
    deg i == 1); the edge keeps the max over both views."""
    tri = triangle_counts(graph)
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    tri_sym = tri.unionByName(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "triangles")
    )
    ann = (
        tri_sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        .withColumn(
            "sim", F.col("triangles") / (F.col("sdeg") + F.col("ddeg") - F.col("triangles"))
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    ranked = ann.withColumn("rnk", F.row_number().over(w)).select(
        "src",
        "dst",
        F.when(
            F.col("sdeg") > 1, 1.0 - F.log("rnk") / F.log(F.col("sdeg").cast("double"))
        )
        .otherwise(F.lit(1.0))
        .alias("side_score"),
    )
    return (
        ranked.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "side_score",
        )
        .groupBy("src", "dst")
        .agg(F.max("side_score").alias("score"))
    )


def simmelian_overlap_score(graph: EdgeGraph, max_rank: int = 10) -> DataFrame:
    """SimmelianOverlapScore (parametric Simmelian backbone,
    ``sparsification/SimmelianOverlapScore.cpp:16-31`` +
    ``SimmelianScore.cpp:16-74``): rank each node's neighbors by
    per-edge triangle count descending (competition ranking, rank 0
    best, ties share); the edge score is the number of common neighbors
    both endpoints place within rank ≤ max_rank (each endpoint
    excluded).  Shape: two per-node window ranks + one equi-join on the
    shared neighbor — no quadratic blowup; hubs cost O(deg·log deg) in
    their own partition."""
    tri = triangle_counts(graph)
    tri_sym = tri.unionByName(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "triangles")
    )
    w = Window.partitionBy("src").orderBy(F.desc("triangles"))
    top = (
        tri_sym.withColumn("rnk", F.rank().over(w) - 1)
        .where(F.col("rnk") <= max_rank)
        .select("src", "dst")
    )
    e = tri.select("src", "dst")
    a = top.select(F.col("src").alias("src"), F.col("dst").alias("z"))
    b = top.select(F.col("src").alias("dst"), F.col("dst").alias("z"))
    shared = (
        e.join(a, "src")
        .join(b, ["dst", "z"])
        .where((F.col("z") != F.col("src")) & (F.col("z") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return e.join(shared, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce(F.col("overlap").cast("double"), F.lit(0.0)).alias("score")
    )


def forest_fire_score(
    graph: EdgeGraph,
    pf: float = 0.7,
    target_burnt_ratio: float = 5.0,
    fires_per_round: int = 64,
    seed: int = 42,
    max_rounds: int = 64,
    max_steps: int = 32,
) -> DataFrame:
    """ForestFireScore (``sparsification/ForestFireScore.cpp:19-90``):
    repeatedly start fires at random nodes; an active node burns a
    Geometric(pf)-distributed number of not-yet-visited neighbors
    (per-fire visited set); an edge's score is its burn count divided
    by the max burn count.  Fires run until the total number of burnt
    edges reaches ``target_burnt_ratio × m``.

    Spark shape: fires run in BATCHES as supersteps — state is the
    (fire, node) frontier plus a (fire, node) visited set; each
    superstep expands every active fire one hop.  All randomness is
    hash-keyed (seed, fire, node, neighbor): deterministic at any
    parallelism.  The reference's one-at-a-time queue becomes
    level-synchronous burning, which preserves the score's
    distributional meaning (burn frequency under the same local
    geometric rule)."""
    spark = graph.spark
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct().localCheckpoint(eager=True)
    m = e.count()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).persist()
    verts = sym.select(F.col("src").alias("id")).distinct().persist()

    def u01(*cols):
        h = F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 13), 16, 10).cast("double")
        return h / float(16**13)

    burnt = None  # (src, dst, cnt)
    total_burnt = 0
    for rnd in range(max_rounds):
        if total_burnt >= target_burnt_ratio * m:
            break
        # the source node id doubles as the fire id (sources are distinct
        # within a round) — deterministic at any parallelism
        sources = (
            verts.orderBy(u01(F.lit(seed), F.lit(f"src:{rnd}"), "id"))
            .limit(fires_per_round)
            .select(F.col("id").alias("fire"), F.col("id").alias("node"))
            .localCheckpoint(eager=True)
        )
        frontier = sources
        visited = sources
        for step in range(max_steps):
            cand = (
                frontier.join(sym.withColumnRenamed("src", "node"), "node")
                .select("fire", "node", F.col("dst").alias("nbr"))
                .join(
                    visited.withColumnRenamed("node", "nbr"), ["fire", "nbr"], "left_anti"
                )
            )
            # geometric burn budget per (fire, node): X with P(X>=j)=pf^j
            budget = F.floor(
                F.log(u01(F.lit(seed), F.lit(f"g:{rnd}:{step}"), "fire", "node"))
                / F.log(F.lit(float(pf)))
            )
            wsel = Window.partitionBy("fire", "node").orderBy(
                u01(F.lit(seed), F.lit(f"s:{rnd}:{step}"), "fire", "node", "nbr")
            )
            sel = (
                cand.withColumn("rnk", F.row_number().over(wsel))
                .where(F.col("rnk") <= budget)
                .select("fire", "node", "nbr")
                .localCheckpoint(eager=True)
            )
            if sel.isEmpty():
                break
            burnt_round = sel.select(
                F.least("node", "nbr").alias("src"),
                F.greatest("node", "nbr").alias("dst"),
                F.lit(1).alias("cnt"),
            )
            burnt = (
                burnt_round
                if burnt is None
                else burnt.unionByName(burnt_round)
                .groupBy("src", "dst")
                .agg(F.sum("cnt").alias("cnt"))
            ).localCheckpoint(eager=True)
            total_burnt += sel.count()
            new_nodes = (
                sel.select("fire", F.col("nbr").alias("node"))
                .distinct()
                .join(visited, ["fire", "node"], "left_anti")
                .localCheckpoint(eager=True)
            )
            visited = visited.unionByName(new_nodes).localCheckpoint(eager=True)
            frontier = new_nodes
            if frontier.isEmpty():
                break

    if burnt is None:
        return e.select("src", "dst", F.lit(0.0).alias("score"))
    mx = burnt.agg(F.max("cnt")).collect()[0][0] or 1
    out = e.join(burnt, ["src", "dst"], "left").select(
        "src", "dst", (F.coalesce("cnt", F.lit(0)) / F.lit(float(mx))).alias("score")
    )
    sym.unpersist()
    verts.unpersist()
    return out


def edge_score_blender(
    scores0: DataFrame, scores1: DataFrame, selection: DataFrame
) -> DataFrame:
    """EdgeScoreBlender (``cpp/edgescores/EdgeScoreBlender.cpp:15-27``):
    per edge, take ``scores1`` where ``selection.sel`` is true else
    ``scores0``.  All inputs keyed (src, dst)."""
    return (
        scores0.withColumnRenamed("score", "s0")
        .join(scores1.withColumnRenamed("score", "s1"), ["src", "dst"])
        .join(selection, ["src", "dst"])
        .select(
            "src", "dst",
            F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0")).alias("score"),
        )
    )


def edge_score_as_weight(
    graph: EdgeGraph,
    scores: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> EdgeGraph:
    """EdgeScoreAsWeight (``cpp/edgescores/EdgeScoreAsWeight.cpp:16-36``):
    new weighted graph with w = offset + factor·score (or score²)."""
    s = F.col("score") * F.col("score") if squared else F.col("score")
    e = graph.edges.join(scores, ["src", "dst"]).select(
        "src", "dst", (F.lit(offset) + F.lit(factor) * s).alias("weight")
    )
    return EdgeGraph(e, graph.directed, True)


def _prefix_jaccard_fused_blocks(
    e: DataFrame, attribute: DataFrame
) -> DataFrame:
    """Small-graph escape hatch (same family as the linkpred row-block
    matmul path): the distributed plan shuffles O(Σ_e deg(u)+deg(v))
    event rows through a groupBy + per-edge rank window — ~30 M rows at
    bench scale.  When the ranked adjacency fits a broadcast, the edges
    fan out in index blocks and each task merges its edges' ranked
    neighbor lists fully vectorized (two argsorts per block, segmented
    cumsums, reduceat maxima) — no event shuffle at all.  Semantics are
    the distributed plan's exactly (competition ranks, partner
    exclusion, per-(edge, rank) aggregation BEFORE the Jaccard is
    evaluated); pytest asserts score equality."""
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    e_pdf = e.toPandas()
    if len(e_pdf) == 0:
        return spark.createDataFrame([], "src long, dst long, score double")
    att = attribute.select("src", "dst", "score").toPandas()
    asrc = np.concatenate([att["src"].to_numpy(np.int64), att["dst"].to_numpy(np.int64)])
    adst = np.concatenate([att["dst"].to_numpy(np.int64), att["src"].to_numpy(np.int64)])
    asc = np.concatenate([att["score"].to_numpy(np.float64)] * 2)
    eu = e_pdf["src"].to_numpy(np.int64)
    ev = e_pdf["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([asrc, adst, eu, ev]))
    n = len(nodes)
    s_i = np.searchsorted(nodes, asrc)
    d_i = np.searchsorted(nodes, adst)
    # competition ranks per node, score desc (ties share the rank) —
    # vectorized: sort by (node, -score), a rank restarts wherever the
    # node or the score changes, and ties inherit the last restart
    order = np.lexsort((-asc, s_i))
    s_o, d_o, sc_o = s_i[order], d_i[order], asc[order]
    grp_new = np.empty(len(s_o), dtype=bool)
    grp_new[0] = True
    grp_new[1:] = s_o[1:] != s_o[:-1]
    gstart = np.maximum.accumulate(np.where(grp_new, np.arange(len(s_o)), 0))
    rank_new = grp_new.copy()
    rank_new[1:] |= sc_o[1:] != sc_o[:-1]
    last_new = np.maximum.accumulate(np.where(rank_new, np.arange(len(s_o)), -1))
    rnk = (last_new - gstart + 1).astype(np.int64)
    # CSR over the rank-ordered adjacency
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s_o + 1, 1)
    indptr = np.cumsum(indptr)
    bc = spark.sparkContext.broadcast(
        (indptr, d_o, rnk, np.searchsorted(nodes, eu), np.searchsorted(nodes, ev), nodes)
    )
    m = len(eu)
    nb = max(1, min(spark.sparkContext.defaultParallelism * 2, m))
    cuts = np.linspace(0, m, nb + 1).astype(np.int64)
    bounds = [(int(lo), int(hi)) for lo, hi in zip(cuts[:-1], cuts[1:]) if hi > lo]

    def _ragged(indptr_, keys):
        """(row_of_slice, flat_index) for the concatenated CSR slices of
        ``keys`` — the standard repeat + offset gather."""
        starts, ends = indptr_[keys], indptr_[keys + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        rows = np.repeat(np.arange(len(keys), dtype=np.int64), cnt)
        offs = np.cumsum(cnt) - cnt
        flat = np.repeat(starts, cnt) + (np.arange(total, dtype=np.int64) - np.repeat(offs, cnt))
        return rows, flat

    def kernel(batches):
        indptr_, nbr_, rnk_, eui, evi, nds = bc.value
        for b in batches:
            for lo, hi in zip(b["lo"].to_numpy(), b["hi"].to_numpy()):
                u, v = eui[lo:hi], evi[lo:hi]
                ne = len(u)
                ur, uf = _ragged(indptr_, u)
                keep = nbr_[uf] != v[ur]
                ur, uf = ur[keep], uf[keep]
                vr, vf = _ragged(indptr_, v)
                keep = nbr_[vf] != u[vr]
                vr, vf = vr[keep], vf[keep]
                # common neighbors: one argsort of both sides on
                # (edge, neighbor); equal adjacent keys = a common pair
                side_eid = np.concatenate([ur, vr])
                side_nbr = np.concatenate([nbr_[uf], nbr_[vf]])
                side_rnk = np.concatenate([rnk_[uf], rnk_[vf]])
                key = side_eid * np.int64(len(nds)) + side_nbr
                o = np.argsort(key, kind="stable")
                k_s, r_s = key[o], side_rnk[o]
                dup = np.zeros(len(k_s), dtype=bool)
                dup[1:] = k_s[1:] == k_s[:-1]
                c_eid = (k_s[dup] // len(nds))
                c_rnk = np.maximum(r_s[dup], r_s[np.flatnonzero(dup) - 1])
                # events (eid, r, du, dv, dc), aggregated per (eid, r)
                # BEFORE the Jaccard is evaluated (ties must land at once)
                ev_eid = np.concatenate([ur, vr, c_eid])
                ev_r = np.concatenate([rnk_[uf], rnk_[vf], c_rnk])
                z_u = np.zeros(len(c_eid), dtype=np.int64)
                ev_du = np.concatenate([np.ones(len(ur), np.int64), np.zeros(len(vr), np.int64), z_u])
                ev_dv = np.concatenate([np.zeros(len(ur), np.int64), np.ones(len(vr), np.int64), z_u])
                ev_dc = np.concatenate([np.zeros(len(ur) + len(vr), np.int64), np.ones(len(c_eid), np.int64)])
                ekey = ev_eid * np.int64(len(nds) + 1) + ev_r
                o2 = np.argsort(ekey, kind="quicksort")
                ekey = ekey[o2]
                gnew = np.empty(len(ekey), dtype=bool)
                if len(ekey):
                    gnew[0] = True
                    gnew[1:] = ekey[1:] != ekey[:-1]
                gs = np.flatnonzero(gnew)
                g_eid = ekey[gs] // np.int64(len(nds) + 1)
                du = np.add.reduceat(ev_du[o2], gs) if len(gs) else np.empty(0, np.int64)
                dv = np.add.reduceat(ev_dv[o2], gs) if len(gs) else np.empty(0, np.int64)
                dc = np.add.reduceat(ev_dc[o2], gs) if len(gs) else np.empty(0, np.int64)
                # segmented cumsum within each edge
                enew = np.empty(len(g_eid), dtype=bool)
                if len(g_eid):
                    enew[0] = True
                    enew[1:] = g_eid[1:] != g_eid[:-1]
                es = np.flatnonzero(enew)
                cu, cv, cc = np.cumsum(du), np.cumsum(dv), np.cumsum(dc)
                base_u = np.repeat(cu[es] - du[es], np.diff(np.append(es, len(g_eid))))
                base_v = np.repeat(cv[es] - dv[es], np.diff(np.append(es, len(g_eid))))
                base_c = np.repeat(cc[es] - dc[es], np.diff(np.append(es, len(g_eid))))
                un_, vn_, cn_ = cu - base_u, cv - base_v, cc - base_c
                den = (un_ + vn_ - cn_).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    j = np.where(den > 0, cn_ / den, 0.0)
                score = np.zeros(ne, dtype=np.float64)
                if len(es):
                    score[g_eid[es]] = np.maximum.reduceat(j, es)
                yield pd.DataFrame(
                    {"src": nds[u], "dst": nds[v], "score": score}
                )

    blocks = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))
    return blocks.mapInPandas(kernel, "src long, dst long, score double")


def prefix_jaccard_score(
    graph: EdgeGraph, attribute: DataFrame, fused_local: bool | None = None
) -> DataFrame:
    """PrefixJaccardScore (``cpp/edgescores/PrefixJaccardScore.cpp:18-144``):
    per edge (u,v), the MAX over rank prefixes r of the Jaccard
    similarity between u's and v's top-r neighbors, neighbors ranked by
    ``attribute`` descending (competition ranking — ties share a rank,
    ``:55-76``); the partner endpoints are excluded (``:98-101,116-119``).

    Spark shape: rank neighbors per node (one window over the scored
    adjacency), full-outer-join u's and v's ranked lists per edge, turn
    each neighbor into cumulative count events at its ranks, and take
    the max Jaccard over the per-edge rank window — O(Σ_e deg(u)+deg(v))
    rows, the measure's inherent cost, all in window functions."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    if fused_local is None:
        import os

        fused_local = graph.num_edges() <= int(
            os.environ.get("SPARK_GRAFT_FUSED_EDGES", str(1 << 23))
        ) // 4
    if fused_local:
        return _prefix_jaccard_fused_blocks(e, attribute)
    att_sym = attribute.select("src", "dst", "score").unionByName(
        attribute.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
        )
    )
    rw = Window.partitionBy("src").orderBy(F.desc("score"))
    ranked = att_sym.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr"), F.rank().over(rw).alias("r")
    )
    # each side feeds BOTH the event union and the common-neighbor join —
    # persist so the O(Σ_e deg) join output is produced once, not twice
    u_side = e.join(
        ranked.withColumnRenamed("node", "src").withColumnRenamed("nbr", "w").withColumnRenamed("r", "ru"),
        "src",
    ).where(F.col("w") != F.col("dst")).persist()
    v_side = e.join(
        ranked.withColumnRenamed("node", "dst").withColumnRenamed("nbr", "w").withColumnRenamed("r", "rv"),
        "dst",
    ).where(F.col("w") != F.col("src")).persist()
    # events: a neighbor enters u's prefix at ru, v's at rv, the common
    # set at max(ru, rv).  The u/v events ARE the per-side rows; only the
    # common-set events need the (edge, neighbor) join — INNER, so its
    # output is just the triangle incidences, not the padded union that a
    # full-outer join of the two O(Σ_e deg) sides would materialize.
    common = u_side.join(v_side.select("src", "dst", "w", "rv"), ["src", "dst", "w"])
    ev = (
        u_side.select("src", "dst", F.col("ru").alias("r"), F.lit(1).alias("du"), F.lit(0).alias("dv"), F.lit(0).alias("dc"))
        .unionByName(
            v_side.select(
                "src", "dst", F.col("rv").alias("r"),
                F.lit(0).alias("du"), F.lit(1).alias("dv"), F.lit(0).alias("dc"),
            )
        )
        .unionByName(
            common.select(
                "src", "dst", F.greatest("ru", "rv").alias("r"),
                F.lit(0).alias("du"), F.lit(0).alias("dv"), F.lit(1).alias("dc"),
            )
        )
    )
    cw = Window.partitionBy("src", "dst").orderBy("r")
    cum = ev.groupBy("src", "dst", "r").agg(
        F.sum("du").alias("du"), F.sum("dv").alias("dv"), F.sum("dc").alias("dc")
    ).select(
        "src", "dst",
        F.sum("du").over(cw).alias("un"),
        F.sum("dv").over(cw).alias("vn"),
        F.sum("dc").over(cw).alias("cn"),
    )
    jacc = cum.select(
        "src", "dst",
        F.when(
            F.col("un") + F.col("vn") - F.col("cn") > 0,
            F.col("cn") / (F.col("un") + F.col("vn") - F.col("cn")),
        ).otherwise(F.lit(0.0)).alias("j"),
    )
    # materialize the per-edge maxima (|E| rows) so the big sides can be
    # unpersisted before returning — no executor-cache leak across calls
    best = jacc.groupBy("src", "dst").agg(F.max("j").alias("score")).localCheckpoint(
        eager=True
    )
    u_side.unpersist()
    v_side.unpersist()
    return e.join(best, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def quadrangle_score(graph: EdgeGraph) -> DataFrame:
    """ChibaNishizekiQuadrangleEdgeScore (``cpp/edgescores/
    ChibaNishizekiQuadrangleEdgeScore.cpp:14-100``): per edge, the
    number of quadrangles (4-cycles, chords allowed) containing it.
    The reference pivots on each node and adds ``marker[w] − 1`` per
    2-path; net effect: each 4-cycle adds 1 to each of its 4 edges.

    Spark shape: W(a, b) = common-neighbor counts for every distance-2
    pair (ONE wedge join — the same pass the link-prediction indices
    ride).  For edge (u, v), each cycle u–v–y–x has exactly one corner
    y ∈ N(v)∖{u}, and x ranges over (N(u) ∩ N(y))∖{v}, so
    score(u, v) = Σ_{y ∈ N(v)∖{u}} (W(u, y) − 1) — equivalently the
    number of 3-paths u→x→y→v with x ≠ v, y ≠ u, which is symmetric in
    the edge's orientation, so ONE orientation suffices.  W(u, y) ≥ 1
    is guaranteed (v is always a common neighbor)."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # W: common-neighbor counts for unordered pairs a < b (distance-2,
    # adjacency irrelevant)
    a = sym.select(F.col("dst").alias("z"), F.col("src").alias("a"))
    b = sym.select(F.col("dst").alias("z"), F.col("src").alias("b"))
    w_tab = (
        a.join(b, "z")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    # y ∈ N(dst)\{src} for every canonical edge
    uy = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(sym.select(F.col("src").alias("v"), F.col("dst").alias("y")), "v")
        .where(F.col("y") != F.col("u"))
        .select(
            "u", "v",
            F.least("u", "y").alias("a"), F.greatest("u", "y").alias("b"),
        )
    )
    quads = (
        uy.join(w_tab, ["a", "b"])
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(F.sum(F.col("cw") - 1).alias("q"))
    )
    return e.join(quads, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("q", F.lit(0)).cast("long").alias("score")
    )


def local_filter_score(
    graph: EdgeGraph, attribute: DataFrame, logarithmic: bool = True
) -> DataFrame:
    """(src, dst, score) — the generic ``LocalFilterScore``
    (``cpp/sparsification/LocalFilterScore.h:30-77``): per endpoint,
    rank incident edges by ``attribute`` DESC (ties share the smallest
    rank, SQL ``rank()`` — the reference's ``rank += numSame``
    bookkeeping), exponent e = 1 − log(rank)/log(d) (``logarithmic``)
    or 1 − (rank−1)/(d−1); each edge keeps the max of its two endpoint
    exponents.  ``attribute``: (src, dst, score) per canonical edge.
    ``local_degree_score`` is this filter over neighbor degree; this
    surface accepts ANY edge attribute (e.g. SimmelianOverlap or
    triangle counts, the reference's common instantiations)."""
    e = attribute.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("score").alias("attr"),
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "attr")
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    w = Window.partitionBy("src").orderBy(F.desc("attr"))
    ranked = (
        sym.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumn("rnk", F.rank().over(w))
        .select(
            "src",
            "dst",
            F.when(F.col("deg") <= 1, F.lit(1.0))
            .otherwise(
                1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("deg").cast("double"))
                if logarithmic
                else 1.0 - (F.col("rnk") - 1).cast("double") / (F.col("deg") - 1)
            )
            .alias("side_score"),
        )
    )
    return (
        ranked.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "side_score",
        )
        .groupBy("src", "dst")
        .agg(F.max("side_score").alias("score"))
    )


def random_node_edge_score(
    graph: EdgeGraph, rne_ratio: float = 0.8, seed: int = 42
) -> DataFrame:
    """(src, dst, score) — ``RandomNodeEdgeScore`` (``cpp/sparsification/
    RandomNodeEdgeScore.cpp:12-58``): scores are removal-order positions
    of a random edge-removal process mixing node-biased picks (random
    node → random incident edge, probability ``rne_ratio``) with uniform
    picks.

    Spark shape + documented deviation: the reference removes edges ONE
    AT A TIME (each pick re-normalizes over the surviving edges) — a
    driver loop of m steps.  Here the order is drawn in one shot as an
    exponential race: every edge gets priority −log(U)/p(e) with p(e)
    the FIRST-step mixture probability (p ∝ rne·(1/deg u + 1/deg v)/n +
    (1−rne)/m); the race realizes successive-sampling-without-
    replacement under FIXED weights, so it matches the reference's
    process exactly only while degrees don't drift — the same
    first-order bias (low-degree incident edges leave early → score
    low), fully parallel.  score = rank/m in [0, 1)."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    m = e.count()
    if m == 0:
        return e.select("src", "dst", F.lit(0.0).alias("score"))
    ann = (
        e.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("dv")), "dst")
        .select(
            "src",
            "dst",
            (
                F.lit(rne_ratio) * (1.0 / F.col("du") + 1.0 / F.col("dv")) / F.lit(float(n))
                + F.lit((1.0 - rne_ratio) / m)
            ).alias("p"),
        )
    )
    u01 = (
        (F.xxhash64(F.lit(seed), "src", "dst").cast("double") / F.lit(float(1 << 64)))
        + 0.5
    )
    raced = ann.withColumn(
        "prio", -F.log(F.greatest(u01, F.lit(1e-18))) / F.col("p")
    )
    # rank/m — like the reference, the score is a GLOBAL removal
    # position; ranked distributively (range partition + prefix
    # offsets), never a single-task window over the edge list.
    from networkit_spark.plans.rank import global_row_number

    ranked = global_row_number(raced, ["prio", "src", "dst"], out_col="_rk")
    return ranked.select(
        "src", "dst", (F.col("_rk").cast("double") / F.lit(float(m))).alias("score")
    )
