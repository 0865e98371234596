"""Link prediction indices — neighborhood-intersection joins.

``cpp/linkprediction/*`` (base ``LinkPredictor.h:22``): given a node
pair (u, v), score the likelihood of a (missing) edge.  The engine
computes ALL candidate pairs at distance 2 (pairs sharing ≥1 neighbor —
the only pairs with nonzero score for CN/Jaccard/AA/RA) in one
wedge join, scoring every index in the same pass:

- CommonNeighborsIndex: |N(u) ∩ N(v)|
- JaccardIndex:         |∩| / |∪|
- AdamicAdarIndex:      Σ_{z ∈ ∩} 1/ln(deg z)
- ResourceAllocationIndex: Σ_{z ∈ ∩} 1/deg z
- PreferentialAttachmentIndex: deg u · deg v  (computable for any pair)

``MissingLinksFinder`` = restrict to non-edges; ``LinkThresholder`` =
filter on score; ``PredictionsSorter`` = orderBy (score desc, pair asc).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph

_SCORES_SCHEMA = (
    "u long, v long, common_neighbors long, jaccard double, adamic_adar double, "
    "resource_alloc double, pref_attachment long, total_neighbors long, "
    "u_degree long, v_degree long, adjusted_rand double"
)


def _linkpred_fused_blocks(e: DataFrame, n_total: int, only_missing: bool) -> DataFrame:
    """Small-graph escape hatch (same family as ``plp(fused_local)`` /
    ``blobstep.run(fused_local)``, but PARALLEL): the wedge join
    materializes Σ_z deg(z)² rows — tens of millions even at bench scale
    — but when the node set fits a dense matrix, every index is three
    matmuls: CN = A·A, AA = (A·diag(1/ln d))·A, RA = (A·diag(1/d))·A.
    Spark pins python workers to one BLAS thread (OMP_NUM_THREADS=1), so
    instead of one fat task the SCORE-MATRIX ROW BLOCKS fan out: the edge
    array is broadcast (small by the fused gate), each task builds A once
    and computes its `A[block,:] @ A` slice — embarrassingly parallel,
    and the same row-block partitioning a dense-scores engine would use
    on a cluster.  float64 throughout so the wedge sums agree with the
    distributed aggregation (pytest asserts equality at 1e-9).  Graphs
    above ``$SPARK_GRAFT_FUSED_NODES`` (default 4096) nodes keep the
    distributed wedge join — this path never engages at raw-web scale."""
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    pdf = e.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], _SCORES_SCHEMA)
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    bc = spark.sparkContext.broadcast(
        (np.searchsorted(nodes, src), np.searchsorted(nodes, dst), nodes)
    )
    nb = max(1, min(spark.sparkContext.defaultParallelism * 2, n))
    bounds = [(int(lo), int(hi)) for lo, hi in zip(
        np.linspace(0, n, nb + 1)[:-1], np.linspace(0, n, nb + 1)[1:]
    ) if hi > lo]

    def kernel(batches):
        si, di, nds = bc.value
        A = np.zeros((n, n), dtype=np.float64)
        A[si, di] = 1.0
        A[di, si] = 1.0
        deg = A.sum(axis=1)
        # z contributes a wedge only with deg ≥ 2, so zeroing the weights
        # below that never drops a term — it just dodges 1/ln(1).
        f_ln = np.where(deg >= 2.0, 1.0 / np.log(np.maximum(deg, 2.0)), 0.0)
        f_inv = np.where(deg >= 2.0, 1.0 / np.maximum(deg, 1.0), 0.0)
        col = np.arange(n, dtype=np.int64)
        for b in batches:
            for lo, hi in zip(b["lo"].to_numpy(), b["hi"].to_numpy()):
                Ab = A[lo:hi]
                CN = Ab @ A
                AA = (Ab * f_ln) @ A
                RA = (Ab * f_inv) @ A
                # strict upper triangle of the GLOBAL matrix: v > u
                cand = (CN > 0.0) & (col[None, :] > np.arange(lo, hi)[:, None])
                if only_missing:
                    # exclude exactly the rows of `e` (u < v orientation),
                    # as the distributed anti-join does
                    blk = (si >= lo) & (si < hi)
                    cand[si[blk] - lo, di[blk]] = False
                    blk = (di >= lo) & (di < hi)
                    cand[di[blk] - lo, si[blk]] = False
                bi, vi = np.nonzero(cand)
                ui = bi + lo
                cn = CN[bi, vi]
                ud, vd = deg[ui], deg[vi]
                un = ud + vd - cn
                a_, b_, c_ = cn, ud - cn, vd - cn
                d_ = float(n_total) - un
                den = (
                    a_ * b_ + a_ * c_ + 2.0 * a_ * d_
                    + b_ * b_ + b_ * d_ + c_ * c_ + c_ * d_
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    ari = np.where(den != 0.0, 2.0 * (a_ * d_ - b_ * c_) / den, 0.0)
                yield pd.DataFrame(
                    {
                        "u": nds[ui],
                        "v": nds[vi],
                        "common_neighbors": cn.astype(np.int64),
                        "jaccard": cn / un,
                        "adamic_adar": AA[bi, vi],
                        "resource_alloc": RA[bi, vi],
                        "pref_attachment": (ud * vd).astype(np.int64),
                        "total_neighbors": un.astype(np.int64),
                        "u_degree": ud.astype(np.int64),
                        "v_degree": vd.astype(np.int64),
                        "adjusted_rand": ari,
                    }
                )

    blocks = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))
    return blocks.mapInPandas(kernel, _SCORES_SCHEMA)


def link_prediction_scores(
    graph: EdgeGraph, only_missing: bool = True, fused_local: bool | None = None
) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar, resource_alloc,
    pref_attachment, total_neighbors, u_degree, v_degree, adjusted_rand)
    for all distance-2 pairs (u < v).

    The round-out indices are all algebra over the same pass:
    ``TotalNeighborsIndex`` = |N(u) ∪ N(v)| = du + dv − cn
    (``cpp/linkprediction/TotalNeighborsIndex.cpp:13-15``);
    ``UDegreeIndex``/``VDegreeIndex`` (``UDegreeIndex.cpp``);
    ``AdjustedRandIndex`` (``AdjustedRandIndex.cpp:13-44``) with
    a = cn, b = |N(u)∖N(v)|, c = |N(v)∖N(u)|, d = n − |N(u)∪N(v)|,
    score = 2(ad − bc) / (ab + ac + 2ad + b² + bd + c² + cd).
    Documented deviation: the reference's ``uDifference``/``vDifference``
    are computed with ``std::set_union`` (``:29-32`` — so its b and c
    both equal the union size, an apparent copy-paste slip); we compute
    the set DIFFERENCES the surrounding formula calls for.

    ``fused_local`` — small-graph escape hatch (``None`` = auto by the
    ``$SPARK_GRAFT_FUSED_NODES`` threshold): dense-matmul all indices in
    one task instead of materializing the Σ deg² wedge join."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    n = graph.num_nodes()
    if fused_local is None:
        fused_local = not graph.directed and n <= int(
            os.environ.get("SPARK_GRAFT_FUSED_NODES", "4096")
        )
    if fused_local:
        return _linkpred_fused_blocks(e, n, only_missing)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    # wedges through z: (u - z - v), u < v
    a = sym.select(F.col("dst").alias("z"), F.col("src").alias("u"))
    b = sym.select(F.col("dst").alias("z"), F.col("src").alias("v"))
    wed = (
        a.join(b, "z")
        .where(F.col("u") < F.col("v"))
        .join(deg.withColumnRenamed("node", "z").withColumnRenamed("deg", "zdeg"), "z")
    )
    inter = wed.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(1.0 / F.log("zdeg")).alias("adamic_adar"),
        F.sum(1.0 / F.col("zdeg")).alias("resource_alloc"),
    )
    a_ = F.col("common_neighbors").cast("double")
    b_ = (F.col("udeg") - F.col("common_neighbors")).cast("double")
    c_ = (F.col("vdeg") - F.col("common_neighbors")).cast("double")
    d_ = (F.lit(n) - (F.col("udeg") + F.col("vdeg") - F.col("common_neighbors"))).cast("double")
    ari_den = (
        a_ * b_ + a_ * c_ + 2.0 * a_ * d_ + b_ * b_ + b_ * d_ + c_ * c_ + c_ * d_
    )
    scored = (
        inter.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "udeg"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "vdeg"), "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("udeg") + F.col("vdeg") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
            "resource_alloc",
            (F.col("udeg") * F.col("vdeg")).cast("long").alias("pref_attachment"),
            (F.col("udeg") + F.col("vdeg") - F.col("common_neighbors")).alias(
                "total_neighbors"
            ),
            F.col("udeg").alias("u_degree"),
            F.col("vdeg").alias("v_degree"),
            F.when(ari_den != 0, 2.0 * (a_ * d_ - b_ * c_) / ari_den)
            .otherwise(F.lit(0.0))
            .alias("adjusted_rand"),
        )
    )
    if only_missing:
        scored = scored.join(
            e.select(F.col("src").alias("u"), F.col("dst").alias("v")), ["u", "v"], "left_anti"
        )
    return scored


def top_predictions(graph: EdgeGraph, k: int = 10, index: str = "jaccard") -> DataFrame:
    """``PredictionsSorter`` + limit — top-k missing links by an index."""
    return (
        link_prediction_scores(graph, only_missing=True)
        .orderBy(F.desc(index), F.asc("u"), F.asc("v"))
        .limit(k)
    )


def katz_index_scores(
    graph: EdgeGraph,
    pairs: DataFrame,
    max_path_length: int = 5,
    damping: float = 0.005,
) -> DataFrame:
    """KatzIndex over a candidate pair list (``cpp/linkprediction/
    KatzIndex.cpp:34-61``, defaults ``KatzIndex.h:65``): from the
    lower-degree endpoint s, expand the SET frontier F_l = N(F_{l-1})
    for l = 1..maxPathLength and accumulate
    ``score(end) += damping^l · |N(end) ∩ F_{l-1}|`` — the reference's
    per-round hit counting (frontiers are de-duplicated node sets, not
    walk multisets).  All start nodes advance together: one frontier
    DataFrame keyed (start, node) — a multi-source BFS shape, L joins
    total, no per-pair loop.

    pairs: (u, v); returns (u, v, katz)."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    p = (
        pairs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u", "left")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v", "left")
        .select(
            "u", "v",
            F.when(F.coalesce("du", F.lit(0)) > F.coalesce("dv", F.lit(0)), F.col("v"))
            .otherwise(F.col("u")).alias("start"),
            F.when(F.coalesce("du", F.lit(0)) > F.coalesce("dv", F.lit(0)), F.col("u"))
            .otherwise(F.col("v")).alias("end"),
        )
        .persist()
    )
    frontier = p.select("start", F.col("start").alias("node")).distinct()
    total = None
    for l in range(1, max_path_length + 1):
        hits = (
            sym.join(frontier.withColumnRenamed("node", "src"), "src")
            .groupBy("start", F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        contrib = hits.select(
            "start", "node", (F.lit(float(damping) ** l) * F.col("cnt")).alias("sc")
        )
        total = contrib if total is None else total.unionByName(contrib)
        total = total.groupBy("start", "node").agg(F.sum("sc").alias("sc")).localCheckpoint(eager=True)
        frontier = hits.select("start", "node")
    out = (
        p.join(
            total.withColumnRenamed("node", "end").withColumnRenamed("sc", "katz"),
            ["start", "end"],
            "left",
        )
        .select("u", "v", F.coalesce("katz", F.lit(0.0)).alias("katz"))
    )
    sym.unpersist()
    return out


def train_test_split_edges(
    graph: EdgeGraph, test_frac: float = 0.2, seed: int = 42
) -> tuple[EdgeGraph, DataFrame]:
    """Deterministic hash split: (train graph, held-out positives(u, v)).
    The standard link-prediction evaluation protocol
    (``cpp/linkprediction/RandomLinkSampler``-style, hash-seeded)."""
    e = graph.edges.where(F.col("src") != F.col("dst"))
    u = (F.abs(F.xxhash64(F.lit(seed), "src", "dst")) % 1_000_000_007) / 1_000_000_007.0
    test = e.where(u < test_frac).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    train = e.where(u >= test_frac)
    return EdgeGraph(train, graph.directed, graph.weighted), test


def _curve_base(scored: DataFrame, positives: DataFrame, score_col: str) -> DataFrame:
    """Cumulative TP/FP per prediction in score-desc order (the
    reference's per-threshold statistics, ``EvaluationMetric.cpp``
    setPositivesAndNegatives + threshold sweep)."""
    from pyspark.sql.window import Window

    lab = scored.join(
        positives.select("u", "v", F.lit(1).alias("is_pos")), ["u", "v"], "left"
    ).select(
        F.col(score_col).alias("score"), F.coalesce("is_pos", F.lit(0)).alias("is_pos")
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    return lab.select(
        "score",
        F.sum("is_pos").over(w).alias("tp"),
        F.sum(1 - F.col("is_pos")).over(w).alias("fp"),
        F.sum("is_pos").over(Window.partitionBy()).alias("P"),
        F.sum(1 - F.col("is_pos")).over(Window.partitionBy()).alias("N"),
    )


def roc_curve(scored: DataFrame, positives: DataFrame, score_col: str = "jaccard") -> DataFrame:
    """(fpr, tpr) points (``ROCMetric::generatePoints``): tpr = TP/P,
    fpr = FP/N per threshold, keeping the LAST tpr at duplicate fpr."""
    base = _curve_base(scored, positives, score_col)
    pts = base.groupBy((F.col("fp") / F.col("N")).alias("fpr")).agg(
        F.max(F.col("tp") / F.col("P")).alias("tpr")
    )
    return pts.orderBy("fpr")


def pr_curve(scored: DataFrame, positives: DataFrame, score_col: str = "jaccard") -> DataFrame:
    """(recall, precision) points (``PrecisionRecallMetric::
    generatePoints``), last precision kept at duplicate recall."""
    base = _curve_base(scored, positives, score_col)
    pts = base.groupBy((F.col("tp") / F.col("P")).alias("recall")).agg(
        F.min(F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision")
    )
    return pts.orderBy("recall")


def auc(curve: DataFrame, x_col: str = "fpr", y_col: str = "tpr") -> float:
    """Trapezoidal area under a (small, collected) curve — the scalar
    the reference exposes via ``EvaluationMetric::getAreaUnderCurve``."""
    pts = sorted((r[x_col], r[y_col]) for r in curve.collect())
    if not pts:
        return 0.0
    pts = [(0.0, 0.0)] + pts if pts[0][0] > 0 else pts
    area = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        area += (x1 - x0) * (y0 + y1) / 2.0
    return area


def missing_links(graph: EdgeGraph, limit: int | None = None) -> DataFrame:
    """``MissingLinksFinder`` (``cpp/linkprediction/MissingLinksFinder.h:24``):
    all node pairs at distance EXACTLY 2 (share a neighbor, no edge) —
    the candidate set every index scores.  (u, v) with u < v."""
    out = link_prediction_scores(graph, only_missing=True).select("u", "v")
    return out.orderBy("u", "v").limit(limit) if limit else out


def same_community_index(
    graph: EdgeGraph, partition: DataFrame | None = None, pairs: DataFrame | None = None
) -> DataFrame:
    """``SameCommunityIndex`` (``cpp/linkprediction/SameCommunityIndex.cpp:
    15-35``): 1 iff both endpoints share a community; the reference
    clusters with PLM when no partition is given — so do we.
    ``partition`` = (node, label); ``pairs`` = (u, v), default = the
    distance-2 candidate set."""
    if partition is None:
        from networkit_spark.operators.louvain import plm

        partition = plm(graph)
    if pairs is None:
        pairs = missing_links(graph)
    lu = partition.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lv = partition.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    return (
        pairs.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            "u", "v",
            F.when(
                F.col("lu").isNotNull() & (F.col("lu") == F.col("lv")), 1.0
            ).otherwise(0.0).alias("same_community"),
        )
    )


def neighbors_measure_index(graph: EdgeGraph, pairs: DataFrame) -> DataFrame:
    """``NeighborsMeasureIndex`` (``cpp/linkprediction/NeighborsMeasureIndex
    .cpp:12-23``): for (u, v), count pairs (a ∈ N(u), b ∈ N(v)) with
    a == b or (a, b) ∈ E — i.e. common neighbors plus u–a–b–v 3-paths
    (with multiplicity).  The reference scores queried pairs one at a
    time; the Spark form scores a QUERY SET of pairs in two joins.
    O(Σ_pairs deg(u)·deg(v)) candidate rows by nature — meant for
    bounded query sets, like the per-pair reference surface."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    na = sym.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    nb = sym.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    cand = pairs.select("u", "v").join(na, "u").join(nb, "v")
    hit = cand.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
            e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        ),
        ["a", "b"],
        "left_semi",
    ).unionByName(cand.where(F.col("a") == F.col("b")).select("u", "v", "a", "b"))
    agg = hit.groupBy("u", "v").agg(F.count(F.lit(1)).alias("neighbors_measure"))
    return (
        pairs.select("u", "v")
        .join(agg, ["u", "v"], "left")
        .select("u", "v", F.coalesce("neighbors_measure", F.lit(0)).alias("neighbors_measure"))
    )


def neighborhood_distance_index(
    graph: EdgeGraph, pairs: DataFrame | None = None
) -> DataFrame:
    """``NeighborhoodDistanceIndex`` (``cpp/linkprediction/
    NeighborhoodDistanceIndex.cpp:14-19``): |N(u) ∩ N(v)| /
    √(deg u · deg v).  Default pair set = the distance-2 candidates
    (the only pairs with nonzero score); pass ``pairs`` (u, v) to score
    a query set — absent candidates score 0."""
    s = link_prediction_scores(graph, only_missing=False).select(
        "u", "v",
        (
            F.col("common_neighbors")
            / F.sqrt(F.col("u_degree").cast("double") * F.col("v_degree"))
        ).alias("neighborhood_distance"),
    )
    if pairs is None:
        return s
    return (
        pairs.select("u", "v")
        .join(s, ["u", "v"], "left")
        .select(
            "u", "v",
            F.coalesce("neighborhood_distance", F.lit(0.0)).alias(
                "neighborhood_distance"
            ),
        )
    )


def algebraic_distance_index(
    graph: EdgeGraph,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(u, v, algebraic_distance) — ``AlgebraicDistanceIndex``
    (``cpp/linkprediction/AlgebraicDistanceIndex.cpp:26-76``): the
    extended algebraic distance between queried pairs under the shared
    Jacobi-smoothed load vectors (``preprocess``).  norm=0 is the
    reference's MAX_NORM; the header default is norm=2.  Reuses the
    node-distance loads (one distributed smoothing, scored per pair by
    two joins); NaN → 0 like ``runImpl``'s final guard."""
    from networkit_spark.operators.node_distance import algebraic_distance_loads

    loads = algebraic_distance_loads(
        graph, num_systems, num_iterations, omega, seed
    )
    j = (
        pairs.select("u", "v")
        .join(loads.select(F.col("node").alias("u"), "sys", F.col("load").alias("lu")), "u")
        .join(
            loads.select(F.col("node").alias("v"), "sys", F.col("load").alias("lv")),
            ["v", "sys"],
        )
        .withColumn("absdiff", F.abs(F.col("lu") - F.col("lv")))
    )
    if norm == 0:
        agg = j.groupBy("u", "v").agg(F.max("absdiff").alias("d"))
    else:
        agg = j.groupBy("u", "v").agg(
            F.pow(F.sum(F.pow("absdiff", float(norm))), 1.0 / norm).alias("d")
        )
    return (
        pairs.select("u", "v")
        .join(agg, ["u", "v"], "left")
        .select(
            "u", "v",
            F.coalesce(
                F.when(F.isnan("d"), 0.0).otherwise(F.col("d")), F.lit(0.0)
            ).alias("algebraic_distance"),
        )
    )


def link_thresholder_by_score(
    scored: DataFrame, min_score: float, score_col: str = "jaccard"
) -> DataFrame:
    """``LinkThresholder::byScore`` (``cpp/linkprediction/LinkThresholder
    .cpp:16-28``): keep pairs with score ≥ minScore, returned
    pair-sorted like the reference's final ``Aux::Parallel::sort``."""
    return (
        scored.where(F.col(score_col) >= min_score)
        .select("u", "v")
        .orderBy("u", "v")
    )


def link_thresholder_by_count(
    scored: DataFrame, num_links: int, score_col: str = "jaccard"
) -> DataFrame:
    """``LinkThresholder::byCount`` (``LinkThresholder.cpp:30-43``): the
    ``num_links`` best-scored pairs (score desc, then pair asc —
    ``PredictionsSorter``'s tie order), returned pair-sorted.
    TakeOrdered bounds the selection at k rows; meant for
    prediction-list-sized k like the reference surface."""
    return (
        scored.orderBy(F.desc(score_col), F.asc("u"), F.asc("v"))
        .limit(num_links)
        .select("u", "v")
        .orderBy("u", "v")
    )


def link_thresholder_by_percentage(
    scored: DataFrame, percentage: float, score_col: str = "jaccard"
) -> DataFrame:
    """``LinkThresholder::byPercentage`` (``LinkThresholder.cpp:45-50``)."""
    if not 0.0 <= percentage <= 1.0:
        raise ValueError("Given percentage is not in [0, 1].")
    k = int(percentage * scored.count())
    return link_thresholder_by_count(scored, k, score_col)


def random_link_sampler_by_percentage(
    graph: EdgeGraph, train_percentage: float, seed: int = 42
) -> EdgeGraph:
    """``RandomLinkSampler::byPercentage`` (``cpp/linkprediction/
    RandomLinkSampler.cpp:13-18``): a training graph keeping ~the given
    fraction of edges, selected by seeded hash — the scale path (one
    filter, no ordering); the exact-count variant is
    :func:`random_link_sampler_by_count`."""
    if not 0.0 <= train_percentage <= 1.0:
        raise ValueError("Given percentage is not in [0, 1].")
    train, _ = train_test_split_edges(graph, 1.0 - train_percentage, seed)
    return train


def random_link_sampler_by_count(
    graph: EdgeGraph, num_train_links: int, seed: int = 42
) -> EdgeGraph:
    """``RandomLinkSampler::byCount`` (``RandomLinkSampler.cpp:20-31``):
    keep EXACTLY ``num_train_links`` uniformly chosen edges.  The exact
    count is a global selection by construction — implemented as the
    k-smallest seeded-hash prefix (TakeOrdered, k rows through the
    driver stage); for cluster-scale k prefer the percentage form."""
    e = graph.edges
    total = e.count()
    if num_train_links > total:
        raise ValueError("num_train_links > number of edges.")
    kept = (
        e.withColumn("_h", F.xxhash64(F.lit(seed), "src", "dst"))
        .orderBy("_h", "src", "dst")
        .limit(num_train_links)
        .drop("_h")
    )
    return EdgeGraph(kept, graph.directed, graph.weighted)
