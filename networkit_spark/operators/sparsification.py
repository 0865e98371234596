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
    (rank by score asc, ties by edge key for determinism)."""
    w = Window.orderBy("score", "src", "dst")
    m = scores.count()
    return scores.select(
        "src", "dst", (F.row_number().over(w) / F.lit(float(m))).alias("score")
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
