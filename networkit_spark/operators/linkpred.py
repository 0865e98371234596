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

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def link_prediction_scores(graph: EdgeGraph, only_missing: bool = True) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar, resource_alloc,
    pref_attachment) for all distance-2 pairs (u < v)."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
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
