"""Partition similarity measures — clustering-comparison metrics.

Reference (``cpp/community/NMIDistance.cpp``, ``JaccardMeasure.cpp``,
``AdjustedRandMeasure.cpp``, ``NodeStructuralRandMeasure.cpp``): all
derive from the label co-occurrence CONFUSION MATRIX
``n_{ij} = |C_i ∩ D_j|`` — one inner join + groupBy here; the pair
counts Σ C(n_ij, 2) etc. are scalar aggregations over it.

Conventions: measures return SIMILARITY in [0, 1] (the reference's
"distance" variants are 1 − similarity).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _confusion(a: DataFrame, b: DataFrame) -> DataFrame:
    """(la, lb, nij) from two (node, label) partitions over the same set."""
    return (
        a.select("node", F.col("label").alias("la"))
        .join(b.select("node", F.col("label").alias("lb")), "node")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("nij"))
    )


def _pairs(x):
    return x * (x - 1) / 2.0


def rand_index(a: DataFrame, b: DataFrame) -> float:
    """NodeStructuralRandMeasure similarity: fraction of node pairs on
    which the partitions agree."""
    conf = _confusion(a, b).persist()
    n = conf.agg(F.sum("nij")).collect()[0][0]
    s_ij = conf.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2.0)).collect()[0][0] or 0.0
    s_a = (
        conf.groupBy("la").agg(F.sum("nij").alias("ni"))
        .agg(F.sum(F.col("ni") * (F.col("ni") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    s_b = (
        conf.groupBy("lb").agg(F.sum("nij").alias("nj"))
        .agg(F.sum(F.col("nj") * (F.col("nj") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    conf.unpersist()
    total = _pairs(n)
    if total == 0:
        return 1.0
    return (total + 2 * s_ij - s_a - s_b) / total


def adjusted_rand(a: DataFrame, b: DataFrame) -> float:
    """AdjustedRandMeasure similarity (chance-corrected)."""
    conf = _confusion(a, b).persist()
    n = conf.agg(F.sum("nij")).collect()[0][0]
    s_ij = conf.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2.0)).collect()[0][0] or 0.0
    s_a = (
        conf.groupBy("la").agg(F.sum("nij").alias("ni"))
        .agg(F.sum(F.col("ni") * (F.col("ni") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    s_b = (
        conf.groupBy("lb").agg(F.sum("nij").alias("nj"))
        .agg(F.sum(F.col("nj") * (F.col("nj") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    conf.unpersist()
    total = _pairs(n)
    if total == 0:
        return 1.0
    expected = s_a * s_b / total
    mx = (s_a + s_b) / 2.0
    if mx == expected:
        return 1.0
    return (s_ij - expected) / (mx - expected)


def jaccard_measure(a: DataFrame, b: DataFrame) -> float:
    """JaccardMeasure similarity: pairs-together-in-both /
    pairs-together-in-either."""
    conf = _confusion(a, b).persist()
    s_ij = conf.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2.0)).collect()[0][0] or 0.0
    s_a = (
        conf.groupBy("la").agg(F.sum("nij").alias("ni"))
        .agg(F.sum(F.col("ni") * (F.col("ni") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    s_b = (
        conf.groupBy("lb").agg(F.sum("nij").alias("nj"))
        .agg(F.sum(F.col("nj") * (F.col("nj") - 1) / 2.0)).collect()[0][0] or 0.0
    )
    conf.unpersist()
    denom = s_a + s_b - s_ij
    return 1.0 if denom == 0 else s_ij / denom


def nmi(a: DataFrame, b: DataFrame) -> float:
    """NMIDistance similarity: mutual information normalized by
    max(H(A), H(B)) (the reference's normalization).

    Fully distributed: all three Σ terms (MI, H(A), H(B)) are
    aggregations over the confusion matrix joined back to its own
    marginals — nothing driver-sized is collected, so near-singleton
    partitions (confusion ≈ n rows) are fine at any scale."""
    conf = _confusion(a, b).persist()
    n = conf.agg(F.sum("nij")).collect()[0][0]
    if not n:
        conf.unpersist()
        return 1.0
    ma = conf.groupBy("la").agg(F.sum("nij").alias("ni"))
    mb = conf.groupBy("lb").agg(F.sum("nij").alias("nj"))
    mi = (
        conf.join(ma, "la")
        .join(mb, "lb")
        .agg(
            F.sum(
                (F.col("nij") / n)
                * F.log((F.col("nij") * float(n)) / (F.col("ni") * F.col("nj")))
            )
        )
        .collect()[0][0]
        or 0.0
    )
    ha = -(
        ma.agg(F.sum((F.col("ni") / n) * F.log(F.col("ni") / n))).collect()[0][0] or 0.0
    )
    hb = -(
        mb.agg(F.sum((F.col("nj") / n) * F.log(F.col("nj") / n))).collect()[0][0] or 0.0
    )
    conf.unpersist()
    mx = max(ha, hb)
    if mx == 0:
        return 1.0
    return mi / mx


def partition_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """(node, label) — the coarsest partition refining both inputs
    (``cpp/community/PartitionIntersection.cpp``): nodes share a label
    iff they share one in ``a`` AND in ``b``.  Labels are compacted to
    0..k−1 in (la, lb) order (the reference's ``result.compact()``);
    nodes present in only one input are dropped, like the reference's
    ``contains`` guard.  Shape: one join + one dense-id assignment over
    the DISTINCT pair set (bounded by #clusters², not n)."""
    from networkit_spark.graph import assign_dense_ids

    joined = a.select("node", F.col("label").alias("la")).join(
        b.select("node", F.col("label").alias("lb")), "node"
    )
    pairs = joined.select(F.struct("la", "lb").alias("_k")).distinct()
    ids = assign_dense_ids(pairs, "_k").select(
        F.col("_k.la").alias("la"), F.col("_k.lb").alias("lb"), F.col("id").alias("label")
    )
    return joined.join(ids, ["la", "lb"]).select("node", "label")


def graph_rand_index(graph, a: DataFrame, b: DataFrame) -> float:
    """GraphStructuralRandMeasure similarity
    (``cpp/community/GraphStructuralRandMeasure.cpp``): the fraction of
    EDGES on which the two partitions agree (both together or both
    apart).  Exact and fully distributed — one edge-to-labels join."""
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    la = a.select(F.col("node").alias("src"), F.col("label").alias("a_u"))
    lb = b.select(F.col("node").alias("src"), F.col("label").alias("b_u"))
    la2 = a.select(F.col("node").alias("dst"), F.col("label").alias("a_v"))
    lb2 = b.select(F.col("node").alias("dst"), F.col("label").alias("b_v"))
    row = (
        e.join(la, "src").join(lb, "src").join(la2, "dst").join(lb2, "dst")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(
                ((F.col("a_u") == F.col("a_v")) == (F.col("b_u") == F.col("b_v")))
                .cast("long")
            ).alias("agree"),
        )
        .collect()[0]
    )
    return 1.0 if not row["m"] else row["agree"] / row["m"]


def sampled_node_rand(
    graph, a: DataFrame, b: DataFrame, max_samples: int = 1000, seed: int = 42
) -> float:
    """SampledNodeStructuralRandMeasure similarity
    (``cpp/community/SampledNodeStructuralRandMeasure.cpp``): the
    node-structural Rand index estimated on ``max_samples`` random node
    pairs.  Deviation: the reference rejection-samples uniform id pairs
    with a global RNG; here both endpoints are drawn by seeded-hash
    TakeOrdered (deterministic, distributed — no driver loop), paired by
    rank, and self-pairs dropped."""
    from pyspark.sql.window import Window

    verts = graph.vertices().select(F.col("id").alias("node"))
    w = Window.orderBy("h")

    def draw(salt: int) -> DataFrame:
        return (
            verts.withColumn("h", F.xxhash64("node", F.lit(seed + salt)))
            .orderBy("h")
            .limit(max_samples)
            .withColumn("rn", F.row_number().over(w))  # ≤ max_samples rows
            .select("rn", "node")
        )

    pairs = (
        draw(0).withColumnRenamed("node", "u")
        .join(draw(1).withColumnRenamed("node", "v"), "rn")
        .where(F.col("u") != F.col("v"))
    )
    la = a.select(F.col("node").alias("u"), F.col("label").alias("a_u"))
    lb = b.select(F.col("node").alias("u"), F.col("label").alias("b_u"))
    la2 = a.select(F.col("node").alias("v"), F.col("label").alias("a_v"))
    lb2 = b.select(F.col("node").alias("v"), F.col("label").alias("b_v"))
    row = (
        pairs.join(la, "u").join(lb, "u").join(la2, "v").join(lb2, "v")
        .agg(
            F.count(F.lit(1)).alias("s"),
            F.sum(
                ((F.col("a_u") == F.col("a_v")) == (F.col("b_u") == F.col("b_v")))
                .cast("long")
            ).alias("agree"),
        )
        .collect()[0]
    )
    return 1.0 if not row["s"] else row["agree"] / row["s"]


def sampled_graph_rand(
    graph, a: DataFrame, b: DataFrame, max_samples: int = 1000, seed: int = 42
) -> float:
    """SampledGraphStructuralRandMeasure similarity
    (``cpp/community/SampledGraphStructuralRandMeasure.cpp``): the
    graph-structural Rand index estimated on ``max_samples`` sampled
    edges.  Deviation: the reference draws a uniform node then a uniform
    neighbor (edge probability ∝ 1/deg(u) + 1/deg(v)); here edges are
    sampled uniformly by seeded hash — deterministic and distributed."""
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .orderBy(F.xxhash64("src", "dst", F.lit(seed)))
        .limit(max_samples)
    )
    la = a.select(F.col("node").alias("src"), F.col("label").alias("a_u"))
    lb = b.select(F.col("node").alias("src"), F.col("label").alias("b_u"))
    la2 = a.select(F.col("node").alias("dst"), F.col("label").alias("a_v"))
    lb2 = b.select(F.col("node").alias("dst"), F.col("label").alias("b_v"))
    row = (
        e.join(la, "src").join(lb, "src").join(la2, "dst").join(lb2, "dst")
        .agg(
            F.count(F.lit(1)).alias("s"),
            F.sum(
                ((F.col("a_u") == F.col("a_v")) == (F.col("b_u") == F.col("b_v")))
                .cast("long")
            ).alias("agree"),
        )
        .collect()[0]
    )
    return 1.0 if not row["s"] else row["agree"] / row["s"]


def dynamic_nmi(old: DataFrame, new: DataFrame) -> float:
    """DynamicNMIDistance similarity
    (``cpp/community/DynamicNMIDistance.cpp``): NMI restricted to nodes
    assigned in BOTH clusterings (its ``isInBoth`` guard) — the measure
    for comparing snapshots of a growing/shrinking dynamic graph.
    :func:`nmi`'s confusion matrix already inner-joins on node, so the
    restriction is inherent; this alias documents the dynamic contract."""
    return nmi(old, new)


def nmi_distance(a: DataFrame, b: DataFrame) -> float:
    """``NMIDistance::getDissimilarity`` (``cpp/community/NMIDistance
    .cpp:19-123``): 1 − NMI (the reference's NMID via
    ``combineValues``); equal partitions → 0."""
    return 1.0 - nmi(a, b)


def node_structural_rand_distance(a: DataFrame, b: DataFrame) -> float:
    """``NodeStructuralRandMeasure::getDissimilarity``
    (``cpp/community/NodeStructuralRandMeasure.cpp:14-59``): the
    fraction of node pairs the two partitions DISAGREE on — 1 minus
    :func:`rand_index`."""
    return 1.0 - rand_index(a, b)


def graph_structural_rand_distance(graph, a: DataFrame, b: DataFrame) -> float:
    """``GraphStructuralRandMeasure::getDissimilarity``: edge-pair
    disagreement fraction — 1 minus :func:`graph_rand_index`."""
    return 1.0 - graph_rand_index(graph, a, b)
