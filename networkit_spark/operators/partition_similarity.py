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
