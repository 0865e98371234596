"""LouvainMapEquation — local moving that minimizes the map equation.

Reference: ``cpp/community/LouvainMapEquation.{h,cpp}`` (the fork's
Infomap-objective Louvain, authors Wiebigke/Hamann/Gottesbüren).
Semantics reproduced:

* Node volume counts a self-loop's weight TWICE; a node's initial
  cluster cut is its weighted degree excluding loops
  (``LouvainMapEquation.cpp:464-509`` calculateInitialClusterCutAndVolume).
* Move objective is ``fitnessChange`` (``LouvainMapEquation.h:138-177``):
  the change in the two-level map equation restricted to the terms that
  differ between target clusters, with every mass normalized by the
  (constant) total volume and ``plogp(x) = (x/vol)·ln(x/vol)``.
* A node moves to the neighboring cluster with the SMALLEST change,
  only if strictly smaller than the stay-home change; ties between
  candidate clusters break to the smaller cluster id
  (``LouvainMapEquation.cpp:346-356``).
* The reference's SynchronousLocalMoving evaluates all nodes against the
  same snapshot and applies moves in chunks.  This engine is fully
  synchronous per sweep with the same node-hash parity gate used by
  ``louvain.plm`` — only half the nodes may move per sweep, which kills
  the two-node swap oscillation synchronous moving is prone to while
  keeping every accepted move one the reference would accept (each is
  evaluated against a consistent snapshot and strictly improves the map
  equation at that snapshot).

Spark shape per sweep: cluster volumes + cluster cuts (two aggregations
over the symmetrized edge table), per-(node, neighbor-cluster)
affinities (one aggregation), then a pure-expression argmin — all
whole-stage-codegen JVM ops, no UDFs, no collects beyond the one-row
move count.  At 100 TB each sweep is three shuffles keyed on node /
cluster ids; cluster stats are tiny relative to edges and broadcast-join
below the autoBroadcast threshold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _plogp(col, total_vol: float):
    p = col / F.lit(total_vol)
    return F.when(col > 0, p * F.log(p)).otherwise(F.lit(0.0))


def _node_stats(graph: EdgeGraph):
    """(vol incl. loops x2, loop weight) per node + symmetric non-loop edges."""
    sym = graph.sym()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = sym.groupBy(F.col("src").alias("node")).agg(
        (F.sum("weight") + F.sum(loop_extra)).alias("vol"),
        F.sum(loop_extra).alias("loop"),
    )
    nonloop = sym.where(F.col("src") != F.col("dst"))
    return vol, nonloop


def louvain_map_equation(
    graph: EdgeGraph, max_iterations: int = 32
) -> DataFrame:
    """(node, label) — flat synchronous local moving on the map equation.

    ``max_iterations`` caps sweeps like the reference's ``maxIterations``
    (default 256 there; sweeps converge far earlier in practice).
    """
    vol, nonloop = _node_stats(graph)
    vol = vol.persist()
    nonloop = nonloop.persist()
    total_volume = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    if total_volume == 0:
        return graph.vertices().select(F.col("id").alias("node"), F.col("id").alias("label"))

    labels = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)

    zero_streak = 0
    for sweep in range(max_iterations):
        lab_src = labels.withColumnRenamed("node", "src").withColumnRenamed("label", "slabel")
        lab_dst = labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "dlabel")
        tagged = nonloop.join(lab_src, "src").join(lab_dst, "dst")
        # cluster cut: weight of crossing edges, counted once per side
        ccut = (
            tagged.where(F.col("slabel") != F.col("dlabel"))
            .groupBy(F.col("slabel").alias("label"))
            .agg(F.sum("weight").alias("ccut"))
        )
        cvol = labels.join(vol, "node").groupBy("label").agg(F.sum("vol").alias("cvol"))
        cstats = (
            cvol.join(ccut, "label", "left")
            .select("label", "cvol", F.coalesce("ccut", F.lit(0.0)).alias("ccut"))
            .persist()
        )
        total_cut = cstats.agg(F.sum("ccut")).collect()[0][0] or 0.0

        # per-(node, neighbor-cluster) affinity, own cluster included
        aff = (
            tagged.select(F.col("dst").alias("node"), F.col("slabel").alias("cand"), "weight")
            .groupBy("node", "cand")
            .agg(F.sum("weight").alias("aff"))
        )
        own = aff.join(labels, "node").where(F.col("cand") == F.col("label")).select(
            "node", F.col("aff").alias("w2cur")
        )
        base = (
            labels.join(vol, "node")
            .join(own, "node", "left")
            .join(
                cstats.select(
                    "label",
                    F.col("cvol").alias("cur_vol"),
                    F.col("ccut").alias("cur_cut"),
                ),
                "label",
            )
            .withColumn("w2cur", F.coalesce("w2cur", F.lit(0.0)))
        )

        v, lo, w2c = F.col("vol"), F.col("loop"), F.col("w2cur")
        cut_diff_cur = 2 * w2c - v + 2 * lo
        # stay-home change (target == current branch of fitnessChange)
        stay = (
            _plogp(F.lit(total_cut), total_volume)
            + (
                _plogp(F.col("cur_cut") + F.col("cur_vol"), total_volume)
                - _plogp(F.col("cur_cut") + cut_diff_cur + F.col("cur_vol") - v, total_volume)
            )
            - 2.0
            * (
                _plogp(F.col("cur_cut"), total_volume)
                - _plogp(F.col("cur_cut") + cut_diff_cur, total_volume)
            )
        )
        base = base.withColumn("stay", stay)

        cand = (
            aff.join(labels, "node")
            .where(F.col("cand") != F.col("label"))
            .join(base.select("node", "vol", "loop", "w2cur", "stay"), "node")
            .join(
                cstats.select(
                    F.col("label").alias("cand"),
                    F.col("cvol").alias("tgt_vol"),
                    F.col("ccut").alias("tgt_cut"),
                ),
                "cand",
            )
        )
        w2t = F.col("aff")
        cut_diff_tgt = v - 2 * w2t - 2 * lo
        change = (
            _plogp(F.lit(total_cut) + cut_diff_cur + cut_diff_tgt, total_volume)
            + (
                _plogp(F.col("tgt_cut") + cut_diff_tgt + F.col("tgt_vol") + v, total_volume)
                - _plogp(F.col("tgt_cut") + F.col("tgt_vol"), total_volume)
            )
            - 2.0
            * (
                _plogp(F.col("tgt_cut") + cut_diff_tgt, total_volume)
                - _plogp(F.col("tgt_cut"), total_volume)
            )
        )
        parity_ok = F.pmod(F.xxhash64(F.lit(23), F.col("node")), F.lit(2)) == F.lit(sweep % 2)
        best = (
            cand.withColumn("change", change)
            .where(F.col("change") < F.col("stay") - 1e-12)
            .where(parity_ok)
            .groupBy("node")
            .agg(F.expr("min_by(cand, struct(change, cand))").alias("new_label"))
        )
        new_labels = labels.join(best, "node", "left").select(
            "node",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
        ).localCheckpoint(eager=True)
        moved = new_labels.where("chg").count()
        labels = new_labels.select("node", "label")
        cstats.unpersist()
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break
    vol.unpersist()
    nonloop.unpersist()
    return labels


def map_equation(graph: EdgeGraph, labels: DataFrame) -> float:
    """Two-level map equation L(M) in nats (lower is better).

    ``L = plogp(q) − 2·Σ_c plogp(q_c) + Σ_c plogp(q_c + vol_c)
        − Σ_v plogp(vol_v)``, all masses normalized by total volume —
    ``LouvainMapEquation.cpp:520-545`` (mapEquation / plogpRel).
    """
    vol, nonloop = _node_stats(graph)
    total_volume = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    if total_volume == 0:
        return 0.0
    lab_src = labels.withColumnRenamed("node", "src").withColumnRenamed("label", "slabel")
    lab_dst = labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "dlabel")
    ccut = (
        nonloop.join(lab_src, "src")
        .join(lab_dst, "dst")
        .where(F.col("slabel") != F.col("dlabel"))
        .groupBy(F.col("slabel").alias("label"))
        .agg(F.sum("weight").alias("ccut"))
    )
    cvol = labels.join(vol, "node").groupBy("label").agg(F.sum("vol").alias("cvol"))
    cstats = cvol.join(ccut, "label", "left").select(
        "cvol", F.coalesce("ccut", F.lit(0.0)).alias("ccut")
    )
    row = cstats.agg(
        F.sum("ccut").alias("q"),
        F.sum(_plogp(F.col("ccut"), total_volume)).alias("sum_cut"),
        F.sum(_plogp(F.col("ccut") + F.col("cvol"), total_volume)).alias("sum_cut_vol"),
    ).collect()[0]
    sum_node = vol.agg(F.sum(_plogp(F.col("vol"), total_volume))).collect()[0][0] or 0.0
    q = row["q"] or 0.0
    plogp_q = (q / total_volume) * math.log(q / total_volume) if q > 0 else 0.0
    return plogp_q - 2.0 * row["sum_cut"] + row["sum_cut_vol"] - sum_node
