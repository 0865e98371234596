"""PLM — parallel Louvain method (multilevel modularity maximization).

Reference (``cpp/community/PLM.cpp:29``, 400 LoC; the default of
``community.detectCommunities``, ``networkit/community.py:39-40``):

1. LOCAL MOVING: every node greedily moves to the neighboring community
   with the largest modularity delta
   ``ΔQ(u: C→D) = (w(u,D) − w(u,C\\u))/m + γ·vol(u)·(vol(C\\u) − vol(D))/(2m²)``
   (``PLM.cpp:167``); repeat to fixpoint / iteration cap.
2. COARSEN by the partition (``ParallelPartitionCoarsening``) and
   recurse on the community graph (``PLM.cpp:280-295``); unfold the
   multilevel mapping on the way back.

The reference moves asynchronously under OpenMP (non-deterministic);
this engine moves SYNCHRONOUSLY (all gains computed against the
previous sweep's labels) with deterministic tie-breaks (largest gain,
then smallest community id).  Synchronous moves oscillate: two adjacent
singletons each adopt the OTHER's community in the same sweep and the
pair swaps forever (the classic sync label-propagation 2-cycle), which
stalls aggregation.  The standard distributed-Louvain remedy is applied:
sweeps alternate a deterministic node-hash PARITY gate — only half the
nodes may move per sweep, so one side of every would-be swap holds
still and absorbs the other.  Gains are still required strictly
positive; determinism across partition counts is tested.

Spark shape per sweep: 3 aggregations (community volumes; per-(node,
neighbor-community) affinities; argmax) — all whole-stage-codegen
DataFrame ops; the coarsen step is the §2.10 operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.coarsening import coarsen_by_partition


def _local_moving(graph: EdgeGraph, gamma: float, max_sweeps: int) -> DataFrame:
    sym = graph.sym().where(F.col("src") != F.col("dst")).persist()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = (
        graph.sym()
        .groupBy(F.col("src").alias("node"))
        .agg((F.sum("weight") + F.sum(loop_extra)).alias("vol"))
        .persist()
    )
    two_m = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    if two_m == 0:
        return graph.vertices().select(F.col("id").alias("node"), F.col("id").alias("label"))
    m_tot = two_m / 2.0

    labels = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)

    zero_streak = 0
    for sweep in range(max_sweeps):
        cvol = labels.join(vol, "node").groupBy("label").agg(F.sum("vol").alias("cvol"))
        # affinity of u to each neighboring community (self-loops excluded)
        aff = (
            sym.join(labels.withColumnRenamed("node", "src").withColumnRenamed("label", "dlabel"), "src")
            .select(F.col("dst").alias("node"), F.col("dlabel").alias("cand"), "weight")
            .groupBy("node", "cand")
            .agg(F.sum("weight").alias("aff"))
        )
        ann = (
            aff.join(labels, "node")
            .join(vol, "node")
            .join(cvol.withColumnRenamed("label", "cand").withColumnRenamed("cvol", "cand_vol"), "cand")
            .join(cvol, "label")
        )
        # affC = affinity to own community (0 if none of u's neighbors share it)
        own = ann.where(F.col("cand") == F.col("label")).select(
            "node", F.col("aff").alias("aff_own")
        )
        cand = (
            ann.where(F.col("cand") != F.col("label"))
            .join(own, "node", "left")
            .select(
                "node",
                "cand",
                "label",
                (
                    (F.col("aff") - F.coalesce("aff_own", F.lit(0.0))) / m_tot
                    + gamma
                    * F.col("vol")
                    * ((F.col("cvol") - F.col("vol")) - F.col("cand_vol"))
                    / (2.0 * m_tot * m_tot)
                ).alias("gain"),
            )
        )
        # the parity hash ROTATES every two sweeps: a 2-cycle whose both
        # nodes share a parity under one hash (the gate's blind spot —
        # they'd swap forever) is split by a later hash with prob. 1/2
        # per rotation, so every oscillation dies geometrically fast.
        # Still deterministic: depends only on (sweep, node).
        parity_ok = F.pmod(
            F.xxhash64(F.lit(17 + sweep // 2), F.col("node")), F.lit(2)
        ) == F.lit(sweep % 2)
        best = (
            cand.where(F.col("gain") > 1e-12)
            .where(parity_ok)
            .groupBy("node")
            .agg(F.expr("min_by(cand, struct(-gain, cand))").alias("new_label"))
        )
        new_labels = labels.join(best, "node", "left").select(
            "node",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
        )
        # hard lineage break every 8th sweep (chained localCheckpoints
        # accumulate multi-MB task binaries) — shared session-rooted,
        # atexit-cleaned round-trip helper
        from networkit_spark.graph import truncate_lineage

        new_labels = truncate_lineage(new_labels, sweep, every=8)
        moved = new_labels.where("chg").count()
        labels = new_labels.select("node", "label")
        # a zero sweep only proves one parity class is stable — stop
        # after BOTH classes pass without a move
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break
    sym.unpersist()
    vol.unpersist()
    return labels


def plm(
    graph: EdgeGraph,
    gamma: float = 1.0,
    max_sweeps: int = 16,
    max_levels: int = 10,
) -> DataFrame:
    """(node, label) — multilevel Louvain; labels are community
    representatives' (coarse) ids, compact via ``quality.compact``."""
    level_maps: list[DataFrame] = []
    g = graph
    prev_comms = None
    for _ in range(max_levels):
        labels = _local_moving(g, gamma, max_sweeps)
        n_comms = labels.select("label").distinct().count()
        level_maps.append(labels)
        if n_comms == g.num_nodes() or (prev_comms is not None and n_comms >= prev_comms):
            break
        prev_comms = n_comms
        g, _ = coarsen_by_partition(g, labels)
        # materialize the coarse edge table: the next level's sweeps must
        # not re-derive it through the whole lower-level lineage each job
        # (persist+count, not localCheckpoint — the latter wedges the JVM
        # when interleaved with the sweep loop's own checkpoints)
        coarse_edges = g.edges.persist()
        coarse_edges.count()
        g = EdgeGraph(coarse_edges, g.directed, g.weighted)

    final = level_maps[0]
    for nxt in level_maps[1:]:
        final = (
            final.join(
                nxt.withColumnRenamed("label", "upper").withColumnRenamed("node", "label"),
                "label",
            )
            .select("node", F.col("upper").alias("label"))
        )
    return final.localCheckpoint(eager=True)
