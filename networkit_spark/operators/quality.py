"""Partition aggregates and community quality measures.

- Partition surface (``cpp/structures/Partition.h``):
  ``numberOfSubsets``/``subsetSizes``/``subsetSizeMap``/``getMembers``/
  ``compact`` → DataFrame group-bys.
- ``Modularity`` (``cpp/community/Modularity.cpp:28-75``):
  Q = coverage − expected coverage
    = (intra-edge weight)/total − Σ_C (vol C)² / (2·total)²
  with self-loops counted per the reference's volume rule (volume adds
  the self-loop weight twice — ``PLM.cpp:53-65``) and total = total edge
  weight (+ self-loop weight again, ``Graph::totalEdgeWeight`` counts a
  loop once; Modularity uses 2m in the denominator via volumes).
- ``Coverage`` (``cpp/community/Coverage.cpp``): intra/total.
- ``EdgeCut`` (``cpp/community/EdgeCut.cpp``): total inter-cluster weight.
- ``Conductance`` per cluster: cut(C) / min(vol(C), vol(V\\C)).

Per-cluster local evaluation measures (``cpp/community/
LocalPartitionEvaluation.h`` family), each returning one row per
non-empty cluster; the reference's ``get{Unweighted,Weighted}Average``
/ min / max roll-ups are a trivial aggregate over the returned frame
(see :func:`evaluation_summary`):

- ``PartitionHubDominance`` (``cpp/community/PartitionHubDominance.cpp:
  11-72``): max internal degree / (|C|-1), 1.0 for singletons.
- ``IntrapartitionDensity`` (``cpp/community/IntrapartitionDensity.cpp:
  8-74``): intra-edge count / (|C| choose 2), 1.0 when no pair exists.
- ``IsolatedInterpartitionConductance`` (``cpp/community/
  IsolatedInterpartitionConductance.cpp:8-71``): cut(C) /
  min(vol(C), vol(G)-vol(C)) with volumes accumulated per edge endpoint
  (a self-loop adds 2w to its cluster volume), 0 when the denominator
  is 0.
- ``IsolatedInterpartitionExpansion`` (``cpp/community/
  IsolatedInterpartitionExpansion.cpp:8-59``): cut(C) / min(|C|, n-|C|).
- ``PartitionFragmentation`` (``cpp/community/PartitionFragmentation.cpp:
  10-77``): 1 - (largest piece of C ∩ connected-component) / |C|.
- ``StablePartitionNodes`` (``cpp/community/StablePartitionNodes.cpp:
  10-81``): fraction of nodes in C whose own-label incident weight is
  strictly greater than every other label's (isolated nodes stable).

All are label-join + aggregate plans: one shuffle keyed on the node id
to attach labels, one keyed on the label for the roll-up — no
cartesian, no collect; they hold at 100× data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def subset_sizes(labels: DataFrame) -> DataFrame:
    """(label, size) — ``Partition::subsetSizeMap``."""
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def compact(labels: DataFrame) -> DataFrame:
    """(node, label) with labels densified 0..k-1 in ascending old-label
    order — ``Partition::compact``.  Label count can approach n (near-
    singleton partitions), so the rank is assigned by the distributed
    per-partition-offset path, not a single-task global window."""
    from networkit_spark.graph import assign_dense_ids

    distinct = labels.select("label").distinct()
    remap = assign_dense_ids(distinct, key_col="label").select(
        "label", F.col("id").alias("new_label")
    )
    return labels.join(remap, "label").select(
        "node", F.col("new_label").alias("label")
    )


def _annotated(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    return graph.edges.join(lab_src, "src").join(lab_dst, "dst")


def coverage(graph: EdgeGraph, labels: DataFrame) -> float:
    """intra-cluster edge weight / total edge weight (self-loops intra)."""
    e = _annotated(graph, labels)
    agg = e.agg(
        F.sum(F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)).alias("intra"),
        F.sum("weight").alias("total"),
    ).collect()[0]
    return (agg["intra"] or 0.0) / agg["total"] if agg["total"] else 0.0


def edge_cut(graph: EdgeGraph, labels: DataFrame) -> float:
    """total inter-cluster edge weight (``EdgeCut.cpp``)."""
    e = _annotated(graph, labels)
    return (
        e.where(F.col("src_label") != F.col("dst_label")).agg(F.sum("weight")).collect()[0][0]
        or 0.0
    )


def modularity(graph: EdgeGraph, labels: DataFrame) -> float:
    """Newman modularity, reference semantics (``Modularity.cpp:28-75``):
    volumes count self-loop weight twice; total = Σ volumes / 2."""
    sym = graph.sym()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = sym.groupBy(F.col("src").alias("node")).agg(
        (F.sum("weight") + F.sum(loop_extra)).alias("vol")
    )
    cvol = (
        vol.join(labels, "node")
        .groupBy("label")
        .agg(F.sum("vol").alias("cvol"))
    )
    two_m = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    if two_m == 0:
        return 0.0
    cov = coverage(graph, labels)
    expected = (
        cvol.agg(F.sum(F.col("cvol") * F.col("cvol"))).collect()[0][0] or 0.0
    ) / (two_m * two_m)
    return cov - expected


def conductance(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, conductance) per cluster: cut(C)/min(vol(C), vol(rest))."""
    sym = graph.sym()
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    vol = sym.groupBy(F.col("src").alias("node")).agg(
        (F.sum("weight") + F.sum(loop_extra)).alias("vol")
    )
    cvol = vol.join(labels, "node").groupBy("label").agg(F.sum("vol").alias("cvol"))
    total = vol.agg(F.sum("vol")).collect()[0][0] or 0.0
    e = _annotated(graph, labels)
    cut_src = (
        e.where(F.col("src_label") != F.col("dst_label"))
        .select(F.col("src_label").alias("label"), "weight")
    )
    cut_dst = (
        e.where(F.col("src_label") != F.col("dst_label"))
        .select(F.col("dst_label").alias("label"), "weight")
    )
    cut = cut_src.unionByName(cut_dst).groupBy("label").agg(F.sum("weight").alias("cut"))
    return cvol.join(cut, "label", "left").select(
        "label",
        (
            F.coalesce("cut", F.lit(0.0))
            / F.least(F.col("cvol"), F.lit(total) - F.col("cvol"))
        ).alias("conductance"),
    )


# ---------------------------------------------------------------------------
# local (per-cluster) partition evaluation measures
# ---------------------------------------------------------------------------


def _labeled_sym(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """sym view with both endpoint labels attached (one shuffle per side)."""
    lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("src_label"))
    lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("dst_label"))
    return graph.sym().join(lab_src, "src").join(lab_dst, "dst")


def _cluster_cut(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, cut) — inter-cluster weight charged to BOTH endpoint
    clusters, the accumulation rule shared by both IsolatedInterpartition
    measures (``IsolatedInterpartitionConductance.cpp:20-24``)."""
    e = _annotated(graph, labels).where(F.col("src_label") != F.col("dst_label"))
    per_side = e.select(F.col("src_label").alias("label"), "weight").unionByName(
        e.select(F.col("dst_label").alias("label"), "weight")
    )
    return per_side.groupBy("label").agg(F.sum("weight").alias("cut"))


def hub_dominance(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, value) — ``PartitionHubDominance.cpp:11-72``: per cluster,
    the max internal degree over (|C|-1); singletons score 1.0."""
    ls = _labeled_sym(graph, labels)
    internal = (
        ls.where(F.col("src_label") == F.col("dst_label"))
        .groupBy(F.col("src").alias("node"), F.col("src_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("ideg"))
    )
    sizes = subset_sizes(labels)
    max_ideg = internal.groupBy("label").agg(F.max("ideg").alias("max_ideg"))
    return sizes.join(max_ideg, "label", "left").select(
        "label",
        F.when(F.col("size") <= 1, F.lit(1.0))
        .otherwise(
            F.coalesce("max_ideg", F.lit(0)).cast("double") / (F.col("size") - 1)
        )
        .alias("value"),
    )


def cover_hub_dominance(graph: EdgeGraph, cover: DataFrame) -> DataFrame:
    """(label, value) — ``CoverHubDominance.cpp:11-79``: per community c,
    max over members u of |{v ∈ N(u) : c ∈ C(v)}|, divided by |c|−1;
    singletons score 1.0.  ``cover`` = multi-membership (node, label)
    rows.  The partition pipeline already computes exactly this when the
    label table carries one row per membership: the src×dst label join
    yields one row per (edge, shared community), so the per-(u, c)
    count IS the cover-internal degree — shared machinery, cover-correct
    by construction (pytest-anchored on an overlapping fixture)."""
    return hub_dominance(graph, cover)


def intrapartition_density(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, value) — ``IntrapartitionDensity.cpp:8-74``: intra-edge
    count / (|C| choose 2); clusters with no possible pair score 1.0."""
    e = _annotated(graph, labels)
    intra = (
        e.where(F.col("src_label") == F.col("dst_label"))
        .groupBy(F.col("src_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra"))
    )
    sizes = subset_sizes(labels)
    return sizes.join(intra, "label", "left").select(
        "label",
        F.when(F.col("size") * (F.col("size") - 1) / 2 <= 0, F.lit(1.0))
        .otherwise(
            F.coalesce("intra", F.lit(0)).cast("double")
            / (F.col("size") * (F.col("size") - 1) / 2)
        )
        .alias("value"),
    )


def isolated_interpartition_conductance(
    graph: EdgeGraph, labels: DataFrame
) -> DataFrame:
    """(label, value) — ``IsolatedInterpartitionConductance.cpp:8-71``:
    cut(C) / min(vol(C), vol(G) - vol(C)), 0 when the denominator is 0.
    Volumes accumulate per edge endpoint, so a self-loop contributes 2w
    to its cluster's volume and 2w to the total."""
    e = _annotated(graph, labels)
    per_side_vol = e.select(F.col("src_label").alias("label"), "weight").unionByName(
        e.select(F.col("dst_label").alias("label"), "weight")
    )
    cvol = per_side_vol.groupBy("label").agg(F.sum("weight").alias("cvol"))
    total = per_side_vol.agg(F.sum("weight")).collect()[0][0] or 0.0
    cut = _cluster_cut(graph, labels)
    sizes = subset_sizes(labels)
    return (
        sizes.join(cvol, "label", "left")
        .join(cut, "label", "left")
        .select(
            "label",
            F.when(
                F.least(F.coalesce("cvol", F.lit(0.0)), F.lit(total) - F.coalesce("cvol", F.lit(0.0))) <= 0,
                F.lit(0.0),
            )
            .otherwise(
                F.coalesce("cut", F.lit(0.0))
                / F.least(F.col("cvol"), F.lit(total) - F.col("cvol"))
            )
            .alias("value"),
        )
    )


def isolated_interpartition_expansion(
    graph: EdgeGraph, labels: DataFrame
) -> DataFrame:
    """(label, value) — ``IsolatedInterpartitionExpansion.cpp:8-59``:
    cut(C) / min(|C|, n - |C|); 0 for the degenerate one-cluster case
    (same guard as the conductance sibling — NULL would silently drop
    the cluster from ``evaluation_summary``)."""
    n = labels.count()
    cut = _cluster_cut(graph, labels)
    sizes = subset_sizes(labels)
    denom = F.least(F.col("size"), F.lit(n) - F.col("size"))
    return sizes.join(cut, "label", "left").select(
        "label",
        F.when(denom > 0, F.coalesce("cut", F.lit(0.0)) / denom)
        .otherwise(F.lit(0.0))
        .alias("value"),
    )


def partition_fragmentation(
    graph: EdgeGraph, labels: DataFrame, components: DataFrame | None = None
) -> DataFrame:
    """(label, value) — ``PartitionFragmentation.cpp:10-77``: per cluster,
    1 - (largest piece of C ∩ connected-component) / |C|.  ``components``
    may be precomputed ``(node, label)`` from
    :func:`~networkit_spark.operators.components.connected_components`."""
    if components is None:
        from networkit_spark.operators.components import connected_components

        components = connected_components(graph)
    comp = components.select("node", F.col("label").alias("comp"))
    ints = (
        labels.join(comp, "node")
        .groupBy("label", "comp")
        .agg(F.count(F.lit(1)).alias("piece"))
        .groupBy("label")
        .agg(F.max("piece").alias("max_piece"))
    )
    sizes = subset_sizes(labels)
    return sizes.join(ints, "label", "left").select(
        "label",
        (
            F.lit(1.0)
            - F.coalesce("max_piece", F.lit(0)).cast("double") / F.col("size")
        ).alias("value"),
    )


def stable_partition_nodes(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """(label, value) — ``StablePartitionNodes.cpp:10-81``: fraction of
    nodes in C whose incident weight to their own label is positive and
    strictly greater than the weight to every other label; isolated
    nodes count as stable."""
    ls = _labeled_sym(graph, labels)
    lw = ls.groupBy(
        F.col("src").alias("node"),
        F.col("src_label").alias("own_label"),
        F.col("dst_label").alias("nbr_label"),
    ).agg(F.sum("weight").alias("w"))
    per_node = lw.groupBy("node", "own_label").agg(
        F.sum(F.when(F.col("nbr_label") == F.col("own_label"), F.col("w")).otherwise(0.0)).alias("own_w"),
        F.max(F.when(F.col("nbr_label") != F.col("own_label"), F.col("w"))).alias("max_other"),
    )
    stable = per_node.select(
        "node",
        F.col("own_label").alias("label"),
        (
            (F.col("own_w") > 0)
            & (F.coalesce("max_other", F.lit(float("-inf"))) < F.col("own_w"))
        ).cast("int").alias("stable"),
    )
    # isolated nodes never appear in sym → stable by definition
    per_cluster = (
        labels.join(stable.select("node", "stable"), "node", "left")
        .groupBy("label")
        .agg(F.avg(F.coalesce("stable", F.lit(1)).cast("double")).alias("value"))
    )
    return per_cluster


def evaluation_summary(values: DataFrame, sizes: DataFrame, n: int) -> dict:
    """Roll a per-cluster ``(label, value)`` frame into the reference's
    ``LocalPartitionEvaluation`` scalars: unweighted/weighted average,
    min, max (``cpp/community/LocalPartitionEvaluation.h``)."""
    row = (
        values.join(sizes, "label")
        .agg(
            F.avg("value").alias("unweighted"),
            (F.sum(F.col("value") * F.col("size")) / F.lit(n)).alias("weighted"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()[0]
    )
    return {
        "unweighted_average": row["unweighted"],
        "weighted_average": row["weighted"],
        "min": row["vmin"],
        "max": row["vmax"],
    }


# ---------------------------------------------------------------------------
# ClusteringGenerator + LocalPartitionCoverage
# ---------------------------------------------------------------------------


def make_singleton_clustering(graph: EdgeGraph) -> DataFrame:
    """``ClusteringGenerator::makeSingletonClustering``
    (``cpp/community/ClusteringGenerator.cpp:14-19``)."""
    return graph.vertices().select(F.col("id").alias("node"), F.col("id").alias("label"))


def make_one_clustering(graph: EdgeGraph) -> DataFrame:
    """``makeOneClustering`` (``ClusteringGenerator.cpp:21-26``)."""
    return graph.vertices().select(F.col("id").alias("node"), F.lit(0).alias("label"))


def make_random_clustering(graph: EdgeGraph, k: int, seed: int = 42) -> DataFrame:
    """``makeRandomClustering`` (``ClusteringGenerator.cpp:28-44``) with
    the engine's deterministic hash-RNG convention instead of a global
    RNG — same label distribution, reproducible across runs."""
    return graph.vertices().select(
        F.col("id").alias("node"),
        (F.abs(F.xxhash64(F.lit(seed), "id")) % k).alias("label"),
    )


def make_continuous_balanced_clustering(graph: EdgeGraph, k: int) -> DataFrame:
    """``makeContinuousBalancedClustering`` (``ClusteringGenerator.cpp:
    46-71``): k blocks of size ⌈n/k⌉/⌊n/k⌋ over the id order.  Node ids
    need not be dense here: block = ⌊rank·k/n⌋ over the id-ascending
    rank reproduces the reference's prefix-sum block boundaries."""
    from networkit_spark.graph import assign_dense_ids

    ranked = assign_dense_ids(
        graph.vertices().select(F.col("id").alias("key")), "key"
    ).select(F.col("key").alias("node"), F.col("id").alias("rank"))
    n = graph.num_nodes()
    return ranked.select(
        "node", ((F.col("rank") * k) / F.lit(n)).cast("long").alias("label")
    )


def make_noncontinuous_balanced_clustering(graph: EdgeGraph, k: int) -> DataFrame:
    """``makeNoncontinuousBalancedClustering`` (``ClusteringGenerator.cpp:
    73-84``): round-robin over the node iteration order (= id order)."""
    from networkit_spark.graph import assign_dense_ids

    ranked = assign_dense_ids(
        graph.vertices().select(F.col("id").alias("key")), "key"
    ).select(F.col("key").alias("node"), F.col("id").alias("rank"))
    return ranked.select("node", (F.col("rank") % k).alias("label"))


def local_partition_coverage(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """``LocalPartitionCoverage`` (``cpp/centrality/LocalPartitionCoverage
    .cpp:10-27``): per node, the weight fraction of incident edges that
    stay inside the node's own cluster, score = Σ_{v∈N(u), P(u)=P(v)}
    w(u,v) / weightedDegree(u); isolated nodes score 0.  A self-loop
    contributes 2w to both numerator and denominator (``Graph::
    weightedDegree`` counts loops twice, and the reference's neighbor
    iteration visits a loop's endpoint with the doubled weight)."""
    lu = labels.select(F.col("node").alias("src"), F.col("label").alias("lu"))
    lv = labels.select(F.col("node").alias("dst"), F.col("label").alias("lv"))
    sym = graph.sym().withColumn(
        "w2", F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(F.col("weight"))
    )
    per = (
        sym.join(lu, "src")
        .join(lv, "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.sum(F.when(F.col("lu") == F.col("lv"), F.col("w2")).otherwise(0.0)).alias("inside"),
            F.sum("w2").alias("wdeg"),
        )
        .select(
            "node",
            F.when(F.col("wdeg") > 0, F.col("inside") / F.col("wdeg"))
            .otherwise(0.0)
            .alias("score"),
        )
    )
    return (
        graph.vertices()
        .join(per, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def permanence_centrality(graph: EdgeGraph, labels: DataFrame) -> DataFrame:
    """``PermanenceCentrality`` (``cpp/centrality/PermanenceCentrality
    .cpp:110-175``): per node u with community C,
    perm(u) = I(u) / E_max(u) / deg(u) − (1 − c_in(u)) where I = number
    of same-community neighbors, E_max = the largest neighbor count in
    any single OTHER community (1 when there are no external neighbors,
    per the paper), and c_in = clustering coefficient among the
    internal neighbors (0 when I < 2).

    Spark shape: one labeled gather for the strengths, one
    internal-restricted wedge join + edge semi-join for the internal
    triangles — the LCC shape confined to intra-community adjacency."""
    ssym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst")
    lu = labels.select(F.col("node").alias("src"), F.col("label").alias("cu"))
    lv = labels.select(F.col("node").alias("dst"), F.col("label").alias("cv"))
    ann = ssym.join(lu, "src").join(lv, "dst")
    strength = ann.groupBy("src", "cu", "cv").agg(F.count(F.lit(1)).alias("s"))
    per = strength.groupBy(F.col("src").alias("node")).agg(
        F.sum(F.when(F.col("cu") == F.col("cv"), F.col("s")).otherwise(0)).alias("i_cnt"),
        F.max(F.when(F.col("cu") != F.col("cv"), F.col("s")).otherwise(0)).alias("emax"),
        F.sum("s").alias("deg"),
    )
    # internal triangles: pairs of internal neighbors that are adjacent
    internal = ann.where(F.col("cu") == F.col("cv")).select("src", F.col("dst").alias("y"))
    pairs = (
        internal.join(internal.withColumnRenamed("y", "z"), "src")
        .where(F.col("y") < F.col("z"))
        .join(
            ssym.select(F.col("src").alias("y"), F.col("dst").alias("z")),
            ["y", "z"],
            "left_semi",
        )
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    out = (
        per.join(pairs, "node", "left")
        .select(
            "node",
            (
                F.col("i_cnt")
                / F.greatest(F.col("emax"), F.lit(1))
                / F.col("deg")
                - (
                    1.0
                    - F.when(
                        F.col("i_cnt") >= 2,
                        F.coalesce("tri", F.lit(0))
                        / (0.5 * F.col("i_cnt") * (F.col("i_cnt") - 1)),
                    ).otherwise(0.0)
                )
            ).alias("score"),
        )
    )
    return (
        graph.vertices()
        .join(out, F.col("id") == F.col("node"), "left")
        .select(F.col("id").alias("node"), F.coalesce("score", F.lit(0.0)).alias("score"))
    )
