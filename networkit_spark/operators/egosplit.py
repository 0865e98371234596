"""Ego-splitting overlapping community detection — the fork's flagship.

Reference (``cpp/community/egosplitting/EgoSplitting.h:31-60``, .cpp 842
LoC; Epasto-Lattanzi-Leme):

1. For every node u, partition its EGO-NET (the subgraph induced on
   N(u)) with a local clustering algorithm.
2. Create one PERSONA of u per ego-net cluster; nodes with no
   neighbors-of-neighbors structure still get singleton personas.
3. Map every edge (u,v) to EXACTLY ONE persona edge: the persona of u
   whose ego-cluster contains v ↔ the persona of v whose ego-cluster
   contains u.
4. Cluster the persona graph with a global algorithm.
5. A node's communities = the set of its personas' labels → an
   overlapping Cover (multiple rows per node).

Spark shape: ego-net edges come from the same two-join wedge+closing
pattern as triangle counting (each ego edge (v,w) of ego u IS the
triangle u-v-w); per-ego connected components run in a vectorized
union-find inside ``applyInPandas`` (ego-nets are tiny — bounded by
deg(u) — so a per-group numpy union-find is the right granularity);
persona ids densify via a deterministic rank; the global step reuses
``plp``.  Local/global algorithms are pluggable like the reference's
constructor functions.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ``_ego_components`` crosses the driver→executor boundary via
# applyInPandas; ship the module by value so executors don't need the
# package on PYTHONPATH (same idiom as ``linkgraph/superstep.py``).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from networkit_spark.graph import EdgeGraph, assign_dense_ids
from networkit_spark.operators.plp import plp


def _ego_components(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one ego-net's edges → (ego, member, rep)."""
    ego = int(pdf["ego"].iloc[0])
    v = pdf["v"].to_numpy(np.int64)
    w = pdf["w"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([v, w]))
    idx = {int(x): i for i, x in enumerate(nodes)}
    parent = np.arange(len(nodes))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(v, w):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    reps = np.array([nodes[find(idx[int(x)])] for x in nodes])
    return pd.DataFrame({"ego": ego, "member": nodes, "rep": reps})


def _ego_local_distributed(e: DataFrame, max_ego_degree: int | None) -> DataFrame:
    """The at-scale LOCAL phase: ego-net wedge join (hub egos capped via
    a deterministic neighbor sample) + per-ego union-find, returning the
    persona membership (ego, member, rep)."""
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    # the ego-net view: full adjacency for normal egos; a deterministic
    # neighbor sample for over-cap hubs (window only over hub rows, so
    # the sort cost is proportional to hub adjacency, not the graph)
    ego_view = sym
    if max_ego_degree is not None:
        from pyspark.sql import Window

        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        hubs = deg.where(F.col("_d") > max_ego_degree).select("src")
        hub_rows = sym.join(hubs, "src", "leftsemi")
        rest = sym.join(hubs, "src", "left_anti")
        w = Window.partitionBy("src").orderBy(F.xxhash64("src", "dst"), "dst")
        hub_sample = (
            hub_rows.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_ego_degree)
            .drop("_rn")
        )
        ego_view = rest.unionByName(hub_sample)

    # ego-net edges: (ego; v, w) with v,w ∈ N(ego) and (v,w) ∈ E —
    # exactly the triangles at each corner (TriangleEdgeScore shape)
    nbr1 = ego_view.select(F.col("src").alias("ego"), F.col("dst").alias("v"))
    nbr2 = ego_view.select(F.col("src").alias("ego"), F.col("dst").alias("w"))
    wedges = nbr1.join(nbr2, "ego").where(F.col("v") < F.col("w"))
    ego_edges = wedges.join(
        e.withColumnRenamed("src", "v").withColumnRenamed("dst", "w"), ["v", "w"]
    )

    comps = ego_edges.groupBy("ego").applyInPandas(
        _ego_components, "ego long, member long, rep long"
    )
    # neighbors absent from any ego edge → singleton personas (rep = self)
    all_nbrs = sym.select(F.col("src").alias("ego"), F.col("dst").alias("member"))
    singletons = all_nbrs.join(comps.select("ego", "member"), ["ego", "member"], "left_anti").select(
        "ego", "member", F.col("member").alias("rep")
    )
    # localCheckpoint: `membership` (and below, `pid` / the persona edges)
    # each appear 2-3× in downstream joins — without plan truncation the
    # logical tree grows multiplicatively and Catalyst spends minutes just
    # stringifying it per job (observed 500 s CPU in generateTreeString)
    return comps.unionByName(singletons).localCheckpoint(eager=True)


def _ego_local_fused(e: DataFrame, e_pdf) -> DataFrame:
    """Small-graph escape hatch for the LOCAL phase (same family as the
    linkpred/prefix-Jaccard block kernels): the distributed form
    materializes the Σ deg² ego-net wedge join and routes ~3·#triangles
    rows through a per-ego ``applyInPandas`` — tens of millions of
    shuffled rows at bench scale.  Here the sorted adjacency is
    broadcast, the EGOS fan out in index blocks, and each task builds
    its egos' ego-net edges by a vectorized membership probe
    (searchsorted on the (node, nbr) composite key), then runs min-label
    propagation with pointer jumping to the per-ego-net components —
    converged labels ARE the union-find reps (min member id).  Members
    on no ego-net edge keep their own id: the singleton personas, same
    as the distributed anti-join.  Engages only when every ego is under
    ``max_ego_degree`` (so semantics are EXACTLY the distributed
    path's — no hub sampling divergence) and the wedge volume fits;
    pytest asserts membership equality with the distributed phase."""
    spark = e.sparkSession
    src = e_pdf["src"].to_numpy(np.int64)
    dst = e_pdf["dst"].to_numpy(np.int64)
    s_all = np.concatenate([src, dst])
    d_all = np.concatenate([dst, src])
    nodes = np.unique(s_all)
    n = len(nodes)
    si = np.searchsorted(nodes, s_all)
    di = np.searchsorted(nodes, d_all)
    order = np.lexsort((di, si))
    s_o, d_o = si[order], di[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s_o + 1, 1)
    indptr = np.cumsum(indptr)
    adj_key = s_o * np.int64(n) + d_o  # sorted ascending by construction
    bc = spark.sparkContext.broadcast((indptr, d_o, adj_key, nodes))
    nb = max(1, min(spark.sparkContext.defaultParallelism * 2, n))
    cuts = np.linspace(0, n, nb + 1).astype(np.int64)
    bounds = [(int(lo), int(hi)) for lo, hi in zip(cuts[:-1], cuts[1:]) if hi > lo]

    def kernel(batches):
        indptr_, nbr_, akey_, nds = bc.value
        nn = np.int64(len(nds))
        for b in batches:
            for lo, hi in zip(b["lo"].to_numpy(), b["hi"].to_numpy()):
                egos = np.arange(lo, hi, dtype=np.int64)
                cnt = indptr_[egos + 1] - indptr_[egos]
                # (ego, member) rows = the block's adjacency slice —
                # contiguous in the CSR, members sorted within each ego
                mflat = np.arange(indptr_[lo], indptr_[hi], dtype=np.int64)
                m_ego = np.repeat(egos, cnt)
                m_mem = nbr_[mflat]
                mem_key = m_ego * nn + m_mem  # ascending
                # second-level gather: for each (ego, v) row, v's own
                # neighbors w; keep w ∈ N(ego) (triangle corner) and v < w
                vcnt = indptr_[m_mem + 1] - indptr_[m_mem]
                total = int(vcnt.sum())
                row2 = np.repeat(np.arange(len(m_mem), dtype=np.int64), vcnt)
                offs = np.cumsum(vcnt) - vcnt
                flat2 = np.repeat(indptr_[m_mem], vcnt) + (
                    np.arange(total, dtype=np.int64) - np.repeat(offs, vcnt)
                )
                w2 = nbr_[flat2]
                v2 = m_mem[row2]
                ego2 = m_ego[row2]
                keep = v2 < w2
                ego2, v2, w2 = ego2[keep], v2[keep], w2[keep]
                probe = ego2 * nn + w2
                pos = np.searchsorted(akey_, probe)
                hit = (pos < len(akey_)) & (akey_[np.minimum(pos, len(akey_) - 1)] == probe)
                ego2, v2, w2 = ego2[hit], v2[hit], w2[hit]
                # indices of (ego, v) / (ego, w) in the block's member table
                iv = np.searchsorted(mem_key, ego2 * nn + v2)
                iw = np.searchsorted(mem_key, ego2 * nn + w2)
                # min-label propagation + pointer jumping to components
                lab = m_mem.copy()
                for _ in range(64):
                    old = lab
                    lab = lab.copy()
                    if len(iv):
                        np.minimum.at(lab, iv, old[iw])
                        np.minimum.at(lab, iw, old[iv])
                    # pointer jump: label value -> its own (ego, label) row
                    jpos = np.searchsorted(mem_key, m_ego * nn + lab)
                    valid = (jpos < len(mem_key)) & (
                        mem_key[np.minimum(jpos, len(mem_key) - 1)] == m_ego * nn + lab
                    )
                    lab = np.where(valid, np.minimum(lab, lab[np.minimum(jpos, len(mem_key) - 1)]), lab)
                    if np.array_equal(lab, old):
                        break
                yield pd.DataFrame(
                    {"ego": nds[m_ego], "member": nds[m_mem], "rep": nds[lab]}
                )

    blocks = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))
    return blocks.mapInPandas(kernel, "ego long, member long, rep long")


def ego_splitting(
    graph: EdgeGraph,
    global_algo=None,
    max_iter: int = 16,
    min_community_size: int = 5,
    cleanup: bool = False,
    max_ego_degree: int | None = 2000,
    fused_local: bool | None = None,
) -> DataFrame:
    """Returns the Cover: (node, label), possibly multiple rows per node.

    Communities smaller than ``min_community_size`` are discarded, matching
    the reference's post-pass (``EgoSplitting.cpp:804-812``, min_size=5) —
    singleton personas otherwise dominate the cover on sparse graphs.

    ``max_ego_degree`` bounds the per-ego work: the ego-net wedge join is
    O(deg²) and each ego's union-find is ONE ``applyInPandas`` task, so a
    degree-10⁵ hub would put ~10¹⁰ candidate wedges in a single task.
    Egos above the cap have their ego-net built on a DETERMINISTIC sample
    of ``max_ego_degree`` neighbors (xxhash64(ego, nbr) rank — stable at
    any parallelism); sampled-out neighbors still receive singleton
    personas, so the persona-edge mapping stays total and the cover still
    covers every node.  Recall bound: within a hub's ego-net, a cluster
    keeps ≥ cap/deg of its members in expectation — hub ego-nets degrade
    gracefully to coarser splits instead of blowing up one task.  The
    reference has the same O(deg²) asymptotics but on shared memory
    (``EgoSplitting.cpp`` runs ego-nets serially per thread).

    ``cleanup=True`` pipes the cover through the OSLOM-style significance
    post-pass — the fork's flagship ``EgoSplitting +
    SignificanceCommunityCleanUp`` combination (``egosplit/benchmarks``
    configs pair them; ``cleanup/SignificanceCommunityCleanUp.h``)."""
    import os

    spark = graph.spark
    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    membership = None
    if fused_local is not False and e.count() <= int(
        os.environ.get("SPARK_GRAFT_FUSED_EDGES", str(1 << 23))
    ) // 4:
        e_pdf = e.toPandas()
        if len(e_pdf):
            _ids = np.concatenate(
                [e_pdf["src"].to_numpy(np.int64), e_pdf["dst"].to_numpy(np.int64)]
            )
            _deg = np.bincount(np.unique(_ids, return_inverse=True)[1]).astype(np.float64)
            # only when no ego exceeds the cap (fused ≡ distributed
            # exactly — no hub-sampling divergence) and the wedge
            # volume fits a task comfortably
            if (
                fused_local
                or (max_ego_degree is None or _deg.max() <= max_ego_degree)
                and float((_deg * _deg).sum()) <= float(1 << 28)
            ):
                membership = _ego_local_fused(e, e_pdf).localCheckpoint(eager=True)
    if membership is None:
        membership = _ego_local_distributed(e, max_ego_degree)

    # persona ids: global ascending rank of (ego, rep) — assigned with
    # per-partition offsets (assign_dense_ids), no single-partition sort
    personas = membership.select(F.struct("ego", "rep").alias("_k")).distinct()
    pid = assign_dense_ids(personas, "_k").select(
        F.col("_k.ego").alias("ego"),
        F.col("_k.rep").alias("rep"),
        F.col("id").alias("pid"),
    ).localCheckpoint(eager=True)
    memb_pid = membership.join(pid, ["ego", "rep"]).select("ego", "member", "pid")

    # each edge (u,v) → one persona edge: (persona of u containing v,
    #                                      persona of v containing u)
    pe = (
        e.join(
            memb_pid.withColumnRenamed("ego", "src").withColumnRenamed("member", "dst").withColumnRenamed("pid", "pid_u"),
            ["src", "dst"],
        )
        .join(
            memb_pid.withColumnRenamed("ego", "dst").withColumnRenamed("member", "src").withColumnRenamed("pid", "pid_v"),
            ["src", "dst"],
        )
        .select(
            F.least("pid_u", "pid_v").alias("src"),
            F.greatest("pid_u", "pid_v").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .localCheckpoint(eager=True)
    )
    persona_graph = EdgeGraph(pe, directed=False, weighted=True)

    # csr: the flagship PLP path — auto-fuses all sweeps into one numpy
    # stage for small persona graphs, frontier semi-joins at scale
    algo = global_algo or (lambda g: plp(g, max_iter=max_iter, impl="csr"))
    plabels = algo(persona_graph)

    cover = (
        pid.join(plabels.withColumnRenamed("node", "pid"), "pid")
        .select(F.col("ego").alias("node"), "label")
        .distinct()
    )
    if min_community_size > 1:
        big = (
            cover.groupBy("label")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") >= min_community_size)
            .select("label")
        )
        cover = cover.join(big, "label").select("node", "label")
    if cleanup:
        from networkit_spark.operators.cleanup import significance_cleanup

        cleaned = significance_cleanup(
            graph, cover.withColumnRenamed("label", "community")
        )
        cover = cleaned.select("node", F.col("community").alias("label"))
    return cover


def cover_f1(cover: DataFrame, truth: DataFrame) -> float:
    """CoverF1Similarity (``cpp/community/CoverF1Similarity``-style):
    average best-match F1 of detected communities against ground truth.
    Both inputs: (node, label).

    Fully distributed: with p = i/|c| and r = i/|o|, the harmonic mean
    2pr/(p+r) simplifies to 2i/(|c|+|o|), so every pairwise F1 is a
    node-join + per-label counts — no community is ever collected to
    the driver (communities can be graph-sized at 100 TB)."""
    det = cover.select("node", "label").distinct()
    tru = truth.select("node", "label").distinct()
    det_sz = det.groupBy(F.col("label").alias("ld")).agg(F.count("*").alias("dsz"))
    tru_sz = tru.groupBy(F.col("label").alias("lt")).agg(F.count("*").alias("tsz"))
    inter = (
        det.select(F.col("label").alias("ld"), "node")
        .join(tru.select(F.col("label").alias("lt"), "node"), "node")
        .groupBy("ld", "lt")
        .agg(F.count("*").alias("i"))
    )
    best = (
        inter.join(det_sz, "ld")
        .join(tru_sz, "lt")
        .withColumn("f1", 2.0 * F.col("i") / (F.col("dsz") + F.col("tsz")))
        .groupBy("ld")
        .agg(F.max("f1").alias("best"))
    )
    row = (
        det_sz.join(best, "ld", "left")
        .agg(F.avg(F.coalesce(F.col("best"), F.lit(0.0))))
        .collect()[0][0]
    )
    return float(row) if row is not None else 0.0
