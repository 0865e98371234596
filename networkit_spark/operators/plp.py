"""PLP — label propagation community detection (synchronous sweeps).

Reference semantics (``cpp/community/PLP.cpp:28-121``; signature with
``theta = n/1e5`` update threshold ``:44-46``):

- Init: each node its own label (or a supplied base clustering) ``:34-38``.
- Sweep: each non-isolated node adopts the label with the largest
  incident weight sum ``labelWeights[l] = Σ_{w∈N(v), label(w)=l} w(v,w)``
  (``:83-89``); ties resolve to the SMALLEST label id (``std::map``
  iterates ascending and ``max_element`` keeps the first of equals,
  ``:92-95``).  Isolated nodes stay singletons (``:54-58``).
- Stop when ``nUpdated ≤ updateThreshold`` or ``maxIterations`` reached
  (``:72``); per-iteration timing recorded (``:113-115``).

The reference sweeps ASYNCHRONOUSLY across OpenMP threads, so its output
is non-deterministic run-to-run.  This engine defines SYNCHRONOUS sweeps
(all updates read the previous iteration's labels) with the identical
heaviest-label/smallest-id rule — deterministic, testable, and invariant
to the partition count (SURVEY.md §2.5.3).  Tests assert the reference's
invariants (partition exactly covers the node set) plus exact equality
with a NumPy oracle implementing the same synchronous rule.

The reference's active-set bookkeeping (``:97-105``) is mirrored as a
FRONTIER SEMI-JOIN (both impls): after the first sweep, only receivers
adjacent to a node whose label changed ("touched") re-derive their
label, from their FULL neighborhood (exact — not incremental weight
deltas, which would accumulate float residues).  A node none of whose
neighbors changed re-derives the label it already has, so restricting
the recompute preserves synchronous-sweep semantics exactly while the
per-sweep cost collapses to O(Σ deg(touched)) in late sweeps.

On the default ``csr`` path the same restriction runs against the
prepared partitioned edge table directly: ``touched = N(frontier)``
(one semi-join pass), then the sweep's label-weight sums come from a
RESTRICTED EDGE GATHER — ``edges_p`` BROADCAST-semi-joined to touched
receivers, joined to the label table, grouped by (receiver, label) —
whose shuffle volume is Σ deg(touched), not m, and which never
re-shuffles the edge table (a dst-keyed shuffle of edges costs more
than the full blob gather it replaces; measured on RMAT scale 19).
The full CSR/blob gather runs for every sweep whose frontier exceeds
``frontier_frac``·n or ``frontier_max``, or whose touched set exceeds
``touched_max`` (broadcast budget).  Two earlier designs were measured
and rejected in same-window A/Bs: senders = N(N(frontier)) into the
full gather (two extra O(m) distinct passes per sweep), and shuffled
semi-joins (edge-table dst shuffle per sweep).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.linkgraph.superstep import (
    OP_LABEL_WSUM,
    Checkpointer,
    PreparedGraph,
    prepare,
)


def _plp_fused_local(
    edges: DataFrame, vertices: DataFrame, theta: float, max_iter: int | None
) -> DataFrame:
    """Small-store escape hatch (same trick as ``blobstep.run(fused_local)``):
    when the whole symmetrized edge table fits one task, every sweep is a
    numpy lexsort + segmented reduce inside ONE single-task stage, instead
    of one Spark job (gather → heavy → join → delta count) per sweep — at
    bench scale the 0.4–0.5 s/stage floor is ~90 % of a sweep.  Semantics
    are the distributed loop's exactly: synchronous sweeps, label-weight
    sums, heaviest-weight/smallest-label tie-break, stop at
    ``updated ≤ theta`` or ``max_iter``; pytest asserts label equality
    with the distributed paths.  Stores above ``$SPARK_GRAFT_FUSED_EDGES``
    (default 2²³) sym edges keep the distributed sweeps — this path never
    engages at cluster scale."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        src = np.concatenate([b["src"].to_numpy(np.int64) for b in pdfs])
        dst = np.concatenate([b["dst"].to_numpy(np.int64) for b in pdfs])
        w = np.concatenate([b["weight"].to_numpy(np.float64) for b in pdfs])
        m = len(src)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        sidx = np.searchsorted(nodes, src).astype(np.int64)
        didx = np.searchsorted(nodes, dst).astype(np.int64)
        # labels as DENSE indices into `nodes` (nodes is sorted, so dense
        # order == label-value order and the composite key below encodes
        # the (receiver, label) group in ONE int64 — a single unstable
        # argsort per sweep instead of two stable lexsorts; n ≤ 2·m ≤ the
        # fused gate, so didx·n + lab < 2⁴⁸ can't overflow)
        lab = np.arange(n, dtype=np.int64)  # init: own id
        it = 0
        while True:
            it += 1
            key = didx * n + lab[sidx]
            order = np.argsort(key, kind="quicksort")
            k_s, w_s = key[order], w[order]
            new_grp = np.empty(m, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = k_s[1:] != k_s[:-1]
            starts = np.flatnonzero(new_grp)
            g_key = k_s[starts]
            g_w = np.add.reduceat(w_s, starts)
            g_d, g_l = g_key // n, g_key % n
            # per-receiver argmax(wsum), smallest-label tie-break — all
            # linear: per-dst max via reduceat, winner = FIRST group
            # hitting it (groups are label-ascending within dst)
            dnew = np.empty(len(g_d), dtype=bool)
            dnew[0] = True
            dnew[1:] = g_d[1:] != g_d[:-1]
            dstarts = np.flatnonzero(dnew)
            dmax = np.maximum.reduceat(g_w, dstarts)
            counts = np.diff(np.append(dstarts, len(g_d)))
            widx = np.flatnonzero(g_w == np.repeat(dmax, counts))
            wd = g_d[widx]
            fmask = np.empty(len(wd), dtype=bool)
            fmask[0] = True
            fmask[1:] = wd[1:] != wd[:-1]
            winners = widx[fmask]
            new_lab = lab.copy()
            new_lab[g_d[winners]] = g_l[winners]
            updated = int((new_lab != lab).sum())
            lab = new_lab
            if updated <= theta or (max_iter is not None and it >= max_iter):
                break
        yield pd.DataFrame({"node": nodes, "label": nodes[lab]})

    # coalesce, not a groupBy exchange: the one task reads the persisted
    # partitions in place instead of a full shuffle write + fetch
    out = (
        edges.select("src", "dst", "weight")
        .coalesce(1)
        .mapInPandas(kernel, "node long, label long")
    )
    return (
        vertices.select(F.col("id").alias("node"), F.col("id").alias("own"))
        .join(out, "node", "left")
        .select("node", F.coalesce("label", "own").alias("label"))
    )


def _heaviest(label_weights: DataFrame) -> DataFrame:
    """argmax_label Σw with smallest-label tie-break: max_by over the
    struct (wsum, -label) — lexicographic max ⇒ heaviest weight, then
    smallest id."""
    return label_weights.groupBy("node").agg(
        F.expr("max_by(label, struct(wsum, -label))").alias("heavy")
    )


def plp(
    graph: EdgeGraph,
    theta: float | None = None,
    max_iter: int | None = None,
    base_clustering: DataFrame | None = None,
    impl: str = "csr",
    checkpointer: Checkpointer | None = None,
    prepared: PreparedGraph | None = None,
    num_parts: int | None = None,
    hub_cap: int = 1 << 20,
    frontier_frac: float = 0.3,
    frontier_max: int = 1_000_000,
    touched_max: int = 2_000_000,
    fused_local: bool | None = None,
) -> DataFrame:
    """Return ``(node: long, label: long)`` — community assignment.

    ``fused_local`` — small-store escape hatch (``None`` = auto by the
    ``$SPARK_GRAFT_FUSED_EDGES`` threshold, as in ``blobstep``): run all
    sweeps in one single-task numpy stage.  Only taken for the plain
    csr call (no checkpointer, no base clustering) — resume/durability
    and warm starts keep the distributed loop."""
    spark = graph.spark
    ckpt = checkpointer or Checkpointer()
    if impl == "blob":
        # packed-store kernel (blobstep.run_plp) — same synchronous
        # semantics, sharable with PageRank/components via an engine;
        # this convenience path builds + discards its own store
        from networkit_spark.linkgraph.blobstep import PageRankBlobEngine

        if base_clustering is not None:
            raise ValueError("impl='blob' does not take a base clustering")
        base = graph if not graph.directed else graph.to_undirected()
        # engine keeps its load-relative hub policy (plp's hub_cap
        # parameter sizes prepare()'s CSR slices, a different knob);
        # a store that does salt raises toward impl='csr'
        eng = PageRankBlobEngine(base, num_parts=num_parts)
        out = eng.run_plp(theta=theta, max_iter=max_iter, checkpointer=checkpointer)
        out = out.persist()
        out.count()
        eng.close()
        return out
    n = graph.num_nodes()
    if theta is None:
        theta = n / 1e5
    if max_iter is None:
        # SYNCHRONOUS sweeps can 2-cycle (the TPCH link graph itself
        # oscillates — see BENCH.md's PLP frontier note), so an
        # uncapped default must not loop forever; the reference's
        # asynchronous sweeps break such cycles by ordering accident.
        # Mirrors blobstep.run_plp's cap.
        max_iter = 256
    sym = graph.sym() if not graph.directed else graph.to_undirected().sym()

    if impl == "csr" and checkpointer is None and base_clustering is None:
        edges_src = prepared.edges_p if prepared is not None else sym
        if fused_local is None:
            fused_local = edges_src.count() <= int(
                os.environ.get("SPARK_GRAFT_FUSED_EDGES", str(1 << 23))
            )
        if fused_local:
            return _plp_fused_local(edges_src, graph.vertices(), theta, max_iter)

    own_prepared = False
    if impl == "csr" and prepared is None:
        prepared = prepare(sym, num_parts=num_parts, hub_cap=hub_cap)
        own_prepared = True
    elif impl == "sql":
        sym = sym.persist()

    resumed = ckpt.resume(spark)
    if resumed is not None:
        it, labels = resumed
        labels = labels.select("node", "label")
    else:
        it = 0
        if base_clustering is not None:
            labels = base_clustering.select("node", "label")
        else:
            labels = graph.vertices().select(
                F.col("id").alias("node"), F.col("id").alias("label")
            )
        labels = ckpt.step(labels, 0)

    frontier = None  # None ⇒ full sweep (first iteration / after resume)
    updated = n
    while True:
        t0 = time.time()
        it += 1
        if impl == "csr":
            lw = None
            if (
                frontier is not None
                and updated <= frontier_frac * max(n, 1)
                and updated <= frontier_max
            ):
                # receivers adjacent to a changed node re-derive; everyone
                # else provably keeps its label (see module doc).  Both
                # semi-joins BROADCAST the small side — the prepared edge
                # table is scanned in place, never shuffled (a dst-keyed
                # shuffle of the edge table costs more than the full blob
                # gather it replaces; measured on RMAT scale 19).
                ep = prepared.edges_p
                touched = (
                    ep.join(
                        F.broadcast(frontier.withColumnRenamed("node", "src")),
                        "src",
                        "leftsemi",
                    )
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                if touched.count() <= touched_max:
                    lw = (
                        ep.join(
                            F.broadcast(touched.withColumnRenamed("node", "dst")),
                            "dst",
                            "leftsemi",
                        )
                        .join(
                            labels.select(F.col("node").alias("src"), "label"), "src"
                        )
                        .groupBy(F.col("dst").alias("node"), "label")
                        .agg(F.sum("weight").alias("wsum"))
                    )
            if lw is None:
                msgs = labels.select("node", F.col("label").cast("double").alias("value"))
                lw = prepared.gather(msgs, OP_LABEL_WSUM)
        else:
            gather_edges = sym
            if frontier is not None:
                # receivers adjacent to a changed node; everyone else
                # provably re-derives its current label (see module doc)
                touched = (
                    sym.join(frontier.withColumnRenamed("node", "src"), "src", "leftsemi")
                    .select(F.col("dst").alias("node"))
                    .distinct()
                )
                gather_edges = sym.join(
                    touched.withColumnRenamed("node", "dst"), "dst", "leftsemi"
                )
            lw = (
                gather_edges.join(
                    labels.select(
                        F.col("node").alias("src"), F.col("label")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.sum("weight").alias("wsum"))
            )
        heavy = _heaviest(lw)
        new_labels = labels.join(heavy, "node", "left").select(
            "node",
            F.coalesce("heavy", "label").alias("label"),  # isolated keep own
            (F.coalesce("heavy", "label") != F.col("label")).alias("chg"),
        )
        new_labels = ckpt.step(new_labels, it, wall_ms=(time.time() - t0) * 1e3)
        updated = new_labels.where("chg").count()
        ckpt.history[-1]["delta"] = updated
        frontier = new_labels.where("chg").select("node")
        labels = new_labels.select("node", "label")
        if updated <= theta or (max_iter is not None and it >= max_iter):
            labels = ckpt.step(labels, it, delta=updated, force_durable=True)
            break

    if own_prepared:
        prepared.unpersist()
    if impl == "sql":
        sym.unpersist()
    return labels
