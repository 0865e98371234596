"""Superstep execution core: stable hub-salted partitioning, per-partition
CSR gather inside Arrow/pandas UDFs, and checkpointed lineage + metrics.

This is the piece with no Catalyst equivalent (SURVEY.md §4): Catalyst
optimizes one DAG, but iterative kernels need (1) a driver loop, (2) a
STABLE partitioning reused across supersteps so the edge table is
shuffled ONCE at prepare time and never again, (3) lineage truncation per
iteration (else analysis time grows per superstep), and (4) resumability.

Distributed analogs of the reference's hand-coded physical techniques:

- CSR neighbor slices (``cpp/structures/LowToHighDirectedGraph.h:38-42``,
  ``cpp/edgescores/TriangleEdgeScore.cpp:31-47``): each edge partition is
  sorted by ``src`` and sliced via ``np.searchsorted`` offsets — an
  ``indptr``/``indices``/``weights`` CSR block over the Arrow batch.
- ``schedule(guided)`` hub load-balancing (``cpp/graph/Graph.h:1317``):
  hub vertices (out-degree > ``hub_cap``) get their edges SALTED across
  ``ceil(deg/hub_cap)`` partitions; the message router replicates a hub's
  state row to every partition holding a slice of its adjacency, and the
  final reduce merges partial aggregates.  AQE alone cannot fix gather
  skew on power-law graphs (north rule requires explicit salting).
- Active-set iteration (``cpp/components/ParallelConnectedComponents.cpp:38-77``,
  ``cpp/community/PLP.cpp:66-105``): kernels pass only changed-node
  messages; gather returns partial aggregates for touched receivers only.

Per-superstep exchange cost: O(n) state rows (+ hub replicas) shuffled to
partitions, O(distinct receivers per partition) partial rows reduced —
the O(m) edge table never moves after ``prepare``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# The CSR gather closure crosses the driver→executor boundary; pickling this
# module by value makes it self-contained, so executors don't need the
# package on PYTHONPATH (robust under spark-submit --py-files and notebooks).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

# Gather ops: how per-partition CSR partials combine across partitions.
OP_WSUM = "wsum"  # receiver ← Σ weight * value(sender)      (PageRank)
OP_MIN = "min"  # receiver ← min value(sender)               (connected components)
OP_LABEL_WSUM = "label_wsum"  # (receiver, label) ← Σ weight  (PLP heaviest-label)


def _csr_block(pdf: pd.DataFrame):
    """Build a CSR view (row_nodes, indptr, indices=dst, weights) over a
    partition's edge rows.  Rows arrive sorted by (src, dst) — layout of
    ``LowToHighDirectedGraph.h:38-42``."""
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    w = pdf["weight"].to_numpy(np.float64)
    order = np.argsort(src, kind="stable")
    if not np.all(order == np.arange(len(order))):
        src, dst, w = src[order], dst[order], w[order]
    row_nodes, indptr_counts = np.unique(src, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(indptr_counts)))
    return row_nodes, indptr, dst, w


def _gather_partials(edges_pdf: pd.DataFrame, msgs_pdf: pd.DataFrame, op: str) -> pd.DataFrame:
    """Vectorized per-partition gather over one CSR block (no per-row Python)."""
    if len(edges_pdf) == 0 or len(msgs_pdf) == 0:
        if op == OP_LABEL_WSUM:
            return pd.DataFrame({"node": [], "label": [], "partial": []}).astype(
                {"node": "int64", "label": "int64", "partial": "float64"}
            )
        return pd.DataFrame({"node": [], "partial": []}).astype(
            {"node": "int64", "partial": "float64"}
        )
    row_nodes, indptr, dst, w = _csr_block(edges_pdf)
    m_node = msgs_pdf["node"].to_numpy(np.int64)
    m_val = msgs_pdf["value"].to_numpy(np.float64)
    # Align messages to CSR rows; senders without a message are inactive.
    pos = np.searchsorted(row_nodes, m_node)
    ok = (pos < len(row_nodes)) & (row_nodes[np.clip(pos, 0, len(row_nodes) - 1)] == m_node)
    pos, vals = pos[ok], m_val[ok]
    if len(pos) == 0:
        return _gather_partials(edges_pdf.iloc[0:0], msgs_pdf.iloc[0:0], op)
    # Expand each active CSR row to its out-edges.
    counts = (indptr[pos + 1] - indptr[pos]).astype(np.int64)
    edge_idx = np.repeat(indptr[pos], counts) + (
        np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
    )
    recv = dst[edge_idx]
    if op == OP_WSUM:
        contrib = np.repeat(vals, counts) * w[edge_idx]
        u, inv = np.unique(recv, return_inverse=True)
        out = np.bincount(inv, weights=contrib)
        return pd.DataFrame({"node": u, "partial": out})
    if op == OP_MIN:
        sv = np.repeat(vals, counts)
        u, inv = np.unique(recv, return_inverse=True)
        out = np.full(len(u), np.inf)
        np.minimum.at(out, inv, sv)
        return pd.DataFrame({"node": u, "partial": out})
    if op == OP_LABEL_WSUM:
        lab = np.repeat(vals, counts).astype(np.int64)
        pair = recv * (2**31) + lab if lab.max(initial=0) < 2**31 else None
        if pair is not None and recv.max(initial=0) < 2**31:
            u, inv = np.unique(pair, return_inverse=True)
            psum = np.bincount(inv, weights=w[edge_idx])
            return pd.DataFrame(
                {"node": u // (2**31), "label": u % (2**31), "partial": psum}
            )
        df = pd.DataFrame({"node": recv, "label": lab, "p": w[edge_idx]})
        g = df.groupby(["node", "label"], sort=False)["p"].sum().reset_index()
        return g.rename(columns={"p": "partial"})
    raise ValueError(op)


@dataclass
class PreparedGraph:
    """An edge set shuffled ONCE into P stable hub-salted partitions.

    ``edges_p``: (part, src, dst, weight) hash-partitioned by ``part`` and
    sorted within partitions — the persistent CSR blocks.
    ``route``: (node, part) — every partition holding out-edges of
    ``node``; non-hubs map to exactly one part, hubs to ``ceil(deg/cap)``.
    """

    spark: SparkSession
    edges_p: DataFrame
    route: DataFrame
    num_parts: int
    num_hubs: int

    def gather(self, messages: DataFrame, op: str) -> DataFrame:
        """One shuffle-exchange superstep.

        ``messages``: (node, value) state rows for ACTIVE senders.  Routed
        to the partitions holding each sender's adjacency slice, gathered
        per-partition over the CSR block (vectorized), then the partial
        aggregates are reduced by receiver.  Returns:
        ``wsum``/``min`` → (node, agg);  ``label_wsum`` → (node, label, wsum).
        """
        msgs = (
            messages.select(F.col("node").cast("long"), F.col("value").cast("double"))
            .join(self.route, "node")
            .select(
                F.col("part").alias("mpart"), F.col("node").alias("node"), "value"
            )
        )
        if op == OP_LABEL_WSUM:
            schema = "node long, label long, partial double"
        else:
            schema = "node long, partial double"
        partials = (
            self.edges_p.groupBy("part")
            .cogroup(msgs.groupBy("mpart"))
            .applyInPandas(lambda l, r: _gather_partials(l, r, op), schema)
        )
        if op == OP_WSUM:
            return partials.groupBy("node").agg(F.sum("partial").alias("agg"))
        if op == OP_MIN:
            return partials.groupBy("node").agg(F.min("partial").alias("agg"))
        return partials.groupBy("node", "label").agg(F.sum("partial").alias("wsum"))

    def unpersist(self) -> None:
        self.edges_p.unpersist()
        self.route.unpersist()


def prepare(
    sym_edges: DataFrame,
    num_parts: int | None = None,
    hub_cap: int = 1 << 20,
) -> PreparedGraph:
    """Shuffle the (symmetrized, gather-direction) edge table once into P
    stable partitions with hub salting, build the message route, persist.

    ``hub_cap`` is the max out-edges of one vertex per partition; size it
    so a partition's CSR block fits executor memory (default 1M rows ≈
    24 MB).  At 100 TB you raise P, not hub_cap.
    """
    spark = sym_edges.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    P = num_parts

    deg = sym_edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("outdeg"))
    hubs = deg.where(F.col("outdeg") > hub_cap).select(
        "node", F.ceil(F.col("outdeg") / hub_cap).cast("int").alias("nsalts")
    )
    num_hubs = hubs.count()
    e = sym_edges.join(F.broadcast(hubs), sym_edges["src"] == hubs["node"], "left").select(
        sym_edges["src"],
        sym_edges["dst"],
        sym_edges["weight"],
        F.coalesce("nsalts", F.lit(1)).alias("nsalts"),
    )
    # Non-hub: part = h(src); hub: spread over nsalts consecutive parts keyed by dst.
    part = F.pmod(
        F.pmod(F.xxhash64("src"), F.lit(P)) + F.pmod(F.xxhash64("dst"), F.col("nsalts")),
        F.lit(P),
    ).cast("int")
    edges_p = (
        e.select(part.alias("part"), "src", "dst", "weight")
        .repartition(P, "part")
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    route = edges_p.select(F.col("src").alias("node"), "part").distinct().persist()
    edges_p.count()  # materialize the one-time edge shuffle
    route.count()
    return PreparedGraph(spark, edges_p, route, P, num_hubs)


class Checkpointer:
    """Per-superstep lineage truncation + metrics log + resumable state.

    Every iteration: ``localCheckpoint`` (truncates the logical plan so
    analysis cost stays O(1) per superstep).  Every ``interval``
    iterations (and on finish): write state parquet to
    ``dir/iter=K/`` and append a JSON metrics row (iteration, rows,
    delta, wall_ms, partition lineage) to ``dir/metrics.jsonl`` —
    any iteration can resume from the last durable checkpoint.
    """

    def __init__(self, directory: str | None = None, interval: int = 5):
        self.dir = directory
        self.interval = interval
        self.history: list[dict] = []
        if directory:
            os.makedirs(directory, exist_ok=True)

    def resume(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        """Return (iteration, state) of the newest durable checkpoint."""
        if not self.dir or not os.path.exists(self._metrics_path()):
            return None
        rows = [json.loads(line) for line in open(self._metrics_path())]
        durable = [r for r in rows if r.get("durable")]
        if not durable:
            return None
        last = durable[-1]
        it = last["iteration"]
        df = SparkSession.getActiveSession().read.parquet(self._state_path(it)) if spark is None else spark.read.parquet(self._state_path(it))
        self.history = rows
        return it, df

    def _metrics_path(self) -> str:
        return os.path.join(self.dir, "metrics.jsonl")

    def _state_path(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter={iteration}")

    def step(
        self,
        state: DataFrame,
        iteration: int,
        *,
        delta: float | None = None,
        rows: int | None = None,
        wall_ms: float | None = None,
        force_durable: bool = False,
        extra: dict | None = None,
    ) -> DataFrame:
        """Truncate lineage; durably checkpoint on the interval."""
        durable = self.dir is not None and (
            force_durable or (self.interval > 0 and iteration % self.interval == 0)
        )
        already = any(
            r["iteration"] == iteration and r.get("durable") for r in self.history
        )
        if durable and already:
            # This iteration is already durably on disk — re-writing would
            # overwrite the very files the state plan reads from.
            out = state
        elif durable:
            state.write.mode("overwrite").parquet(self._state_path(iteration))
            out = state.sparkSession.read.parquet(self._state_path(iteration))
        else:
            out = state.localCheckpoint(eager=True)
        rec = {
            "iteration": iteration,
            "ts": time.time(),
            "rows": rows,
            "delta": delta,
            "wall_ms": wall_ms,
            "durable": durable,
            "partitions": out.rdd.getNumPartitions(),
            **(extra or {}),
        }
        self.history.append(rec)
        if self.dir:
            with open(self._metrics_path(), "a") as f:
                f.write(json.dumps(rec) + "\n")
        return out
