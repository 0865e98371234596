"""PageRank — power iteration with damping and L2 convergence tolerance.

Reference semantics (``cpp/centrality/PageRank.cpp:20-71``, signature
``PageRank.h:35`` with damp=0.85, tol=1e-8; Cython default tol=1e-9,
pyx:7844), reproduced EXACTLY:

1. Init ``pr[u] = 1/n`` (``PageRank.cpp:24-26``); precompute
   ``deg[u] = weightedDegree(u)`` (``:30-33``) — undirected weighted
   degree double-counts self-loops (``cpp/graph/Graph.cpp:497-524``).
2. Superstep:
   ``pr'[u] = damp * Σ_{(v→u)∈E} pr[v]·w(v,u)/deg[v] + (1-damp)/n``
   summed over IN-edges (``PageRank.cpp:37-46``); undirected in-edges =
   all incident edges.
3. DANGLING nodes (out-degree 0) lose their rank mass each superstep —
   no redistribution; only the final normalization compensates.  This is
   deliberately NOT textbook PageRank; matching scores at 1e-6 requires
   copying it.
4. Convergence: ``sqrt(Σ (pr_old-pr_new)²) ≤ tol`` — L2 norm of the
   delta, every iteration, no max-iteration cap (``PageRank.cpp:48-57``).
5. Post-normalize so ``Σ pr = 1`` (``:61-68``); intermediate iterations
   are NOT normalized.

Two implementations, asserted equivalent in tests:

- ``impl="csr"`` (default): the north-rule path.  Edge table shuffled
  once into stable hub-salted partitions; each superstep routes the
  O(n)-row state to adjacency partitions, gathers over per-partition CSR
  blocks with numpy (map-side combine → partial sums), reduces partials
  by receiver.  Lineage checkpointed per superstep.
- ``impl="sql"``: pure DataFrame join + groupBy — Catalyst/AQE pick the
  physical plan; used as a cross-check and for small graphs.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.linkgraph.superstep import (
    OP_WSUM,
    Checkpointer,
    PreparedGraph,
    prepare,
)


def pagerank(
    graph: EdgeGraph,
    damp: float = 0.85,
    tol: float = 1e-8,
    max_iter: int | None = None,
    impl: str = "csr",
    checkpointer: Checkpointer | None = None,
    prepared: PreparedGraph | None = None,
    num_parts: int | None = None,
    hub_cap: int = 1 << 20,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Return ``(node: long, rank: double)``, Σ rank = 1.

    ``init_ranks`` (node, rank): warm-start for incremental recompute
    (``DynKatzCentrality``-style Dyn* surface) — the power iteration
    converges to the same fixpoint from any positive start, so warm
    starts after a small event batch need few supersteps; new nodes
    default to 1/n."""
    spark = graph.spark
    ckpt = checkpointer or Checkpointer()
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "node long, rank double")
    if impl == "blob":
        from networkit_spark.linkgraph.blobstep import pagerank_blob

        return pagerank_blob(
            graph, damp=damp, tol=tol, max_iter=max_iter,
            num_parts=num_parts, checkpointer=checkpointer, hub_cap=hub_cap,
        )

    sym = graph.sym()
    # invw = 1/weightedDegree; senders with wdeg=0 never occur as edge
    # sources, but keep the guard for isolated-vertex state rows.
    deg = graph.degrees().select(
        "node",
        F.when(F.col("wdeg") > 0, 1.0 / F.col("wdeg")).otherwise(F.lit(0.0)).alias("invw"),
    )
    vbase = (
        graph.vertices()
        .join(deg, F.col("id") == F.col("node"), "left")
        .select(
            F.col("id").alias("node"), F.coalesce("invw", F.lit(0.0)).alias("invw")
        )
        .persist()
    )
    vbase.count()

    own_prepared = False
    if impl == "csr" and prepared is None:
        prepared = prepare(sym, num_parts=num_parts, hub_cap=hub_cap)
        own_prepared = True
    elif impl == "sql":
        sym = sym.persist()

    resumed = ckpt.resume(spark)
    if resumed is not None:
        it, state = resumed
    else:
        it = 0
        if init_ranks is not None:
            state = vbase.join(init_ranks, "node", "left").select(
                "node", F.coalesce("rank", F.lit(1.0 / n)).alias("rank"), "invw"
            )
        else:
            state = vbase.select("node", F.lit(1.0 / n).alias("rank"), "invw")
        state = ckpt.step(state, 0, rows=n, force_durable=False)

    teleport = (1.0 - damp) / n
    while True:
        t0 = time.time()
        it += 1
        msgs = state.select("node", (F.col("rank") * F.col("invw")).alias("value"))
        if impl == "csr":
            agg = prepared.gather(msgs, OP_WSUM)
        else:
            agg = (
                sym.join(msgs.withColumnRenamed("node", "src"), "src")
                .select("dst", (F.col("weight") * F.col("value")).alias("c"))
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("c").alias("agg"))
            )
        new_state = (
            state.join(agg, "node", "left")
            .select(
                "node",
                (damp * F.coalesce("agg", F.lit(0.0)) + teleport).alias("rank"),
                F.col("rank").alias("rank_old"),
                "invw",
            )
        )
        # One lineage truncation per superstep; the delta agg then runs on
        # the truncated plan (cheap second job over cached partitions).
        new_state = ckpt.step(
            new_state, it, rows=n, wall_ms=(time.time() - t0) * 1e3
        )
        delta_sq = new_state.agg(
            F.sum(F.pow(F.col("rank_old") - F.col("rank"), 2))
        ).collect()[0][0]
        delta = math.sqrt(delta_sq or 0.0)
        ckpt.history[-1]["delta"] = delta
        state = new_state.select("node", "rank", "invw")
        if delta <= tol or (max_iter is not None and it >= max_iter):
            state = ckpt.step(state, it, delta=delta, rows=n, force_durable=True)
            break

    total = state.agg(F.sum("rank")).collect()[0][0]
    result = state.select("node", (F.col("rank") / total).alias("rank"))
    vbase.unpersist()
    if own_prepared:
        prepared.unpersist()
    if impl == "sql":
        sym.unpersist()
    return result
