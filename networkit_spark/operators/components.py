"""Connected components — iterative min-label propagation with an active
frontier.

Reference semantics (``cpp/components/ParallelConnectedComponents.cpp:20-95``):
init ``component[u] = u`` (allToSingletons, ``:29-30``); every active node
takes ``min(component[u], min over neighbors)`` (``:55-77``); a change
re-activates the neighbors whose label differs (``:67-74``); stop when no
change.  Final labels are the MINIMUM NODE ID of each component — the
canonical form we emit (the sequential BFS variant's discovery-order ids,
``ConnectedComponents.cpp:30-52``, are equal up to relabeling, which is
how the reference's own tests compare partitions,
``ConnectedComponentsGTest.cpp:134-146``).

Undirected only, like the reference (``ConnectedComponents.cpp:17-19``);
a directed graph's weakly-connected components = CC of the undirected
view (``WeaklyConnectedComponents``, asserted equivalent in
``ConnectedComponentsGTest.cpp:367-379``).

Spark shape: the frontier is the set of nodes whose label changed last
superstep; only frontier nodes send messages (the active-set / delta
iteration of the reference, SURVEY.md §4).  Each superstep shuffles
O(|frontier| + touched receivers), never the edge table.

Scale note: propagation needs O(diameter) supersteps.  Web/link graphs
have small effective diameter (<~25); for pathological long-diameter
graphs the reference's escape hatch is contraction after 8 iterations
(``:49, :81-94``) — available here by composing
``operators.coarsening.coarsen_by_partition`` in the driver loop.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.linkgraph.superstep import (
    OP_MIN,
    Checkpointer,
    PreparedGraph,
    prepare,
)


def connected_components(
    graph: EdgeGraph,
    impl: str = "csr",
    checkpointer: Checkpointer | None = None,
    prepared: PreparedGraph | None = None,
    num_parts: int | None = None,
    hub_cap: int = 1 << 20,
    max_iter: int | None = None,
) -> DataFrame:
    """Return ``(node: long, label: long)`` — label = min node id of the
    component.  Isolated vertices (absent from edges) are their own
    singleton components only if present as self-loop rows; vertex set is
    derived from edges (ids are densified at ingest)."""
    spark = graph.spark
    ckpt = checkpointer or Checkpointer()
    if impl == "blob":
        from networkit_spark.linkgraph.blobstep import PageRankBlobEngine

        base = graph if not graph.directed else graph.to_undirected()
        eng = PageRankBlobEngine(base, num_parts=num_parts)
        out = eng.run_components(max_iter=max_iter, checkpointer=checkpointer)
        out = out.persist()
        out.count()
        eng.close()
        return out
    sym = graph.sym() if not graph.directed else graph.to_undirected().sym()

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
        frontier = labels  # conservative: re-send everything once
    else:
        it = 0
        labels = graph.vertices().select(
            F.col("id").alias("node"), F.col("id").alias("label")
        )
        labels = ckpt.step(labels, 0)
        frontier = labels

    while True:
        t0 = time.time()
        it += 1
        msgs = frontier.select("node", F.col("label").cast("double").alias("value"))
        if impl == "csr":
            agg = prepared.gather(msgs, OP_MIN)
        else:
            agg = (
                sym.join(msgs.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("value").alias("agg"))
            )
        joined = labels.join(agg, "node", "left").select(
            "node",
            "label",
            F.least(
                "label", F.coalesce(F.col("agg").cast("long"), F.col("label"))
            ).alias("label_new"),
        )
        joined = ckpt.step(joined, it, wall_ms=(time.time() - t0) * 1e3)
        frontier = joined.where(F.col("label_new") < F.col("label")).select(
            "node", F.col("label_new").alias("label")
        )
        changed = frontier.count()
        ckpt.history[-1]["delta"] = changed
        labels = joined.select("node", F.col("label_new").alias("label"))
        if changed == 0 or (max_iter is not None and it >= max_iter):
            labels = ckpt.step(labels, it, delta=changed, force_durable=True)
            break

    if own_prepared:
        prepared.unpersist()
    if impl == "sql":
        sym.unpersist()
    return labels


def component_sizes(labels: DataFrame) -> DataFrame:
    """``getComponentSizes()`` (``ConnectedComponents.cpp:58-82``) —
    (label, size) per component."""
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def num_components(labels: DataFrame) -> int:
    """``numberOfComponents()``."""
    return labels.select("label").distinct().count()
