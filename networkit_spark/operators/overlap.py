"""Clustering overlap — the ``Overlapper`` surface
(``cpp/overlap/HashingOverlapper.{h,cpp}``).

``HashingOverlapper::run`` combines several partitions of the same
node set into their *common refinement*: two nodes share a block in
the result iff they share a block in EVERY input clustering.  The
reference realizes this by hashing the per-clustering label tuple
(djb2 over ``(first ^ 0xffff) << 16 | (second ^ 0xffff)`` for two
inputs, summed 16-bit hashes beyond) and compacting — hash collisions
can spuriously merge blocks.  The Spark form groups on the label
tuple EXACTLY (a groupBy on the struct of labels) and assigns dense
block ids with the same per-partition-offset scheme the id
densifier uses — the same semantics, collision-free (documented
deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hashing_overlapper(partitions: list[DataFrame]) -> DataFrame:
    """(node, label) — common refinement of the input partitions.

    Each input is a (node, label) DataFrame.  Nodes missing from any
    input are dropped (the reference maps them to ``none``).  Label
    ids are dense ranks of the distinct label tuples (smallest
    member-node order), computed without a global sort: one distinct +
    one window over a hash-bucketed partitioning.
    """
    if not partitions:
        raise ValueError("at least one partition required")
    if len(partitions) == 1:
        return partitions[0].select("node", "label")
    joined = partitions[0].select("node", F.col("label").alias("l0"))
    for i, p in enumerate(partitions[1:], start=1):
        joined = joined.join(
            p.select("node", F.col("label").alias(f"l{i}")), "node"
        )
    cols = [f"l{i}" for i in range(len(partitions))]
    tup = F.struct(*[F.col(c) for c in cols])
    keyed = joined.select("node", tup.alias("key"))
    # dense ids: per-bucket local rank + exclusive bucket offset (the
    # densification trick from graph.py — no single-partition window)
    distinct = keyed.select("key").distinct().withColumn(
        "bucket", F.pmod(F.hash("key"), F.lit(64))
    )
    w = Window.partitionBy("bucket").orderBy("key")
    local = distinct.withColumn("local", F.row_number().over(w) - 1)
    sizes = (
        local.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    ids = local.join(sizes, "bucket").select(
        "key", (F.col("local") + F.col("offset")).alias("label")
    )
    return keyed.join(ids, "key").select("node", "label")
