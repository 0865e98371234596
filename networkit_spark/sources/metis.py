"""METIS adjacency-format reader.

Format (``cpp/io/METISGraphReader.cpp``, 115 LoC): header line
``n m [fmt [ncon]]``; line i (1-based, after the header, comments
``%``) lists the neighbors of node i-1... in METIS node ids are
1-based, so a line ``2 5`` for node 0 means edges (0,1) and (0,4).
``fmt`` is an integer flag field (``METISGraphReader.cpp:28-38``):
``fmt % 10 == 1`` ⇒ edge-weighted (lines alternate ``neighbor weight``
pairs; covers "1", "001", "011", "11"); ``fmt // 10 == 1`` ⇒ each line
starts with ``ncon`` vertex-weight values, which are skipped
(``ignoreFirst = ncon``; ncon defaults to 1 when absent).

Spark: ``spark.read.text`` has no line numbers, so we zip them in via a
window over a monotonic id — acceptable for fixture-scale files (METIS
files are test inputs here; parquet is the at-scale format).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from networkit_spark.graph import EdgeGraph, canonicalize


def read_metis(spark: SparkSession, path: str) -> EdgeGraph:
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("mid"), F.trim("value").alias("line")
    )
    lines = lines.where((F.col("line") != "") & (~F.col("line").startswith("%")))
    lines = lines.withColumn("lineno", F.row_number().over(Window.orderBy("mid")) - 1)
    header = lines.where(F.col("lineno") == 0).select(
        F.split("line", r"\s+").alias("h")
    ).collect()[0]["h"]
    fmt = int(header[2]) if len(header) >= 3 else 0
    ncon = int(header[3]) if len(header) >= 4 else 1
    weighted = fmt % 10 == 1
    skip = ncon if fmt // 10 == 1 else 0
    body = lines.where(F.col("lineno") > 0).select(
        (F.col("lineno") - 1).cast("long").alias("src"),
        F.split("line", r"\s+").alias("toks"),
    )
    if skip:
        # drop the ncon leading vertex-weight values of every line
        body = body.select(
            "src", F.slice("toks", skip + 1, F.greatest(F.size("toks") - skip, F.lit(0))).alias("toks")
        )
    if not weighted:
        e = body.select("src", F.explode("toks").alias("tok")).select(
            "src", (F.col("tok").cast("long") - 1).alias("dst"), F.lit(1.0).alias("weight")
        )
    else:
        # pairs (neighbor, weight): posexplode, even positions = neighbor
        ex = body.select("src", F.posexplode("toks").alias("pos", "tok"))
        nb = ex.where(F.col("pos") % 2 == 0).select(
            "src", (F.col("tok").cast("long") - 1).alias("dst"), (F.col("pos") / 2).cast("int").alias("k")
        )
        wt = ex.where(F.col("pos") % 2 == 1).select(
            F.col("src").alias("wsrc"), F.col("tok").cast("double").alias("weight"), ((F.col("pos") - 1) / 2).cast("int").alias("k")
        )
        e = nb.join(wt, (nb["src"] == wt["wsrc"]) & (nb["k"] == wt["k"])).select(
            "src", "dst", "weight"
        )
    # each undirected edge appears in both endpoint lines → canonicalize
    # with 'first' policy (weights are symmetric duplicates, not multi-edges)
    return EdgeGraph(canonicalize(e, weighted_dedup="first"), directed=False, weighted=weighted)


def write_metis(graph: EdgeGraph, path: str, weighted: bool | None = None) -> None:
    """``METISGraphWriter`` (``cpp/io/METISGraphWriter.cpp:15-60``):
    header ``n m weighted``, then line i = the (1-based) neighbors of
    node i−1, with ``v w`` pairs when weighted.  Requires undirected
    input (the reference throws on directed).  Node ids are compacted
    to 0..n−1 in ascending-id order (the reference's
    ``getContinuousNodeIds``).  Single-stream text format ⇒ driver-side
    serialization, like the reference's and like the GML/DGS writers
    here; adjacency is ASSEMBLED distributed (one groupBy) and only the
    per-node lines are collected."""
    if graph.directed:
        raise ValueError("METIS does not support directed graphs")
    if weighted is None:
        weighted = graph.weighted
    ids = [r["id"] for r in graph.vertices().orderBy("id").collect()]
    remap = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    m = graph.edges.where(F.col("src") != F.col("dst")).count()
    rows = (
        graph.sym()
        .where(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("nbrs"))
        .collect()
    )
    adj = {int(r["src"]): r["nbrs"] for r in rows}
    with open(path, "w") as fh:
        fh.write(f"{n} {m} {int(bool(weighted))}\n")
        for v in ids:
            nbrs = adj.get(int(v), [])
            if weighted:
                parts = [
                    f"{remap[int(nb['dst'])] + 1} {nb['weight']:g}" for nb in nbrs
                ]
            else:
                parts = [str(remap[int(nb["dst"])] + 1) for nb in nbrs]
            fh.write(" ".join(parts) + "\n")
