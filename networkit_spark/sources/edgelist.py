"""Edge-list readers/writers.

``EdgeListReader`` semantics (``cpp/io/EdgeListReader.h:27-74``, .cpp 244
LoC): parse ``u<sep>v[<sep>w]`` lines with a configurable separator,
``firstNode`` id offset, comment-line prefix, ``continuous`` flag — when
ids are not continuous (or not numeric) a string→node map densifies them
(``EdgeListReader.h:69-72``).  ``SNAPGraphReader``
(``cpp/io/SNAPGraphReader.cpp``) = tab/space-separated with ``#``
comments; ``KONECTGraphReader`` (``cpp/io/KONECTGraphReader.cpp``)
handles ``%`` comments and multi-edge aggregation policies.

Spark: ``spark.read.text`` → filter comments → split → cast; the
non-continuous path joins against a dense-rank id map
(``graph.densify_ids``).  Filters and projections push into the text
scan; the id-map join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import EdgeGraph, densify_ids


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = r"\s+",
    first_node: int = 0,
    comment_prefix: str = "#",
    continuous: bool = True,
    directed: bool = False,
    weighted_dedup: str = "sum",
) -> EdgeGraph:
    """Read ``u<sep>v[<sep>w]`` lines into an EdgeGraph.

    ``first_node`` is subtracted from ids (the reference's offset for
    1-based lists); ``continuous=False`` densifies arbitrary ids via the
    id-map join and attaches the map as ``graph.id_map``.
    """
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"))
        .where(
            (F.col("line") != "") & (~F.col("line").startswith(comment_prefix))
        )
    )
    parts = lines.select(F.split("line", separator).alias("p"))
    e = parts.select(
        F.try_element_at("p", F.lit(1)).alias("su"),
        F.try_element_at("p", F.lit(2)).alias("sv"),
        F.coalesce(F.try_element_at("p", F.lit(3)).cast("double"), F.lit(1.0)).alias("weight"),
    )
    if continuous:
        edges = e.select(
            (F.col("su").cast("long") - first_node).alias("src"),
            (F.col("sv").cast("long") - first_node).alias("dst"),
            "weight",
        )
        # from_edges canonicalizes undirected edges (multi-edge policy =
        # weighted_dedup via canonicalize)
        if directed:
            return EdgeGraph.from_edges(edges, directed=True, weighted=True)
        from networkit_spark.graph import canonicalize

        return EdgeGraph(canonicalize(edges, weighted_dedup), False, True)
    dense, id_map = densify_ids(
        e.select(F.col("su").alias("src"), F.col("sv").alias("dst"), "weight")
    )
    g = EdgeGraph.from_edges(dense, directed=directed, weighted=True)
    g.id_map = id_map  # type: ignore[attr-defined]
    return g


def read_snap(spark: SparkSession, path: str, directed: bool = True) -> EdgeGraph:
    """SNAP edge lists (e.g. wiki-Vote.txt): tab/space separated, ``#``
    comments, directed by default (``cpp/io/SNAPGraphReader.cpp``)."""
    return read_edge_list(spark, path, separator=r"\s+", comment_prefix="#", directed=directed)


def read_konect(
    spark: SparkSession, path: str, multi_edge: str = "sum", directed: bool = False
) -> EdgeGraph:
    """KONECT format: ``%`` comments, optional weight column, multi-edge
    policy sum/min/max/first (``cpp/io/KONECTGraphReader.cpp``)."""
    g = read_edge_list(
        spark, path, separator=r"\s+", comment_prefix="%", directed=directed
    )
    from networkit_spark.graph import canonicalize

    if not directed:
        return EdgeGraph(canonicalize(g.edges, weighted_dedup=multi_edge), directed, True)
    return g


def write_edge_list(graph: EdgeGraph, path: str, separator: str = "\t") -> None:
    """``EdgeListWriter`` (pyx:3304) — one ``u<sep>v<sep>w`` line per
    canonical edge."""
    graph.edges.select(
        F.concat_ws(
            separator,
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.col("weight").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(path)


def write_partition(labels: DataFrame, path: str) -> None:
    """``PartitionWriter`` (pyx:3381) — parquet (node, label)."""
    labels.write.mode("overwrite").parquet(path)


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
