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
    problem_prefix: str | None = None,
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
    if problem_prefix is not None:
        lines = lines.where(~F.col("line").startswith(problem_prefix))
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
    comments, directed by default (``cpp/io/SNAPGraphReader.cpp``).
    Also tolerates the ``p n m ...`` problem line that
    ``SNAPGraphWriter`` emits, so writer output roundtrips."""
    g = read_edge_list(
        spark, path, separator=r"\s+", comment_prefix="#", directed=directed,
        problem_prefix="p ",
    )
    return g


def read_konect(
    spark: SparkSession, path: str, multi_edge: str = "sum", directed: bool = False
) -> EdgeGraph:
    """KONECT format: ``%`` comments, optional weight column, multi-edge
    policy sum/min/max/first (``cpp/io/KONECTGraphReader.cpp``).  KONECT
    node ids are 1-based — the reference maps every id ``in - 1``
    (``KONECTGraphReader.cpp:194``), mirrored here via ``first_node=1``
    (caught by the foodweb-baydry.konect interop fixture)."""
    g = read_edge_list(
        spark, path, separator=r"\s+", comment_prefix="%", directed=directed,
        first_node=1,
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


def write_snap(graph: EdgeGraph, path: str) -> None:
    """``SNAPGraphWriter`` (``cpp/io/SNAPGraphWriter.cpp:13-25``):
    problem line ``p n m u u 0`` then one ``u v`` line per edge —
    driver-side single-stream text, same class as the GML writer."""
    n = graph.num_nodes()
    m = graph.num_edges()
    rows = graph.edges.select("src", "dst").orderBy("src", "dst").collect()
    with open(path, "w") as fh:
        fh.write(f"p {n} {m} u u 0\n")
        for r in rows:
            fh.write(f"{r['src']} {r['dst']}\n")


def write_binary_partition(labels: DataFrame, path: str, width: int = 8) -> None:
    """``BinaryPartitionWriter`` (``cpp/io/BinaryPartitionWriter.cpp``):
    node i's label as a little-endian ``width``-byte integer at offset
    i·width.  Requires the node ids to be exactly 0..n−1 (the
    reference indexes by position).  Single binary file ⇒ driver-side,
    documented like the reference's."""
    import numpy as np

    if width not in (4, 8):
        raise ValueError("Only width 4 and 8 are supported")
    rows = labels.select("node", "label").orderBy("node").collect()
    n = len(rows)
    if n and (rows[0]["node"] != 0 or rows[-1]["node"] != n - 1):
        raise ValueError("binary partition requires dense node ids 0..n-1")
    arr = np.array([r["label"] for r in rows], dtype="<u4" if width == 4 else "<u8")
    if width == 4 and n and int(arr.max(initial=0)) != max(r["label"] for r in rows):
        raise ValueError("labels exceed 32-bit range; use width=8")
    arr.tofile(path)


def read_binary_partition(spark: SparkSession, path: str, width: int = 8) -> DataFrame:
    """``BinaryPartitionReader`` — (node, label) from the fixed-width
    little-endian file; length must be a multiple of the width."""
    import os

    import numpy as np

    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    if os.path.getsize(path) % width != 0:
        raise ValueError("length of partition file must be a multiple of the width")
    arr = np.fromfile(path, dtype="<u4" if width == 4 else "<u8")
    return spark.createDataFrame(
        [(i, int(p)) for i, p in enumerate(arr)], "node long, label long"
    )


def read_binary_edgelist_partition(
    spark: SparkSession, path: str, first_node: int = 0, width: int = 8
) -> DataFrame:
    """(node, label) — ``BinaryEdgeListPartitionReader``
    (``cpp/io/BinaryEdgeListPartitionReader.cpp:8-60``): consecutive
    little-endian (node, partition) PAIRS of ``width`` (4 or 8) bytes;
    node ids below ``first_node`` are rejected, ids are shifted down by
    it.  Sparse/unordered ids are fine (unlike the positional
    ``BinaryPartitionReader``)."""
    import os

    import numpy as np

    if width not in (4, 8):
        raise ValueError("Error: width must be 4 or 8")
    if os.path.getsize(path) % (2 * width) != 0:
        raise ValueError("file must hold a whole number of (node, partition) pairs")
    arr = np.fromfile(path, dtype="<u4" if width == 4 else "<u8").reshape(-1, 2)
    if arr.size and int(arr[:, 0].min()) < first_node:
        raise ValueError("Error: node smaller than the given firstNode found!")
    return spark.createDataFrame(
        [(int(u) - first_node, int(p)) for u, p in arr], "node long, label long"
    )


def write_binary_edgelist_partition(
    labels: DataFrame, path: str, first_node: int = 0, width: int = 8
) -> None:
    """``BinaryEdgeListPartitionWriter`` counterpart: little-endian
    (node + first_node, label) pairs in ascending node order.  Works for
    sparse id spaces; single binary stream ⇒ driver-side, like the
    reference."""
    import numpy as np

    if width not in (4, 8):
        raise ValueError("Error: width must be 4 or 8")
    rows = labels.select("node", "label").orderBy("node").collect()
    dt = "<u4" if width == 4 else "<u8"
    arr = np.empty((len(rows), 2), dtype=dt)
    for i, r in enumerate(rows):
        arr[i, 0] = r["node"] + first_node
        arr[i, 1] = r["label"]
    if width == 4 and len(rows):
        if max(r["node"] + first_node for r in rows) >= (1 << 32) or max(
            r["label"] for r in rows
        ) >= (1 << 32):
            raise ValueError("values exceed 32-bit width")
    arr.tofile(path)
