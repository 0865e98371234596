"""Cover (overlapping community) text IO.

Reference formats:

* ``cpp/io/CoverReader.cpp`` — line *i* lists the members of community
  *i* (``#`` comments skipped without consuming an index).
* ``cpp/io/CoverWriter.cpp`` — one line per community, members
  space-separated in ascending id order, trailing space (faithful).
* ``cpp/io/EdgeListCoverReader.cpp`` — each line is ``node c1 c2 ...``
  (1-based node ids by default, ``firstNode`` subtracted).
* ``cpp/io/SNAPEdgeListPartitionReader.cpp`` — SNAP community files:
  one community per line, tab/space separated members (same line-index
  convention as CoverReader).

Spark shape: reads parse DISTRIBUTED via ``spark.read.text`` +
``split``/``posexplode``; the CoverReader line-index comes from
``zipWithIndex`` (stable for file sources) and is densified over
non-comment lines with a window — cover files are community-count
sized, orders smaller than the graph, so the single-task window is
bounded by design.  The writer assembles each community's member list
distributed (one groupBy) and streams lines from the driver, like the
reference's single-stream writer and our METIS/GML writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _indexed_lines(spark: SparkSession, path: str) -> DataFrame:
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(rdd, "line string, idx long")


def read_cover(spark: SparkSession, path: str, separator: str = r"\s+") -> DataFrame:
    """(node, subset) — ``CoverReader``: community id = rank of the
    (non-comment, non-empty) line."""
    lines = (
        _indexed_lines(spark, path)
        .where((F.trim("line") != "") & (~F.col("line").startswith("#")))
        .withColumn("subset", F.row_number().over(Window.orderBy("idx")) - 1)
    )
    return lines.select(
        F.posexplode(F.split(F.trim("line"), separator)).alias("_p", "tok"),
        F.col("subset").cast("long").alias("subset"),
    ).select(F.col("tok").cast("long").alias("node"), "subset")


def read_snap_cover(spark: SparkSession, path: str) -> DataFrame:
    """(node, subset) — ``SNAPEdgeListPartitionReader``: SNAP community
    files (tab-separated members, one community per line)."""
    return read_cover(spark, path, separator=r"\s+")


def read_edgelist_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """(node, subset) — ``EdgeListCoverReader``: each line is
    ``node c1 c2 ...``; node ids are shifted by ``first_node``
    (community ids are used as written, like the reference)."""
    toks = (
        spark.read.text(path)
        .where((F.trim("value") != "") & (~F.col("value").startswith("#")))
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
    )
    return toks.select(
        (F.element_at("p", 1).cast("long") - first_node).alias("node"),
        F.explode(F.slice("p", 2, F.greatest(F.size("p") - 1, F.lit(0)))).alias("c"),
    ).select("node", F.col("c").cast("long").alias("subset"))


def write_cover(cover: DataFrame, path: str) -> None:
    """``CoverWriter``: line per community (ascending community id),
    members ascending, space-separated with a trailing space."""
    rows = (
        cover.groupBy("subset")
        .agg(F.sort_array(F.collect_list("node")).alias("members"))
        .orderBy("subset")
        .collect()
    )
    with open(path, "w") as fh:
        for r in rows:
            fh.write(" ".join(str(int(v)) for v in r["members"]) + " \n")
