"""Edge derivation: source table → typed vertices + canonical edge table.

Per FIXTURES.md §1: vertices are the distinct typed entities of the
source table (repo / path / commit) with densified int64 ids; edges come
from the link structure:

- ``repo — path``   (containment; weight = #commits touching the file)
- ``path — commit`` (touched-in; weight = 1)
- ``repo — repo``   (co-naming: shared path basenames; weight = #shared)

The result is the engine's canonical undirected edge table
``(src < dst, weight)`` plus ``vertices(id, kind, key)``.  Id
densification is the ``GraphTools::getContinuousNodeIds`` analog
(``cpp/graph/GraphTools.h:18-49``) — the id-map table preserves the
original string keys.

Skew note (north rule): ubiquitous basenames (the README.md problem)
would create quadratic co-naming blowup at 10^12 files; basenames
occurring in more than ``conaming_cap`` repos are dropped before the
self-join — a frequency cap, the textual analog of stop-word removal.
Hub REPO vertices (power-law repo sizes) are handled downstream by the
superstep partitioner's salting, not here.

``tpch_link_graph`` derives a deterministic tripartite graph from the
driver's TPC-H-ish testdata (customer—part—supplier via orders/lineitem)
— the shared-parquet equivalent used by the DuckDB correctness oracle;
stable id offsets keep it SQL-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import EdgeGraph, assign_dense_ids

PART_OFFSET = 1_000_000
SUPP_OFFSET = 2_000_000


def extract_link_graph(
    source: DataFrame, conaming_cap: int = 50
) -> tuple[EdgeGraph, DataFrame]:
    """source_files → (EdgeGraph, vertices(id, kind, key))."""
    repo_path = source.groupBy("repo", "path").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    path_commit = source.select("path", "commit").distinct().withColumn("w", F.lit(1.0))

    basenames = (
        source.select("repo", F.element_at(F.split("path", "/"), -1).alias("base"))
        .distinct()
    )
    base_freq = basenames.groupBy("base").agg(F.count(F.lit(1)).alias("nrepos"))
    kept = basenames.join(
        F.broadcast(base_freq.where(F.col("nrepos") <= conaming_cap)), "base", "leftsemi"
    )
    a, b = kept.alias("a"), kept.alias("b")
    conaming = (
        a.join(b, (F.col("a.base") == F.col("b.base")) & (F.col("a.repo") < F.col("b.repo")))
        .groupBy(F.col("a.repo").alias("r1"), F.col("b.repo").alias("r2"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )

    typed = (
        repo_path.select(
            F.concat(F.lit("r:"), "repo").alias("ka"),
            F.concat(F.lit("p:"), "path").alias("kb"),
            "w",
        )
        .unionByName(
            path_commit.select(
                F.concat(F.lit("p:"), "path").alias("ka"),
                F.concat(F.lit("c:"), "commit").alias("kb"),
                "w",
            )
        )
        .unionByName(
            conaming.select(
                F.concat(F.lit("r:"), "r1").alias("ka"),
                F.concat(F.lit("r:"), "r2").alias("kb"),
                "w",
            )
        )
    )
    keys = (
        typed.select(F.col("ka").alias("key"))
        .unionByName(typed.select(F.col("kb").alias("key")))
        .distinct()
    )
    id_map = assign_dense_ids(keys, "key").persist()
    edges = (
        typed.join(id_map.withColumnRenamed("key", "ka").withColumnRenamed("id", "src"), "ka")
        .join(id_map.withColumnRenamed("key", "kb").withColumnRenamed("id", "dst"), "kb")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("w").alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    vertices = id_map.select(
        "id",
        F.substring("key", 1, 1).alias("kind"),
        F.expr("substring(key, 3)").alias("key"),
    )
    return EdgeGraph(edges, directed=False, weighted=True), vertices


def tpch_link_graph(spark: SparkSession, sf_dir: str) -> EdgeGraph:
    """customer—part—supplier tripartite graph from the testdata tables.

    Node ids: customer = c_custkey; part = 1e6 + p_partkey; supplier =
    2e6 + s_suppkey (stable offsets ⇒ DuckDB-reproducible; min-id labels
    are meaningful).  Weights = interaction counts (orders ⋈ lineitem).

    Id-space disjointness is ASSERTED (not assumed): beyond sf≈7 the
    custkey range would collide with the part offset and edges would
    silently stop being canonical — fail loudly instead.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mx = lineitem.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    mc = orders.agg(F.max("o_custkey")).collect()[0][0]
    if (mc or 0) >= PART_OFFSET or (mx["mp"] or 0) >= SUPP_OFFSET - PART_OFFSET or (
        mx["ms"] or 0
    ) >= SUPP_OFFSET:
        raise ValueError(
            f"key ranges collide with id offsets (max custkey={mc}, "
            f"partkey={mx['mp']}, suppkey={mx['ms']}); raise PART_OFFSET/SUPP_OFFSET"
        )
    oli = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
    cust_part = oli.groupBy(
        F.col("o_custkey").alias("src"),
        (F.lit(PART_OFFSET) + F.col("l_partkey")).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))
    part_supp = lineitem.groupBy(
        (F.lit(PART_OFFSET) + F.col("l_partkey")).alias("src"),
        (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))
    # customer—supplier closes triangles through shared parts
    cust_supp = oli.groupBy(
        F.col("o_custkey").alias("src"),
        (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))
    edges = cust_part.unionByName(part_supp).unionByName(cust_supp)
    return EdgeGraph(edges, directed=False, weighted=True)


def tpch_link_graph_sql(dialect: str = "duckdb") -> str:
    """The DuckDB-runnable SQL equivalent of ``tpch_link_graph`` — the
    edge CTE every oracle query builds on (tables pre-registered as
    views)."""
    return f"""
    SELECT o_custkey AS src, {PART_OFFSET} + l_partkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    UNION ALL
    SELECT {PART_OFFSET} + l_partkey AS src, {SUPP_OFFSET} + l_suppkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM lineitem
    GROUP BY 1, 2
    UNION ALL
    SELECT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS weight
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """
