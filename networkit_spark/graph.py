"""Core graph data model: an edge DataFrame plus derived views.

Reference data model (NetworKit): mutable adjacency-list ``Graph``
(``cpp/graph/Graph.h:82``), ``node = uint64`` dense ids
(``cpp/Globals.h:20-33``), ``edgeweight = double`` default 1.0
(``cpp/Globals.h:29,34``), undirected edges stored in both endpoint
lists, each visited once under the ``u >= v`` convention
(``cpp/graph/Graph.h:217-227``).

Spark model: an ``edges`` DataFrame ``(src: long, dst: long,
weight: double)``.  Undirected graphs store each edge ONCE, canonicalized
``src <= dst`` (self-loops allowed, stored once); a symmetrized view (both
directions, self-loops still once — matching NetworKit adjacency where a
self-loop appears once in ``outEdges[v]``) is derived for gather
operations.  Vertices are the distinct endpoint set; removed-node id
holes of the reference (``exists`` tombstones, ``cpp/graph/Graph.h:109``)
are not reproduced — ids are densified at ingest and an id-map table
preserves original keys (``GraphTools::getContinuousNodeIds``,
``cpp/graph/GraphTools.h:18-49``).

Weighted-degree semantics copied exactly from
``cpp/graph/Graph.cpp:497-524``: the undirected weighted degree counts a
self-loop's weight TWICE (the neighbor-sum sees it once, then
``sum += weight(v, v)`` adds it again).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)


def canonicalize(edges: DataFrame, weighted_dedup: str = "sum") -> DataFrame:
    """Canonicalize an undirected edge list: ``src <= dst``, one row per edge.

    Multi-edges collapse per ``weighted_dedup`` policy (``sum`` | ``min`` |
    ``max`` | ``first`` — the KONECT reader's multi-edge policies,
    ``cpp/io/KONECTGraphReader.cpp``).
    """
    e = edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    agg = {
        "sum": F.sum("weight"),
        "min": F.min("weight"),
        "max": F.max("weight"),
        "first": F.first("weight"),
    }[weighted_dedup]
    return e.groupBy("src", "dst").agg(agg.alias("weight"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions for ``src != dst``; self-loops kept once.

    Mirrors NetworKit undirected adjacency: an edge appears in both
    endpoints' lists, but ``addEdge(v, v)`` appends ``v`` only once to
    ``outEdges[v]`` (``cpp/graph/Graph.cpp`` addEdge).
    """
    rev = edges.where(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return edges.unionByName(rev)


def degrees(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Degree table ``(node, deg, wdeg)``.

    Undirected: ``deg`` counts a self-loop once (``Graph::degree``), while
    ``wdeg`` counts its weight twice (``cpp/graph/Graph.cpp:497-524``).
    Directed: out-degrees (what PageRank divides by,
    ``cpp/centrality/PageRank.cpp:30-33``).
    """
    if directed:
        return edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg"), F.sum("weight").alias("wdeg")
        )
    sym = symmetrize(edges)
    loop_extra = F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
    return sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"),
        (F.sum("weight") + F.sum(loop_extra)).alias("wdeg"),
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct endpoint set ``(id: long)``."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def assign_dense_ids(
    keys: DataFrame, key_col: str = "key", num_parts: int | None = None
) -> DataFrame:
    """``(id, key)`` with ``id`` = 0-based global rank of ``key`` ascending.

    Parallel analog of ``zipWithIndex`` (no single-partition global
    window): range-repartition on the key, per-partition ``row_number``
    (window partitioned by the physical partition id → parallel sort),
    then add broadcast cumulative offsets computed from the P per-
    partition counts (P rows on the driver — O(parallelism), not O(n)).
    Ids are deterministic and independent of ``num_parts`` / boundary
    sampling: they always equal the global ascending-key rank.
    """
    from pyspark.sql.window import Window

    spark = keys.sparkSession
    P = num_parts or spark.sparkContext.defaultParallelism
    parted = (
        keys.repartitionByRange(P, F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.row_number().over(Window.partitionBy("_pid").orderBy(key_col))
            - F.lit(1),
        )
        .persist()
    )
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    acc, rows = 0, []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        rows.append((r["_pid"], acc))
        acc += r["_cnt"]
    off_df = spark.createDataFrame(rows, "_pid int, _off long")
    return parted.join(F.broadcast(off_df), "_pid").select(
        (F.col("_off") + F.col("_local")).cast("long").alias("id"), key_col
    )


def densify_ids(edges: DataFrame, key_cols: tuple[str, str] = ("src", "dst")) -> tuple[DataFrame, DataFrame]:
    """Map arbitrary (sparse / string) node keys to dense 0-based int64 ids.

    The Spark analog of ``GraphTools::getContinuousNodeIds`` +
    ``getCompactedGraph`` (``cpp/graph/GraphTools.h:18-49``) and of
    ``EdgeListReader``'s string→node map path
    (``cpp/io/EdgeListReader.h:69-72``).  Returns ``(edges, id_map)``
    where ``id_map`` is ``(id: long, key)``.  Ids are assigned in
    ascending key order by ``assign_dense_ids`` — per-partition offsets,
    no global single-partition sort.
    """
    s, d = key_cols
    keys = (
        edges.select(F.col(s).alias("key"))
        .unionByName(edges.select(F.col(d).alias("key")))
        .distinct()
    )
    id_map = assign_dense_ids(keys, "key")
    out = (
        edges.join(id_map.withColumnRenamed("key", s), on=s)
        .withColumnRenamed("id", "src_id")
        .join(id_map.withColumnRenamed("key", d), on=d)
        .withColumnRenamed("id", "dst_id")
        .select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
    )
    return out, id_map


def index_edges(edges: DataFrame) -> DataFrame:
    """``Graph::indexEdges`` analog: edges + dense 0-based ``edge_id``
    in ascending ``(src, dst)`` order.

    Same per-partition-offset scheme as ``assign_dense_ids`` — range
    repartition on the composite key, parallel per-partition ranks,
    broadcast cumulative offsets; never a global single-partition
    window.  ``compactEdges`` (close id holes after deletions) is
    re-running this on the surviving edges.
    """
    keyed = edges.withColumn("_ekey", F.struct("src", "dst"))
    ids = assign_dense_ids(keyed.select("_ekey").distinct(), key_col="_ekey")
    return (
        keyed.join(ids.withColumnRenamed("id", "edge_id"), "_ekey")
        .drop("_ekey")
    )


_LINEAGE_ROOT: list[str] = []  # lazily-created session dir, atexit-removed


def truncate_lineage(df: DataFrame, iteration: int, every: int = 8) -> DataFrame:
    """Per-iteration lineage truncation for driver loops.

    ``localCheckpoint(eager=True)`` truncates the LOGICAL plan but chained
    checkpoints accumulate serialized task state (observed: 2 MB+ task
    binaries and per-iteration wall exploding 4-5x past ~10 chained
    checkpoints).  Every ``every`` iterations the state takes a parquet
    round-trip instead, which resets the chain completely; other
    iterations use the cheap local checkpoint.

    All round-trip dirs live under ONE session root removed at process
    exit — earlier dirs may still back live DataFrames (the caller can
    hold any iteration's state), so per-call deletion is unsafe; the
    lifetime bound matches localCheckpoint's block lifetime.

    The root must be executor-visible on a real cluster: it resolves to
    ``$SPARK_GRAFT_BLOB_ROOT``, else the session's checkpoint dir, and
    only falls back to a driver-local tempdir in local mode (where
    driver == executor)."""
    if every > 0 and iteration > 0 and iteration % every == 0:
        import atexit
        import os
        import shutil
        import tempfile
        import uuid

        spark = df.sparkSession
        if not _LINEAGE_ROOT:
            root = os.environ.get("SPARK_GRAFT_BLOB_ROOT")
            if not root:
                ckpt = spark.sparkContext.getCheckpointDir()
                if ckpt:
                    root = f"{ckpt.rstrip('/')}/nk_lineage"
            if root:
                _LINEAGE_ROOT.append(f"{root.rstrip('/')}/nk_lineage_{uuid.uuid4().hex}")
            else:
                master = spark.sparkContext.master or ""
                if not master.startswith("local"):
                    raise RuntimeError(
                        "truncate_lineage needs a shared filesystem root on a "
                        "cluster: set SPARK_GRAFT_BLOB_ROOT or "
                        "spark.sparkContext.setCheckpointDir(...)"
                    )
                local = tempfile.mkdtemp(prefix="nk_lineage_")
                atexit.register(shutil.rmtree, local, ignore_errors=True)
                _LINEAGE_ROOT.append(local)
        tmp = f"{_LINEAGE_ROOT[0]}/it_{iteration}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        return spark.read.parquet(tmp)
    return df.localCheckpoint(eager=True)


def random_nodes(graph: "EdgeGraph", k: int = 1, seed: int = 42) -> list:
    """``GraphTools::randomNode(s)`` — ``k`` distinct uniform nodes at a
    fixed seed.  Ranks nodes by ``xxhash64(seed, id)`` and takes the
    first ``k`` — a distributed TakeOrdered; only the winners reach the
    driver, never the node set."""
    rows = (
        graph.vertices()
        .orderBy(F.xxhash64(F.lit(seed), F.col("id")))
        .limit(k)
        .collect()
    )
    return [r["id"] for r in rows]


def random_edges(graph: "EdgeGraph", k: int = 1, seed: int = 42) -> list:
    """``GraphTools::randomEdge(s)`` (uniform=True flavor) — ``k``
    distinct uniform edges at a fixed seed, as (src, dst) tuples."""
    rows = (
        graph.edges
        .orderBy(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")))
        .limit(k)
        .collect()
    )
    return [(r["src"], r["dst"]) for r in rows]


@dataclass
class EdgeGraph:
    """A graph as an edge DataFrame (+ lazily derived views).

    ``edges``: ``(src, dst, weight)``; undirected ⇒ canonical ``src<=dst``
    one row per edge.  This is the engine's single source of truth — the
    analog of NetworKit's ``Graph`` object minus mutability (mutations are
    DataFrame combinators, §2.3 of SURVEY.md).
    """

    edges: DataFrame
    directed: bool = False
    weighted: bool = True
    _cache: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = True,
        canonical: bool = False,
    ) -> "EdgeGraph":
        e = edges
        if "weight" not in e.columns:
            e = e.withColumn("weight", F.lit(1.0))
        e = e.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), F.col("weight").cast("double")
        )
        if not directed and not canonical:
            e = canonicalize(e)
        return cls(edges=e, directed=directed, weighted=weighted)

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    def sym(self) -> DataFrame:
        """Gather view: all (sender → receiver) rows."""
        return self.edges if self.directed else symmetrize(self.edges)

    def vertices(self) -> DataFrame:
        if "vertices" not in self._cache:
            self._cache["vertices"] = vertices_of(self.edges)
        return self._cache["vertices"]

    def degrees(self) -> DataFrame:
        if "degrees" not in self._cache:
            self._cache["degrees"] = degrees(self.edges, self.directed)
        return self._cache["degrees"]

    def num_nodes(self) -> int:
        if "n" not in self._cache:
            self._cache["n"] = self.vertices().count()
        return self._cache["n"]

    def num_edges(self) -> int:
        if "m" not in self._cache:
            self._cache["m"] = self.edges.count()
        return self._cache["m"]

    # ---- structural combinators (SURVEY.md §2.3) ----
    def remove_self_loops(self) -> "EdgeGraph":
        return EdgeGraph(self.edges.where(F.col("src") != F.col("dst")), self.directed, self.weighted)

    def to_unweighted(self) -> "EdgeGraph":
        return EdgeGraph(self.edges.withColumn("weight", F.lit(1.0)), self.directed, False)

    def to_undirected(self) -> "EdgeGraph":
        """``Graph::toUndirected`` (pyx:1003) — collapse direction."""
        return EdgeGraph(canonicalize(self.edges), False, self.weighted)

    def transpose(self) -> "EdgeGraph":
        """``Graph::transpose`` (pyx:1023) — swap(src, dst); directed only."""
        e = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return EdgeGraph(e, self.directed, self.weighted)

    def subgraph_from_nodes(self, nodes: DataFrame) -> "EdgeGraph":
        """``subgraphFromNodes`` (pyx:1276-1288) — induced subgraph via semi-joins."""
        n = nodes.select(F.col(nodes.columns[0]).alias("id"))
        e = (
            self.edges.join(F.broadcast(n).withColumnRenamed("id", "src"), "src", "leftsemi")
            .join(F.broadcast(n).withColumnRenamed("id", "dst"), "dst", "leftsemi")
        )
        return EdgeGraph(e, self.directed, self.weighted)

    def density(self) -> float:
        """``Graph::density`` — m / (n*(n-1)) directed, 2m/(n*(n-1)) undirected."""
        n, m = self.num_nodes(), self.num_edges()
        if n <= 1:
            return 0.0
        return (m if self.directed else 2 * m) / (n * (n - 1))

    def total_edge_weight(self) -> float:
        return self.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
