"""Graph generators — deterministic, SQL-only (no RNG state).

Reference inventory (§2.13, ``cpp/generators/``): ErdosRenyi,
BarabasiAlbert, WattsStrogatz, ChungLu, RMAT, Hyperbolic, LFR …  The
reference seeds thread-local RNGs (``setSeed(seed, useThreadId)``,
pyx:239-252); this engine derives every random choice from
``xxhash64(seed, index)`` — identical output at any parallelism, any
scale factor, resumable for free.

- ``erdos_renyi(n, p)``: enumerate candidate pairs when n is small;
  G(n, m)-style hash-sampling for large n (constant memory per task).
- ``chung_lu(weights)``: expected-degree model — edge (u,v) kept iff
  ``hash_uniform(u,v) < w_u·w_v/Σw`` (pair enumeration; the at-scale
  variant buckets by weight and samples per bucket pair).
- ``watts_strogatz(n, k, beta)``: ring lattice + hash-decided rewiring.
- ``rmat(scale, edge_factor, a, b, c, d)``: recursive quadrant descent,
  one hash bit-pair per level — the standard Graph500 skew generator,
  fully vectorized in SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from networkit_spark.graph import EdgeGraph, canonicalize


def _uniform(seed: int, *cols) -> "F.Column":
    """Deterministic U[0,1) from xxhash64."""
    h = F.abs(F.xxhash64(F.lit(seed), *cols))
    return (h % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def erdos_renyi(spark: SparkSession, n: int, p: float, seed: int = 42) -> EdgeGraph:
    """G(n, p) — undirected, no self-loops; candidate-pair enumeration
    (suitable for n up to ~1e4; hash-sample G(n, m) beyond)."""
    pairs = (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(n).select(F.col("id").alias("dst")))
        .where(F.col("src") < F.col("dst"))
    )
    e = pairs.where(_uniform(seed, "src", "dst") < p).withColumn("weight", F.lit(1.0))
    return EdgeGraph(e, directed=False, weighted=False)


def chung_lu(spark: SparkSession, weights: list[float], seed: int = 42) -> EdgeGraph:
    """Expected-degree (Chung-Lu) model from a weight sequence."""
    s = float(sum(weights))
    wdf = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "id long, w double"
    )
    a = wdf.select(F.col("id").alias("src"), F.col("w").alias("ws"))
    b = wdf.select(F.col("id").alias("dst"), F.col("w").alias("wd"))
    pairs = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    e = pairs.where(
        _uniform(seed, "src", "dst") < F.least(F.col("ws") * F.col("wd") / s, F.lit(1.0))
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    return EdgeGraph(e, directed=False, weighted=False)


def watts_strogatz(
    spark: SparkSession, n: int, k: int, beta: float, seed: int = 42
) -> EdgeGraph:
    """Ring lattice (each node to k nearest on each side) with
    hash-decided rewiring of the far endpoint."""
    ring = (
        spark.range(n)
        .select(F.col("id").alias("src"), F.explode(F.sequence(F.lit(1), F.lit(k))).alias("off"))
        .select("src", F.pmod(F.col("src") + F.col("off"), F.lit(n)).alias("dst"), "off")
    )
    rewired = ring.select(
        "src",
        F.when(
            _uniform(seed, "src", "off") < beta,
            F.abs(F.xxhash64(F.lit(seed + 1), "src", "off")) % n,
        )
        .otherwise(F.col("dst"))
        .alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return EdgeGraph(
        canonicalize(rewired.withColumn("weight", F.lit(1.0)), weighted_dedup="first"),
        directed=False,
        weighted=False,
    )


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
) -> EdgeGraph:
    """RMAT (``cpp/generators/RmatGenerator.h:24``): 2^scale nodes,
    edge_factor·2^scale edges; at each of `scale` levels one hash-driven
    quadrant choice sets one bit of src and dst.  Skewed like real web
    graphs — the generator used for the engine's hub-skew benchmarks."""
    n = 1 << scale
    m = edge_factor * n
    edges = spark.range(m).select(F.col("id").alias("eid"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = _uniform(seed + lvl, "eid")
        src_bit = F.when(u < a + b, F.lit(0)).otherwise(F.lit(1))
        dst_bit = F.when(
            u < a, F.lit(0)
        ).when(u < a + b, F.lit(1)).when(u < a + b + c, F.lit(0)).otherwise(F.lit(1))
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    e = edges.select(src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("weight"))
    e = e.where(F.col("src") != F.col("dst"))
    return EdgeGraph(canonicalize(e, weighted_dedup="first"), directed=False, weighted=False)
