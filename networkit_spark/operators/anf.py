"""Approximate Neighborhood Function / effective diameter — HyperANF.

Reference surface (``cpp/distance/EffectiveDiameterApproximation.h:19``,
``NeighborhoodFunctionApproximation``, ``HopPlotApproximation``): the
ANF/HyperANF family — per-vertex cardinality sketches of the h-hop
neighborhood, unioned along edges each superstep.

Spark shape: each vertex carries a FM/HLL-style register array (here:
Flajolet-Martin bitmasks, ``registers`` int64 columns — exactly the ANF
of Palmer et al.); a superstep ORs each vertex's sketch with its
neighbors' (``groupBy(dst).agg(bit_or)``) — the same gather pattern as
the kernels, with OR as the combine.  N(h) estimates follow from the
mean least-zero-bit; effective diameter = smallest h with
N(h) ≥ q·N(∞).

Deterministic: sketch bits seeded by ``xxhash64(node, trial)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _init_sketches(graph: EdgeGraph, num_trials: int, seed: int) -> DataFrame:
    """Each node: num_trials FM bitmasks with one bit set at a
    geometrically-distributed position (= trailing-zero count of a
    hash, the classic Flajolet-Martin draw)."""
    cols = [F.col("id").alias("node")]
    for t in range(num_trials):
        # h & -h isolates the lowest set bit; log2 of it = trailing-zero
        # count, which is geometric(1/2) for a uniform hash
        hx = f"(cast(abs(xxhash64({seed + t}, id)) + 1 as bigint))"
        cols.append(
            F.expr(
                f"shiftleft(cast(1 as bigint), least(cast(log2({hx} & -{hx}) as int), 30))"
            ).alias(f"r{t}")
        )
    return graph.vertices().select(*cols)


def neighborhood_function_approx(
    graph: EdgeGraph, max_h: int = 16, num_trials: int = 16, seed: int = 11
) -> list[tuple[int, float]]:
    """[(h, N(h) estimate)] — ANF supersteps with bit_or combine."""
    sym = graph.sym().select("src", "dst").persist()
    sk = _init_sketches(graph, num_trials, seed).localCheckpoint(eager=True)
    rcols = [f"r{t}" for t in range(num_trials)]

    def estimate(df: DataFrame) -> float:
        # ANF estimator (Palmer et al.): per node v, R̄_v = mean over
        # trials of the least-zero-bit position of v's unioned bitmap
        # (= trailing-ones run length); IN(v,h) ≈ 2^R̄_v / 0.77351;
        # N(h) = Σ_v IN(v,h).  Sum of per-node estimates — NOT
        # 2^mean-over-all(R) (a geometric-mean scalar, off by ~n).
        r_exprs = [
            F.coalesce(
                F.length(F.regexp_extract(F.bin(F.col(c)), "(1+)$", 1)), F.lit(0)
            ).cast("double")
            for c in rcols
        ]
        mean_r = sum(r_exprs[1:], r_exprs[0]) / float(num_trials)
        per_node = F.pow(F.lit(2.0), mean_r) / 0.77351
        return df.agg(F.sum(per_node)).collect()[0][0]

    # h=0 uses the sketch estimate too (consistent FM bias across h, so
    # the effective-diameter ratio compares like with like)
    out = [(0, estimate(sk))]
    prev_est = None
    for h in range(1, max_h + 1):
        nbr = (
            sym.join(sk.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(*[F.expr(f"bit_or({c})").alias(c) for c in rcols])
        )
        merged = (
            sk.alias("a")
            .join(nbr.alias("b"), "node", "left")
            .select(
                "node",
                *[
                    (
                        F.col(f"a.{c}").bitwiseOR(F.coalesce(F.col(f"b.{c}"), F.lit(0)))
                    ).alias(c)
                    for c in rcols
                ],
            )
            .localCheckpoint(eager=True)
        )
        sk = merged
        est = estimate(sk)
        out.append((h, est))
        if prev_est is not None and abs(est - prev_est) < 1e-9:
            break
        prev_est = est
    sym.unpersist()
    return out


def effective_diameter_approx(
    graph: EdgeGraph, ratio: float = 0.9, max_h: int = 16, num_trials: int = 16
) -> int:
    """Smallest h with N(h) ≥ ratio · N(max) — EffectiveDiameter surface."""
    nf = neighborhood_function_approx(graph, max_h=max_h, num_trials=num_trials)
    target = ratio * nf[-1][1]
    for h, est in nf:
        if est >= target:
            return h
    return nf[-1][0]


def effective_diameter(graph: EdgeGraph, ratio: float = 0.9) -> float:
    """EXACT effective diameter (``cpp/distance/EffectiveDiameter
    .cpp:22-65``): mean over nodes v of the smallest h ≥ 1 with
    |ball(v, h)| ≥ ⌈ratio·n⌉.  Undirected single-component graphs only,
    like the reference (both rejected up front).

    Spark shape: rides the keyed APSP table (all wavefronts in one
    min-plus superstep loop) — O(n²) state like the reference's per-node
    bitmaps; the exact anchor for :func:`effective_diameter_approx`,
    fixture-scale by design (``streaming/dyndist.apsp_state`` documents
    the bound)."""
    import math as _math

    from pyspark.sql.window import Window

    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.dyndist import apsp_state

    if graph.directed:
        raise ValueError("effective_diameter: undirected graphs only")
    ncomp = (
        connected_components(graph, impl="sql").select("label").distinct().count()
    )
    if ncomp > 1:
        raise ValueError("effective_diameter: graph must be connected")
    n = graph.num_nodes()
    threshold = int(_math.ceil(ratio * n) + 0.5)
    dist = apsp_state(graph, hops=True).dist
    w = Window.partitionBy("src").orderBy("dist", "dst")
    eff = (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == threshold)
        .select("src", F.greatest(F.col("dist"), F.lit(1.0)).alias("eff"))
    )
    return eff.agg(F.avg("eff")).collect()[0][0]
