"""Degree-preserving graph randomization — SURVEY §2.12 non-goal rows
promoted: ``cpp/randomization/GlobalCurveball.h:22`` /
``Curveball.h``, and ``EdgeSwitchingMarkovChainGenerator``
(``cpp/generators/EdgeSwitchingMarkovChainGenerator.h``).

Null models need the degree sequence held EXACTLY while the topology
mixes.  Both chains below are synchronous batched variants of the
reference's sequential Markov chains, built so every round is one or
two shuffles and every batch member is provably conflict-free:

* ``global_curveball`` — per round, nodes are hash-paired into trades
  (the reference's global trade sequence).  A trade may only proceed if
  it owns its whole TERRITORY (its two members plus all their
  neighbors); territory is claimed by min-trade-id, so surviving
  trades touch disjoint edge sets and each trade's neighbor-set shuffle
  (the curveball trade) is exact and race-free.  Hub-adjacent trades
  get rejected more often, so mixing per round is slower than the
  sequential chain — more rounds buy the same mixing, each round stays
  O(m) work and O(1) shuffles.  Degrees are invariant by construction.
* ``edge_switching`` — per round, canonical edges are hash-paired; each
  pair proposes the standard double-edge swap (coin-picked orientation),
  rejected when endpoints collide, when a proposed edge already exists
  (anti-join against the full edge set), or when two pairs propose the
  same new edge (min-pair wins).  Rejected pairs keep their original
  edges — exactly the Markov chain's reject-and-stay semantics.

All randomness is ``xxhash64``/md5 over (seed, round, ids): identical
results at any parallelism, no RNG state on executors.
"""

from __future__ import annotations

import hashlib
import sys

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import EdgeGraph, symmetrize, truncate_lineage

# The trade closure crosses the driver→executor boundary; pickle the
# module by value so executors don't need the package on PYTHONPATH
# (see linkgraph/superstep.py:46).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def _trade_pairs(
    vertices: DataFrame, seed: int, rnd: int, buckets: int = 64
) -> DataFrame:
    """Hash-rank nodes WITHIN hash buckets and pair consecutive ranks →
    (trade, u, v).  Bucketing keeps the rank window partitioned (no
    global single-task sort); at most one odd node per bucket sits a
    round out."""
    h = F.xxhash64("id", F.lit(seed), F.lit(rnd))
    ranked = vertices.select(
        F.col("id").alias("node"), F.pmod(h, F.lit(buckets)).alias("bkt"), h.alias("h")
    ).withColumn(
        "rk", F.row_number().over(Window.partitionBy("bkt").orderBy("h", "node"))
    )
    return (
        ranked.groupBy(
            "bkt", ((F.col("rk") - 1) / 2).cast("long").alias("pr")
        )
        .agg(
            F.min(F.when(F.col("rk") % 2 == 1, F.col("node"))).alias("u"),
            F.min(F.when(F.col("rk") % 2 == 0, F.col("node"))).alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .select(
            (F.col("bkt") * F.lit(1 << 40) + F.col("pr")).alias("trade"), "u", "v"
        )
    )


def _trade_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Curveball trade over one surviving trade's incident edges.
    Columns: trade, u, v, src, dst, weight, seed, rnd.  Self-loops and
    the u–v edge are fixed; common neighbors stay; the disjoint
    neighbor sets are re-dealt between u and v by md5 order."""
    if pdf.empty:
        return pdf[["src", "dst", "weight"]]
    u = int(pdf["u"].iloc[0])
    v = int(pdf["v"].iloc[0])
    seed = int(pdf["seed"].iloc[0])
    rnd = int(pdf["rnd"].iloc[0])
    trade = int(pdf["trade"].iloc[0])
    fixed: list[tuple[int, int, float]] = []
    a_u: dict[int, float] = {}
    a_v: dict[int, float] = {}
    for s, d, w in zip(pdf["src"], pdf["dst"], pdf["weight"]):
        s, d, w = int(s), int(d), float(w)
        if s == d or {s, d} == {u, v}:
            fixed.append((s, d, w))
            continue
        x = d if s == u or s == v else s
        end = u if u in (s, d) else v
        (a_u if end == u else a_v)[x] = w
    common = set(a_u) & set(a_v)
    for x in common:
        fixed.append((min(u, x), max(u, x), a_u[x]))
        fixed.append((min(v, x), max(v, x), a_v[x]))
    pool = [(x, a_u[x]) for x in a_u if x not in common] + [
        (x, a_v[x]) for x in a_v if x not in common
    ]
    n_u = sum(1 for x in a_u if x not in common)
    pool.sort(
        key=lambda t: hashlib.md5(
            f"{seed}:{rnd}:{trade}:{t[0]}".encode()
        ).hexdigest()
    )
    out = list(fixed)
    for i, (x, w) in enumerate(pool):
        end = u if i < n_u else v
        out.append((min(end, x), max(end, x), w))
    return pd.DataFrame(out, columns=["src", "dst", "weight"])


def global_curveball(
    graph: EdgeGraph, rounds: int = 8, seed: int = 42
) -> EdgeGraph:
    """GlobalCurveball (``cpp/randomization/GlobalCurveball.h:22``):
    degree-preserving randomization by neighbor-set trades.  Undirected
    simple graphs (self-loops pass through untouched)."""
    if graph.directed:
        raise ValueError("global_curveball: undirected graphs only")
    spark = graph.spark
    edges = graph.edges
    for r in range(rounds):
        trades = _trade_pairs(graph.vertices(), seed, r)
        memb = trades.select("trade", F.col("u").alias("node")).unionByName(
            trades.select("trade", F.col("v").alias("node"))
        )
        # territory: members + all their neighbors IN THE CURRENT edge
        # set (round r-1's rewiring changed adjacency — claiming against
        # the original graph would let two surviving trades share a new
        # edge and re-deal it twice); min trade id wins a node; a trade
        # survives only if it won its entire territory.
        nbr_claims = (
            symmetrize(edges)
            .join(memb.withColumnRenamed("node", "src"), "src")
            .select("trade", F.col("dst").alias("node"))
        )
        claims = memb.unionByName(nbr_claims).distinct()
        winners = claims.groupBy("node").agg(F.min("trade").alias("wtrade"))
        lost = (
            claims.join(winners, "node")
            .where(F.col("trade") != F.col("wtrade"))
            .select("trade")
            .distinct()
        )
        # alive is small (≤ n/2 rows) but sits downstream of two
        # groupBys and feeds THREE consumers (am, the traded join, and
        # through them both union branches) — checkpoint it once so the
        # claims chain doesn't re-execute per consumer.
        alive = trades.join(lost, "trade", "left_anti").localCheckpoint(
            eager=True
        )
        # route each edge: incident to a surviving member → that trade
        am = alive.select("trade", F.col("u").alias("node")).unionByName(
            alive.select("trade", F.col("v").alias("node"))
        )
        routed = (
            edges.join(
                am.select(F.col("node").alias("src"), F.col("trade").alias("ts")),
                "src",
                "left",
            )
            .join(
                am.select(F.col("node").alias("dst"), F.col("trade").alias("td")),
                "dst",
                "left",
            )
            .withColumn("trade", F.coalesce("ts", "td"))
        )
        untouched = routed.where(F.col("trade").isNull()).select(
            "src", "dst", "weight"
        )
        traded = (
            routed.where(F.col("trade").isNotNull())
            .join(alive, "trade")
            .select(
                "trade", "u", "v", "src", "dst", "weight",
                F.lit(seed).alias("seed"), F.lit(r).alias("rnd"),
            )
        )
        new_edges = traded.groupBy("trade").applyInPandas(
            _trade_group, "src long, dst long, weight double"
        )
        edges = truncate_lineage(untouched.unionByName(new_edges), r, every=4)
    return EdgeGraph(edges, directed=False, weighted=graph.weighted)


def curveball(graph: EdgeGraph, trades: int = 64, seed: int = 42) -> EdgeGraph:
    """Curveball (``cpp/randomization/Curveball.h``): the reference runs
    an explicit trade list; the global variant IS a batched trade list,
    so this is a thin wrapper sized to ≈``trades`` total trades."""
    rounds = max(1, (2 * trades) // max(graph.num_nodes(), 2))
    return global_curveball(graph, rounds=rounds, seed=seed)


def edge_switching(
    graph: EdgeGraph, rounds: int = 10, seed: int = 42
) -> EdgeGraph:
    """Degree-preserving double-edge-switch chain
    (``EdgeSwitchingMarkovChainGenerator``, also the `DegreePreservingShuffle`
    building block): per round, hash-pair the canonical edges, propose
    the coin-picked swap, reject on endpoint collision / existing edge /
    duplicate proposal."""
    if graph.directed:
        raise ValueError("edge_switching: undirected graphs only")
    edges = graph.edges
    for r in range(rounds):
        loops = edges.where(F.col("src") == F.col("dst"))
        simple = edges.where(F.col("src") != F.col("dst"))
        h = F.xxhash64("src", "dst", F.lit(seed), F.lit(r))
        ranked = simple.select(
            "src", "dst", "weight",
            F.pmod(h, F.lit(64)).alias("bkt"), h.alias("h"),
        ).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("bkt").orderBy("h", "src", "dst")
            ),
        ).withColumn(
            "pair",
            F.col("bkt") * F.lit(1 << 40) + ((F.col("rk") - 1) / 2).cast("long"),
        )
        pairs = (
            ranked.groupBy("pair")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min(F.when(F.col("rk") % 2 == 1, F.struct("src", "dst", "weight"))).alias("e1"),
                F.min(F.when(F.col("rk") % 2 == 0, F.struct("src", "dst", "weight"))).alias("e2"),
            )
        )
        solo = pairs.where(F.col("cnt") < 2).select(
            F.col("e1.src").alias("src"), F.col("e1.dst").alias("dst"),
            F.col("e1.weight").alias("weight"),
        )
        full = pairs.where(F.col("cnt") == 2).select(
            "pair",
            F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"),
            F.col("e1.weight").alias("w1"),
            F.col("e2.src").alias("c"), F.col("e2.dst").alias("d"),
            F.col("e2.weight").alias("w2"),
        )
        # coin picks {a-d, c-b} vs {a-c, b-d}
        coin = F.pmod(F.xxhash64("a", "b", "c", "d", F.lit(seed), F.lit(r)), F.lit(2))
        prop = full.select(
            "pair", "a", "b", "c", "d", "w1", "w2",
            F.when(coin == 0, F.least("a", "d")).otherwise(F.least("a", "c")).alias("n1s"),
            F.when(coin == 0, F.greatest("a", "d")).otherwise(F.greatest("a", "c")).alias("n1d"),
            F.when(coin == 0, F.least("c", "b")).otherwise(F.least("b", "d")).alias("n2s"),
            F.when(coin == 0, F.greatest("c", "b")).otherwise(F.greatest("b", "d")).alias("n2d"),
        ).withColumn(
            "ok",
            (F.col("a") != F.col("c")) & (F.col("a") != F.col("d"))
            & (F.col("b") != F.col("c")) & (F.col("b") != F.col("d")),
        )
        # reject proposals whose new edge already exists in the graph
        exist = simple.select(
            F.col("src").alias("xs"), F.col("dst").alias("xd"), F.lit(1).alias("hit")
        )
        prop = (
            prop.join(
                exist,
                (F.col("n1s") == F.col("xs")) & (F.col("n1d") == F.col("xd")),
                "left",
            )
            .withColumn("ok", F.col("ok") & F.col("hit").isNull())
            .drop("xs", "xd", "hit")
            .join(
                exist,
                (F.col("n2s") == F.col("xs")) & (F.col("n2d") == F.col("xd")),
                "left",
            )
            .withColumn("ok", F.col("ok") & F.col("hit").isNull())
            .drop("xs", "xd", "hit")
        )
        # reject duplicate proposals across pairs (min pair id wins)
        cand = prop.where("ok")
        newk = cand.select("pair", F.col("n1s").alias("ps"), F.col("n1d").alias("pd")).unionByName(
            cand.select("pair", F.col("n2s").alias("ps"), F.col("n2d").alias("pd"))
        )
        keep_min = newk.groupBy("ps", "pd").agg(F.min("pair").alias("wpair"))
        losers = (
            newk.join(keep_min, ["ps", "pd"])
            .where(F.col("pair") != F.col("wpair"))
            .select("pair")
            .distinct()
        )
        accepted = cand.join(losers, "pair", "left_anti")
        rejected = prop.join(accepted.select("pair"), "pair", "left_anti").select(
            "pair", "a", "b", "c", "d", "w1", "w2"
        )
        out = (
            accepted.select(F.col("n1s").alias("src"), F.col("n1d").alias("dst"), F.col("w1").alias("weight"))
            .unionByName(accepted.select(F.col("n2s").alias("src"), F.col("n2d").alias("dst"), F.col("w2").alias("weight")))
            .unionByName(rejected.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w1").alias("weight")))
            .unionByName(rejected.select(F.col("c").alias("src"), F.col("d").alias("dst"), F.col("w2").alias("weight")))
            .unionByName(solo)
            .unionByName(loops.select("src", "dst", "weight"))
        )
        edges = truncate_lineage(out, r, every=4)
    return EdgeGraph(edges, directed=False, weighted=graph.weighted)


def edge_switching_markov_chain_generator(
    spark, sequence: list[int], rounds: int = 10, seed: int = 42
) -> EdgeGraph:
    """``EdgeSwitchingMarkovChainGenerator``: realize the degree
    sequence with Havel–Hakimi, then mix with edge switches — the
    reference's exact recipe (realizer + chain)."""
    from networkit_spark.operators.generators import havel_hakimi

    g = havel_hakimi(spark, sequence, ignore_if_realizable=True)
    return edge_switching(g, rounds=rounds, seed=seed)
