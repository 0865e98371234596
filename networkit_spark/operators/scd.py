"""Selective community detection — PageRankNibble seed-set expansion.

Reference: ``cpp/scd/PageRankNibble.{h,cpp}`` + ``cpp/scd/
ApproximatePageRank.cpp`` (Spielman-Teng / Andersen-Chung-Lang): lazy
epsilon-push personalized PageRank from a seed, then the prefix of the
ppr/volume-ordered sweep minimizing conductance.

Spark shape — LOCAL at every stage, per the ACL guarantee:

* :func:`approximate_pagerank` is the synchronous analog of the
  reference's push queue (``ApproximatePageRank.cpp:20-38``): per
  superstep every node with residual r(u)/vol(u) ≥ ε pushes at once —
  p(u) += α·r(u), each neighbor receives (1−α)·r(u)·w/(2·vol(u)), and
  r(u) ← (1−α)·r(u)/2.  The state tables hold ONLY the support, which
  ACL bounds by |supp(p)| ≤ 1/(ε·α) **independent of graph size**; each
  superstep's join touches only edges incident to active nodes.
* The sweep cut applies ``orderBy().limit(k)`` (TakeOrdered — parallel
  partial top-k, no global window over the graph) BEFORE any window
  function; the remaining rank/cumsum windows run over ≤ k =
  min(max_size, ⌈1/(ε·α)⌉) rows — a constant, not O(n).
"""

from __future__ import annotations

import math
import sys

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# ``_gce_expand`` crosses the driver→executor boundary via
# applyInPandas; ship the module by value so executors don't need the
# package on PYTHONPATH (same idiom as ``linkgraph/superstep.py``).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from networkit_spark.graph import EdgeGraph, truncate_lineage


def personalized_pagerank(
    graph: EdgeGraph, seeds: list[int], alpha: float = 0.15, iters: int = 30
) -> DataFrame:
    """(node, ppr) — EXACT power iteration with teleport mass on
    ``seeds`` (drains all residual; mass sums to 1).  Kept as the dense
    oracle twin of :func:`approximate_pagerank`; the nibble path uses
    the push variant."""
    sym = graph.sym().select("src", "dst").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    seed_mass = 1.0 / len(seeds)
    seeds_df = graph.spark.createDataFrame(
        [(int(s), seed_mass) for s in seeds], "node long, s double"
    )
    verts = graph.vertices().select(F.col("id").alias("node"))
    ppr = verts.join(seeds_df, "node", "left").select(
        "node", F.coalesce("s", F.lit(0.0)).alias("ppr")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            ppr.join(deg, "node")
            .select(F.col("node").alias("src"), (F.col("ppr") / F.col("deg")).alias("m"))
            .join(sym, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("m").alias("agg"))
        )
        ppr = (
            verts.join(contrib, "node", "left")
            .join(seeds_df, "node", "left")
            .select(
                "node",
                (
                    (1.0 - alpha) * F.coalesce("agg", F.lit(0.0))
                    + alpha * F.coalesce("s", F.lit(0.0))
                ).alias("ppr"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return ppr


def approximate_pagerank(
    graph: EdgeGraph,
    seeds: list[int],
    alpha: float = 0.15,
    eps: float = 1e-5,
    max_iter: int = 100,
) -> DataFrame:
    """(node, ppr) — lazy epsilon-push PPR (``ApproximatePageRank.cpp``,
    synchronous: all above-threshold nodes push per superstep).  Only
    the support is materialized; |supp| ≤ 1/(ε·α) by ACL Lemma 2, so
    state size and per-superstep cost are independent of n."""
    spark = graph.spark
    sym = (
        graph.sym()
        .select("src", "dst", "weight")
        .persist()
    )
    # volume = weightedDegree with self-loops twice (G.volume)
    vol = (
        graph.sym()
        .groupBy(F.col("src").alias("node"))
        .agg(
            (F.sum("weight")
             + F.sum(F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0))
             ).alias("vol")
        )
    )
    seed_mass = 1.0 / len(seeds)
    r = spark.createDataFrame(
        [(int(s), seed_mass) for s in seeds], "node long, r double"
    )
    p = spark.createDataFrame([], "node long, ppr double")
    for it in range(max_iter):
        rj = r.join(vol, "node").localCheckpoint(eager=True)
        active = rj.where(F.col("r") >= eps * F.col("vol"))
        if active.isEmpty():
            break
        p = truncate_lineage(
            p.unionByName(
                active.select("node", (alpha * F.col("r")).alias("ppr"))
            )
            .groupBy("node")
            .agg(F.sum("ppr").alias("ppr")),
            it,
        )
        msgs = (
            active.select(F.col("node").alias("src"), "r", "vol")
            .join(sym, "src")
            .select(
                F.col("dst").alias("node"),
                ((1.0 - alpha) * F.col("r") * F.col("weight") / (2.0 * F.col("vol"))).alias("r"),
            )
        )
        lazy = active.select("node", ((1.0 - alpha) * F.col("r") / 2.0).alias("r"))
        keep = rj.where(F.col("r") < eps * F.col("vol")).select("node", "r")
        r = truncate_lineage(
            keep.unionByName(lazy).unionByName(msgs)
            .groupBy("node")
            .agg(F.sum("r").alias("r")),
            it,
        )
    sym.unpersist()
    return p


def pagerank_nibble(
    graph: EdgeGraph,
    seed: int,
    alpha: float = 0.15,
    iters: int = 100,
    max_size: int | None = None,
    eps: float = 1e-5,
) -> DataFrame:
    """(node,) — the minimum-conductance sweep prefix around ``seed``
    (``PageRankNibble::bestSweepSet``): rank the PPR support by
    ppr/volume, cut(S_k) = vol(k) − 2·w(edges inside the prefix) via one
    per-edge max-rank histogram + running sums.  The candidate set is
    capped at k = min(max_size, ⌈1/(ε·α)⌉) with a TakeOrdered BEFORE
    the rank window, so no window ever spans more than k rows."""
    ppr = approximate_pagerank(graph, [seed], alpha=alpha, eps=eps, max_iter=iters)
    cap = int(math.ceil(1.0 / (eps * alpha)))
    k = min(max_size, cap) if max_size is not None else cap
    ssym = graph.sym().where(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    vol = ssym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("vol"))
    two_m = ssym.agg(F.sum("weight")).collect()[0][0] or 0.0  # = 2m (weighted)
    top = (
        ppr.join(vol, "node")
        .where(F.col("ppr") > 0)
        .select("node", "vol", (F.col("ppr") / F.col("vol")).alias("key"))
        .orderBy(F.desc("key"), F.asc("node"))
        .limit(k)  # TakeOrderedAndProject — parallel partial top-k
    )
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("key"), F.asc("node")))
    ).localCheckpoint(eager=True)
    # per-edge max rank (edges with BOTH endpoints in the capped prefix)
    ru = ranked.select(F.col("node").alias("src"), F.col("rnk").alias("ru"))
    rv = ranked.select(F.col("node").alias("dst"), F.col("rnk").alias("rv"))
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    internal_hist = (
        e.join(ru, "src")
        .join(rv, "dst")
        .groupBy(F.greatest("ru", "rv").alias("rnk"))
        .agg(F.sum("weight").alias("closed_w"))
    )
    w = Window.orderBy("rnk")  # ≤ k rows by construction
    sweep = (
        ranked.join(internal_hist, "rnk", "left")
        .select(
            "node", "rnk", "vol",
            F.coalesce("closed_w", F.lit(0.0)).alias("closed_w"),
        )
        .select(
            "node", "rnk",
            F.sum("vol").over(w).alias("cvol"),
            (2.0 * F.sum("closed_w").over(w)).alias("internal2"),
        )
        .select(
            "node", "rnk",
            F.when(
                F.least(F.col("cvol"), F.lit(two_m) - F.col("cvol")) > 0,
                (F.col("cvol") - F.col("internal2"))
                / F.least(F.col("cvol"), F.lit(two_m) - F.col("cvol")),
            ).alias("cond"),  # NULL at the degenerate full/empty prefix
        )
    )
    best = (
        sweep.where(F.col("cond").isNotNull() & ~F.isnan("cond"))
        .orderBy(F.asc("cond"), F.asc("rnk"))
        .limit(1)
        .collect()
    )
    if not best:
        return graph.spark.createDataFrame([(int(seed),)], "node long")
    kbest = best[0]["rnk"]
    return ranked.where(F.col("rnk") <= kbest).select("node")


def _gce_expand(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy expansion of one seed's hop-ball (``cpp/scd/GCE.cpp:52-280``,
    ``expandseed_internal``): repeatedly add the shell node with the
    largest non-negative quality gain.  Runs on ONE seed's bounded ball —
    plain dicts, exact reference bookkeeping (intWeight/extWeight, shell
    degInt/degExt, boundary external-neighbor counts for L)."""
    seed = int(pdf["seed"].iloc[0])
    objective = str(pdf["objective"].iloc[0])
    adj: dict[int, list[tuple[int, float]]] = {}
    wdeg: dict[int, float] = {}
    for s, d, w, wd in zip(
        pdf["src"].to_numpy(), pdf["dst"].to_numpy(),
        pdf["weight"].to_numpy(), pdf["wdeg"].to_numpy(),
    ):
        adj.setdefault(int(s), []).append((int(d), float(w)))
        wdeg[int(s)] = float(wd)

    community: set[int] = set()
    int_w = 0.0
    ext_w = 0.0
    cur_q = 0.0
    shell: dict[int, float] = {}  # candidate -> degInt w.r.t. community
    # community node -> #neighbors outside the community (boundary count)
    ext_count: dict[int, int] = {}

    def add_node(u: int) -> None:
        nonlocal int_w, ext_w
        community.add(u)
        shell.pop(u, None)
        out = 0
        for v, w in adj.get(u, ()):  # u ∈ ball ⇒ full adjacency present
            if v in community:
                int_w += w
                ext_w -= w
                ext_count[v] -= 1
                if ext_count[v] == 0:
                    del ext_count[v]
            else:
                out += 1
                ext_w += w
                if v in adj:  # candidates must be inside the ball
                    shell[v] = shell.get(v, 0.0) + w
        if out:
            ext_count[u] = out

    add_node(seed)

    while True:
        dq_max, v_max = 0.0, None
        boundary_size = len(ext_count)
        for v, deg_int in shell.items():
            deg_ext = wdeg[v] - deg_int
            denom = ext_w - deg_int + deg_ext
            if objective == "M":
                # denom == 0 ⇒ C∪{v} has no external weight: +inf like the
                # reference's IEEE x/0 (0/0 = NaN there ⇒ skip, dq = -1)
                dq = (math.inf if int_w + deg_int > 0 else -1.0) if denom <= 0 \
                    else (int_w + deg_int) / denom - cur_q
            else:  # L (``GCE.cpp:199-236``)
                bdiff = (1 if deg_ext > 0 else 0) - sum(
                    1 for x, _ in adj.get(v, ()) if ext_count.get(x) == 1
                )
                num = 2.0 * (int_w + deg_int) * (boundary_size + bdiff)
                den = (len(community) + 1) * denom
                dq = (math.inf if num > 0 else -1.0) if den <= 0 else num / den - cur_q
            # reference keeps the LAST node with dQ >= dQMax (unordered_map
            # order — nondeterministic there); we break ties by smallest id
            if dq >= 0.0 and (
                dq > dq_max or v_max is None or (dq == dq_max and v < v_max)
            ):
                dq_max, v_max = dq, v
        if v_max is None:
            break
        add_node(v_max)
        if not math.isinf(dq_max):
            cur_q += dq_max

    return pd.DataFrame({"seed": seed, "node": sorted(community)})


def gce(
    graph: EdgeGraph,
    seeds: list[int],
    objective: str = "M",
    max_hops: int = 3,
    max_ball: int = 50_000,
) -> DataFrame:
    """(seed, node) — Greedy Community Expansion (``cpp/scd/GCE.{h,cpp}``):
    from each seed, greedily add the shell node maximizing the quality
    objective **M** (internal/external weight ratio) or **L** (internal
    density × inverse boundary size) until no non-negative gain remains.

    Spark shape: the expansion itself is inherently sequential but LOCAL —
    so each seed's ``max_hops``-ball (capped at ``max_ball`` nodes,
    nearest-first) is gathered with one multi-source BFS, and the greedy
    loop runs per-seed inside ``applyInPandas``, parallel ACROSS seeds.
    Candidates are confined to the ball: a community that would outgrow
    ``max_hops`` is truncated at the ball boundary (same cap philosophy as
    ``max_ego_degree`` in egosplit / ``max_size`` in pagerank_nibble).
    Deviation from the reference: ties on dQ break by smallest node id
    (the reference's unordered_map scan order is nondeterministic).

    Like the reference (``GCE.cpp:38-40``), self-loops are rejected."""
    if objective not in ("M", "L"):
        raise ValueError("unknown objective function (use 'M' or 'L')")
    if not graph.edges.where(F.col("src") == F.col("dst")).isEmpty():
        raise ValueError("Graphs with self-loops are not supported in GCE")
    spark = graph.spark
    sym = graph.sym().select("src", "dst", "weight").persist()
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))

    # multi-source BFS ball: (seed, node, dist)
    ball = spark.createDataFrame(
        [(int(s), int(s), 0) for s in seeds], "seed long, node long, dist int"
    )
    frontier = ball
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select("seed", F.col("dst").alias("node"), F.lit(h).alias("dist"))
            .join(ball.select("seed", "node"), ["seed", "node"], "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        ball = ball.unionByName(nxt)
        frontier = nxt
    # nearest-first cap per seed (#seeds is query-sized, so the per-seed
    # window task is bounded by the ball, not the graph)
    w = Window.partitionBy("seed").orderBy("dist", "node")
    ball = (
        ball.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_ball)
        .select("seed", "node")
    )
    ball_edges = (
        ball.join(sym, ball.node == sym.src)
        .join(wdeg, ball.node == wdeg.node)
        .select("seed", "src", "dst", "weight", "wdeg",
                F.lit(objective).alias("objective"))
    )
    out = ball_edges.groupBy("seed").applyInPandas(
        _gce_expand, "seed long, node long"
    )
    # isolated seeds (no edges) still form {seed}
    lonely = (
        spark.createDataFrame([(int(s),) for s in seeds], "seed long")
        .join(ball_edges.select("seed").distinct(), "seed", "left_anti")
        .select("seed", F.col("seed").alias("node"))
    )
    result = out.unionByName(lonely).localCheckpoint(eager=True)
    sym.unpersist()
    return result
