"""Maximal-clique listing — distributed Eppstein–Löffler–Strash.

Reference: ``cpp/clique/MaximalCliques.{h,cpp}`` (the ELS hybrid,
O(d²·n·3^{d/3}) for degeneracy d).  The classic parallel decomposition:
order vertices by core number (a degeneracy-order proxy — ANY total
order is CORRECT for the dedup invariant; a small-forward-degree order
is what keeps the per-task subproblems tiny), and list, independently
per vertex v, exactly the maximal cliques whose order-minimal member is
v: Bron–Kerbosch with pivoting on R={v}, P = later neighbors,
X = earlier neighbors, inside the subgraph induced on N(v).

Spark shape: the per-vertex induced ego-net is ONE wedge join — the
(v, a, b) triangle incidences, the same table the triangle/egosplit
operators build — grouped by v into an ``applyInPandas`` task that runs
the O(3^{d/3}) local recursion in numpy sets.  Σ task input = 3·#triangles
rows, and the per-task candidate set is bounded by the vertex's degree
(forward part by core number), so there is no single-task blowup beyond
what the reference itself admits on a hub.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph


def _bron_kerbosch_pivot(adj, R, P, X, out):
    """Classic BK with greedy pivoting over python sets (per-task local
    recursion; original implementation against the published algorithm,
    not the reference's)."""
    if not P and not X:
        out.append(sorted(R))
        return
    pivot = max(P | X, key=lambda w: len(adj.get(w, frozenset()) & P))
    for v in list(P - adj.get(pivot, frozenset())):
        nv = adj.get(v, frozenset())
        _bron_kerbosch_pivot(adj, R | {v}, P & nv, X & nv, out)
        P.discard(v)
        X.add(v)


def maximal_cliques(graph: EdgeGraph, min_size: int = 1) -> DataFrame:
    """(clique_id, size, nodes) — every maximal clique, exactly once.

    ``clique_id`` is a deterministic hash of the sorted member list.
    Isolated-from-triangles edges (maximal 2-cliques) and singleton
    components are included when ``min_size`` admits them."""
    import pyspark.sql.types as T

    e = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    from networkit_spark.operators.kcore import core_decomposition

    cores = core_decomposition(graph).select("node", "core")
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # order key: (core, node) — small forward degrees, total, deterministic
    rank = cores.select(
        "node", (F.col("core") * F.lit(1 << 40) + F.col("node")).alias("rk")
    )
    ann = (
        sym.join(rank.select(F.col("node").alias("src"), F.col("rk").alias("rs")), "src")
        .join(rank.select(F.col("node").alias("dst"), F.col("rk").alias("rd")), "dst")
    )
    # ego rows: (v, nbr, nbr_rank, later?) for every neighbor
    ego_nbrs = ann.select(
        F.col("src").alias("v"),
        F.col("dst").alias("a"),
        (F.col("rd") > F.col("rs")).alias("later"),
        F.lit(None).cast("long").alias("b"),
    )
    # ego edges: (v, a, b) with a, b ∈ N(v) and (a, b) ∈ E — one wedge
    # join against the edge table (triangle incidences)
    na = ann.select(F.col("src").alias("v"), F.col("dst").alias("a"))
    nb = ann.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    ego_edges = (
        na.join(nb, "v")
        .where(F.col("a") < F.col("b"))
        .join(e.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "left_semi")
        .select("v", "a", F.lit(None).cast("boolean").alias("later"), "b")
    )
    rows = ego_nbrs.unionByName(ego_edges)

    schema = T.StructType(
        [
            T.StructField("clique_id", T.LongType()),
            T.StructField("size", T.LongType()),
            T.StructField("nodes", T.ArrayType(T.LongType())),
        ]
    )

    def run_bk(key, pdf):
        v = int(key[0])
        nbr_rows = pdf[pdf["b"].isna()]
        edge_rows = pdf[~pdf["b"].isna()]
        later = set(nbr_rows[nbr_rows["later"] == True]["a"].astype(int))  # noqa: E712
        earlier = set(nbr_rows[nbr_rows["later"] == False]["a"].astype(int))  # noqa: E712
        adj: dict = {}
        for a, b in zip(edge_rows["a"].astype(int), edge_rows["b"].astype(int)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        adj = {k: frozenset(s) for k, s in adj.items()}
        out: list = []
        _bron_kerbosch_pivot(adj, {v}, set(later), set(earlier), out)
        recs = []
        for clique in out:
            if len(clique) < min_size:
                continue
            h = 1469598103934665603
            for m in clique:
                h = ((h ^ m) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
            recs.append((h, len(clique), clique))
        return pd.DataFrame(recs, columns=["clique_id", "size", "nodes"])

    # isolated vertices would be their own maximal 1-cliques, but the
    # vertex set derives from edges, so none exist here (documented)
    return rows.groupBy("v").applyInPandas(run_bk, schema)


def max_clique(graph: EdgeGraph) -> DataFrame:
    """``MaximalCliques(G, maximumOnly=True)`` surface: one row
    (size, nodes) — a maximum clique, deterministic tie-break by the
    member hash."""
    return (
        maximal_cliques(graph)
        .orderBy(F.desc("size"), F.asc("clique_id"))
        .limit(1)
        .select("size", "nodes")
    )
