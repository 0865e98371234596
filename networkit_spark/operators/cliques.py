"""Maximal-clique listing — distributed Eppstein–Löffler–Strash.

Reference: ``cpp/clique/MaximalCliques.{h,cpp}`` (the ELS hybrid,
O(d²·n·3^{d/3}) for degeneracy d).  The classic parallel decomposition:
order vertices by core number (a degeneracy-order proxy — ANY total
order is CORRECT for the dedup invariant; a small-forward-degree order
is what keeps the per-task subproblems tiny), and list, independently
per vertex v, exactly the maximal cliques whose order-minimal member is
v: Bron–Kerbosch with pivoting on R={v}, P = later neighbors,
X = earlier neighbors, inside the subgraph induced on N(v).

Spark shape: ego edges come from the degree-ordered TRIANGLE LIST (the
same two-equi-join plan as ``triangles.py``, oriented by the (core, id)
rank), never from an N(v)×N(v) wedge join — so the intermediate is
bounded by Σ forward-degree² (core-bounded), not Σ degree² (hub-
quadratic).  Each rank-ordered triangle (x, y, z) contributes exactly
TWO ego rows: a P–P edge (y, z) to ego x and an X–P edge (x, z) to ego
y; the X–X edge (x, y) at ego z is dropped because Bron–Kerbosch never
consults adjacency BETWEEN two X members (X only shrinks via
intersection with the adjacency of a chosen P vertex, and the pivot
score is |adj ∩ P|) — the Eppstein–Löffler–Strash subgraph trimming.
A hub of degree D therefore receives O(D + D·core) rows, linear in D,
and its P set is core-bounded: no single-task blowup.  Σ task input =
2m + 2·#triangles rows.  The local listing is an ITERATIVE (explicit
stack) BK with greedy pivoting — clique depth is not bounded by the
Python recursion limit.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph

# The BK closure crosses the driver→executor boundary and calls the
# module-level _bron_kerbosch_pivot; pickle the module by value so
# executors don't need the package on PYTHONPATH (superstep.py:46).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def _bron_kerbosch_pivot(adj, R, P, X, out):
    """Classic BK with greedy pivoting over python sets — ITERATIVE with
    an explicit frame stack, so clique depth is not limited by the
    Python recursion limit (original implementation against the
    published algorithm, not the reference's)."""
    if not P and not X:
        out.append(sorted(R))
        return

    def _cands(P, X):
        pivot = max(P | X, key=lambda w: len(adj.get(w, frozenset()) & P))
        return list(P - adj.get(pivot, frozenset()))

    stack = [(R, P, X, _cands(P, X))]
    while stack:
        fR, fP, fX, cand = stack[-1]
        if not cand:
            stack.pop()
            continue
        v = cand.pop()
        nv = adj.get(v, frozenset())
        cR, cP, cX = fR | {v}, fP & nv, fX & nv
        fP.discard(v)
        fX.add(v)
        if not cP and not cX:
            out.append(sorted(cR))
        else:
            stack.append((cR, cP, cX, _cands(cP, cX)))


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
    # ego edges from the degree-ordered TRIANGLE LIST (never an
    # N(v)×N(v) wedge join): orient lo→hi by rank, wedge-join on the
    # low corner (Σ forward-deg², core-bounded), close on the third
    # edge — every triangle found once as (x, y, z), rk x < y < z.
    o = ann.where(F.col("rs") < F.col("rd")).persist()
    w1 = o.select(F.col("src").alias("x"), F.col("dst").alias("y"), F.col("rd").alias("ry"))
    w2 = o.select(F.col("src").alias("x"), F.col("dst").alias("z"), F.col("rd").alias("rz"))
    tri = (
        w1.join(w2, "x")
        .where(F.col("ry") < F.col("rz"))
        .join(
            o.select(F.col("src").alias("y"), F.col("dst").alias("z")),
            ["y", "z"],
            "left_semi",
        )
    )
    # Two ego rows per triangle: P–P at the min corner, X–P at the mid
    # corner.  The X–X row at the max corner is intentionally dropped —
    # BK never consults adjacency between two X members (see module doc).
    ego_edges = tri.select(
        F.col("x").alias("v"),
        F.col("y").alias("a"),
        F.lit(None).cast("boolean").alias("later"),
        F.col("z").alias("b"),
    ).unionByName(
        tri.select(
            F.col("y").alias("v"),
            F.col("x").alias("a"),
            F.lit(None).cast("boolean").alias("later"),
            F.col("z").alias("b"),
        )
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
