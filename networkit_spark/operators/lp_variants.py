"""Label-propagation variants beyond PLP (SURVEY §2.5.3 family).

``lp_degree_ordered`` — reference ``cpp/community/LPDegreeOrdered.cpp:
18-96``: label propagation where nodes are processed in INCREASING
degree order, each node adopting the most frequent neighbor label
(counts, NOT weights — ``:42`` adds 1 per neighbor regardless of edge
weight), until ≤ ``theta = n/1e5`` nodes update (``:20,75``).  The
reference runs asynchronously over a degree-sorted node array with a
hash-order (non-deterministic) tie-break at ``:45-48``.  This engine
defines the SYNCHRONOUS analogue, with the degree ordering folded into
a deterministic tie-break: among equally frequent labels a node prefers
the one whose carriers include the LOWEST-degree neighbor (then the
smallest label id).  Low-degree nodes win ties exactly as they win the
reference's sequential ordering — they commit their labels first —
while every sweep reads the previous sweep's labels, so the result is
deterministic and partition-count-invariant.  One sweep is a pure
join + window argmax, so the gate row has a full DuckDB oracle.

``slpa`` — reference ``cpp/community/SLPA.cpp:33-122`` (the fork adds it
for overlapping covers): every node keeps a MEMORY of labels, seeded
with its own id (``:20-22``).  Per iteration each listener receives one
label from every neighbor — the speaker samples from its memory with
probability proportional to the label's count (``:74-93``) — and adds
the most frequent received label to its memory (the commented-out
``selectLabel`` max; we keep the deterministic max with smallest-id
tie-break rather than the reference's random draw).  After ``T``
iterations a node belongs to every label holding ≥ ``threshold`` of its
memory (``:95-122``); the densest such label is its partition.  The
reference's RNG draws are replaced by a counter-based hash RNG
(xxhash64 over (speaker, listener, iteration, seed)) so the cover is
deterministic at any parallelism.  Distributed shape: memory is a
``(node, label, cnt)`` table (≤ T+1 rows per node), speaking is an
edge-join against cumulative count ranges, listening a groupBy argmax —
two shuffles per iteration, no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import EdgeGraph, truncate_lineage


def lp_degree_ordered(
    graph: EdgeGraph,
    theta: float | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """Return ``(node: long, label: long)`` — LPDegreeOrdered assignment
    under synchronous sweeps (see module doc for the ordering rule).

    ``max_iter`` is a hard cap, not merely a convergence hint:
    synchronous label propagation OSCILLATES on bipartite-ish structure
    (two labels swapping forever — the TPCH link graph plateaus at ~60%
    of n), so an uncapped loop need never reach ``theta``."""
    n = graph.num_nodes()
    if theta is None:
        theta = n / 1e5
    sym = (graph.sym() if not graph.directed else graph.to_undirected().sym()).persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))

    labels = graph.vertices().select(F.col("id").alias("node"), F.col("id").alias("label"))
    it = 0
    while True:
        it += 1
        # neighbor label frequencies, carrying the lowest carrier degree
        lw = (
            sym.join(
                labels.join(deg, "node").select(
                    F.col("node").alias("src"), "label", F.col("deg").alias("src_deg")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("src_deg").alias("min_deg"))
        )
        heavy = lw.groupBy("node").agg(
            F.expr("max_by(label, struct(cnt, -min_deg, -label))").alias("heavy")
        )
        new_labels = truncate_lineage(
            labels.join(heavy, "node", "left").select(
                "node",
                F.coalesce("heavy", "label").alias("label"),
                (F.coalesce("heavy", "label") != F.col("label")).alias("chg"),
            ),
            it,
        )
        updated = new_labels.where("chg").count()
        labels = new_labels.select("node", "label")
        if updated <= theta or it >= max_iter:
            break
    sym.unpersist()
    return labels


def lp_potts(
    graph: EdgeGraph,
    alpha: float = 0.3,
    theta: float | None = None,
    max_iter: int = 20,
    base_clustering: DataFrame | None = None,
) -> DataFrame:
    """Absolute-Potts-Model label propagation — reference
    ``cpp/community/LPPotts.cpp:33-160``: a node adopts the label
    maximizing ``count_in_neighborhood(l) − α·(globalCount(l) −
    count_in_neighborhood(l))`` (UNWEIGHTED neighbor counts, ``:92-104``),
    i.e. popular-globally labels are penalized, which bounds community
    sizes.  The reference iterates asynchronously with a random
    tie-break; this engine is the SYNCHRONOUS variant (every sweep reads
    the previous sweep's labels and global counts) with the smallest-id
    tie-break, same as :func:`plp`/:func:`lp_degree_ordered` — so one
    sweep is joins + a window argmax and the gate row has a full DuckDB
    oracle.  Stops when ≤ ``theta`` (default n/1e5, ``:47-49``) nodes
    update or after ``max_iter`` sweeps (synchronous LP can oscillate,
    the cap is mandatory).

    Returns ``(node: long, label: long)``."""
    n = graph.num_nodes()
    if theta is None:
        theta = n / 1e5
    sym = (graph.sym() if not graph.directed else graph.to_undirected().sym()).persist()
    if base_clustering is not None:
        labels = base_clustering.select("node", "label")
    else:
        labels = graph.vertices().select(
            F.col("id").alias("node"), F.col("id").alias("label")
        )
    it = 0
    while True:
        it += 1
        glob = labels.groupBy("label").agg(F.count(F.lit(1)).alias("g"))
        lw = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # weight(l) = cnt − α·(g − cnt) = (1+α)·cnt − α·g ; glob is a
        # label-count dim table — broadcast-sized after a few sweeps,
        # but leave the strategy to AQE (it starts at n rows).
        best = (
            lw.join(glob, "label")
            .withColumn(
                "wgt",
                (1.0 + alpha) * F.col("cnt") - alpha * F.col("g"),
            )
            .groupBy("node")
            .agg(F.expr("max_by(label, struct(wgt, -label))").alias("heavy"))
        )
        new_labels = truncate_lineage(
            labels.join(best, "node", "left").select(
                "node",
                F.coalesce("heavy", "label").alias("label"),
                (F.coalesce("heavy", "label") != F.col("label")).alias("chg"),
            ),
            it,
        )
        updated = new_labels.where("chg").count()
        labels = new_labels.select("node", "label")
        if updated <= theta or it >= max_iter:
            break
    sym.unpersist()
    return labels


def olp(
    graph: EdgeGraph,
    k: int = 3,
    theta: float | None = None,
    max_iter: int = 20,
    min_size: int = 5,
) -> DataFrame:
    """Overlapping label propagation — reference ``cpp/community/
    OLP.cpp:28-160`` (Ovelgönne ensemble-LP variant): every node keeps
    up to ``k`` labels; per sweep it gathers the WEIGHTED frequency of
    every label held by any neighbor (``:71-76``) and keeps the ``k``
    heaviest (all of them when ≤ k distinct, ``:80-84``); communities
    with fewer than 5 members are discarded at the end (``:139-152``).
    Reference tie-breaks shuffle randomly (``:96-105``); this engine is
    the synchronous variant with the deterministic (weight desc, label
    asc) ranking, so one sweep is a join + window top-k — the gate has
    a full DuckDB oracle.

    Returns the COVER ``(node: long, label: long)`` (a node may appear
    in up to ``k`` rows; nodes whose every label was discarded appear
    in none, as in the reference's Cover)."""
    n = graph.num_nodes()
    if theta is None:
        theta = n / 1e5
    sym = (graph.sym() if not graph.directed else graph.to_undirected().sym()).persist()
    cover = graph.vertices().select(
        F.col("id").alias("node"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("label"))
    it = 0
    while True:
        it += 1
        received = (
            sym.join(cover.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum("weight").alias("wsum"))
        )
        new_cover = truncate_lineage(
            received.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("node", "label"),
            it,
        )
        # changed node count = nodes in the symmetric set difference
        changed = (
            new_cover.exceptAll(cover)
            .select("node")
            .unionByName(cover.exceptAll(new_cover).select("node"))
            .distinct()
            .count()
        )
        cover = new_cover
        if changed <= theta or it >= max_iter:
            break
    sym.unpersist()
    sizes = cover.groupBy("label").agg(F.count(F.lit(1)).alias("csz"))
    return (
        cover.join(sizes.where(F.col("csz") >= min_size), "label")
        .select("node", "label")
    )


def _speak(memory: DataFrame, sym: DataFrame, it: int, seed: int) -> DataFrame:
    """One label per (speaker → listener) edge, sampled from the speaker's
    memory proportional to counts via a counter-based hash RNG: draw
    ``r ∈ [0, total)`` per edge and pick the label whose cumulative-count
    range covers it (``SLPA.cpp:74-93``'s discrete_distribution)."""
    w = Window.partitionBy("node").orderBy("label")
    cum = memory.select(
        "node",
        "label",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("lo"),
        F.sum("cnt").over(w).alias("hi"),
        F.sum("cnt").over(Window.partitionBy("node")).alias("total"),
    )
    # edges join the speaker's cumulative table; the per-edge draw is
    # uniform in [0, total) — pmod keeps it non-negative
    e = sym.select(F.col("src").alias("node"), F.col("dst").alias("listener"))
    drawn = (
        e.join(cum, "node")
        .withColumn(
            "r",
            F.pmod(
                F.xxhash64("node", "listener", F.lit(it), F.lit(seed)), F.col("total")
            ),
        )
        .where((F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi")))
        .select("listener", "label")
    )
    return drawn


def _slpa_memory(
    graph: EdgeGraph,
    num_iterations: int,
    seed: int,
    base_clustering: DataFrame | None,
) -> DataFrame:
    """Run the speak/listen iterations; return the final ``(node, label,
    cnt)`` memory table."""
    sym = (graph.sym() if not graph.directed else graph.to_undirected().sym()).persist()
    if base_clustering is not None:
        memory = base_clustering.select("node", "label", F.lit(1).alias("cnt"))
    else:
        memory = graph.vertices().select(
            F.col("id").alias("node"), F.col("id").alias("label"), F.lit(1).alias("cnt")
        )
    memory = memory.localCheckpoint(eager=True)

    for it in range(num_iterations):
        received = _speak(memory, sym, it, seed)
        # listener keeps the most frequent received label (deterministic
        # smallest-id tie-break; see module doc)
        counts = received.groupBy(F.col("listener").alias("node"), "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        chosen = counts.groupBy("node").agg(
            F.expr("max_by(label, struct(c, -label))").alias("label")
        )
        memory = truncate_lineage(
            memory.unionByName(chosen.select("node", "label", F.lit(1).alias("cnt")))
            .groupBy("node", "label")
            .agg(F.sum("cnt").alias("cnt")),
            it,
        )
    sym.unpersist()
    return memory


def slpa(
    graph: EdgeGraph,
    threshold: float = 0.1,
    num_iterations: int = 20,
    seed: int = 42,
    base_clustering: DataFrame | None = None,
) -> DataFrame:
    """Return ``(node: long, label: long)`` — an overlapping COVER (a node
    may appear in several rows); every label retained holds ≥
    ``threshold`` of the node's post-run memory (``SLPA.cpp:95-122``)."""
    memory = _slpa_memory(graph, num_iterations, seed, base_clustering)
    total = memory.groupBy("node").agg(F.sum("cnt").alias("total"))
    return (
        memory.join(total, "node")
        .where(F.col("cnt") / F.col("total") >= threshold)
        .select("node", "label")
    )


def slpa_partition(
    graph: EdgeGraph,
    threshold: float = 0.1,
    num_iterations: int = 20,
    seed: int = 42,
    base_clustering: DataFrame | None = None,
) -> DataFrame:
    """Disjoint partition view of :func:`slpa` — each node's densest
    retained label (``SLPA.cpp:104-120``); nodes whose memory retains no
    label above threshold fall back to singletons (``:118-119``)."""
    memory = _slpa_memory(graph, num_iterations, seed, base_clustering)
    total = memory.groupBy("node").agg(F.sum("cnt").alias("total"))
    best = (
        memory.join(total, "node")
        .where(F.col("cnt") / F.col("total") >= threshold)
        .groupBy("node")
        .agg(F.expr("max_by(label, struct(cnt, -label))").alias("label"))
    )
    return (
        graph.vertices()
        .select(F.col("id").alias("node"))
        .join(best, "node", "left")
        .select("node", F.coalesce("label", "node").alias("label"))
    )
