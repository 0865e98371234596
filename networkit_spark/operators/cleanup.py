"""Significance-based community cleanup (OSLOM-style, the fork's cleanup/).

Reference: ``cpp/community/cleanup/`` — ``SignificanceCommunityCleanUp``
drives ``SingleCommunityCleanUp.clean()`` per community, which runs two
phases of ``calculateSignificantNodes`` and discards communities that
changed drastically (``SingleCommunityCleanUp.cpp:28-36,258-270``).
Per phase (``SingleCommunityCleanUp.cpp:53-77``):

* score every candidate (non-member neighbor; phase 2 restricts
  candidates to the phase's input members, so only removed members can
  re-enter) with the r-score — the null-model probability that a node
  of degree ``k`` has ``>= kIn`` edges into the community
  (``SignificanceCalculator.cpp:19-48``);
* test the sorted scores with the order statistic
  ``P(Bin(externalNodes, r) >= position)`` against
  ``significanceThreshold / fitted_exponent(externalNodes)``
  (``SingleCommunityCleanUp.cpp:196-238``);
* if no candidate is significant, remove the worst member(s) (one, or
  10% when >= 20 members, ``SingleCommunityCleanUp.cpp:112-155``) and
  repeat until the community dies or stabilizes.

Deviations (documented):

* The r-score always uses the hypergeometric approximation; the
  reference switches to an exact config-model sum only when
  ``k^2 >= openStubs`` (``SignificanceCalculator.cpp:27-36``) — at the
  scales this engine targets ``k^2 << openStubs`` essentially always.
* The reference adds U(-0.5e-6, 0.5e-6) "boot" jitter to the mid-p term
  from an unseeded RNG; this engine uses the deterministic mid-p value
  ``rightCum + 0.5 * pmf`` so results are reproducible.
* ``mergeDiscarded`` (MergeCommunities.cpp) is not implemented; the
  cleaned cover simply drops insignificant communities.

Spark shape: per phase, ONE join of the symmetrized edge table against
the membership table gathers every community's incident edges, then
``applyInPandas`` over community groups runs the per-community loop —
all communities clean in parallel, each task is O(vol(C)).  Community
sizes are bounded (egosplit personas, LFR ground truth), so groups stay
small at any graph scale; the graph itself is never collected.
"""

from __future__ import annotations

import math
import sys
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from networkit_spark.graph import EdgeGraph, degrees


def _log_binom(n: float, k: float) -> float:
    if k < 0 or k > n:
        return float("-inf")
    return (
        math.lgamma(n + 1.0) - math.lgamma(k + 1.0) - math.lgamma(n - k + 1.0)
    )


def _hyper_pmf(N: int, K: int, n: int, k: int) -> float:
    """P[X = k], X ~ Hypergeometric(N, K, n) — StochasticDistribution.h:97."""
    lp = _log_binom(K, k) + _log_binom(N - K, n - k) - _log_binom(N, n)
    return math.exp(lp) if lp > -700 else 0.0


def _hyper_right_cum(N: int, K: int, n: int, k_min: int) -> float:
    """P[X >= k_min]."""
    hi = min(n, K)
    if k_min > hi:
        return 0.0
    return sum(_hyper_pmf(N, K, n, k) for k in range(k_min, hi + 1))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the regularized incomplete beta (Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front) if ln_front > -700 else 0.0
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _binom_right_cum(p: float, n: int, k: int) -> float:
    """P[Bin(n, p) >= k] = I_p(k, n - k + 1) — rightCumulativeBinomial."""
    if k <= 0:
        return 1.0
    if k > n:
        return 0.0
    return _betainc(float(k), float(n - k + 1), p)


def _r_score(k: int, k_in: int, c_out: int, ext_stubs: int) -> float:
    open_stubs = ext_stubs + c_out
    pmf = _hyper_pmf(open_stubs, c_out, k, k_in)
    right = _hyper_right_cum(open_stubs, c_out, k, k_in + 1)
    score = right + 0.5 * pmf  # deterministic mid-p (see module doc)
    return min(max(score, 1e-100), 1.0)


def _fitted_exponent(n: int) -> float:
    # SingleCommunityCleanUp.cpp:196-214 (OSLOM's empirical fit)
    if n <= 1:
        return 1.0
    l = math.log(float(n))
    if n > 100:
        return 4.2 * l - 8.5
    if n > 30:
        return 3.5 * l - 5.5
    if n > 7:
        return 2.5 * l - 2.0
    return 1.3 * l + 0.1


def _significant_prefix(
    scores: list, external_nodes: int, significance_threshold: float
) -> list:
    """findSignificantCandidates: longest significant prefix of the
    ascending score list."""
    threshold = significance_threshold / _fitted_exponent(external_nodes)
    significant_count = 0
    for pos, (score, _node) in enumerate(scores, start=1):
        if _binom_right_cum(score, external_nodes, pos) < threshold:
            significant_count = pos
        elif significant_count != 0:
            break
    return [node for _s, node in scores[:significant_count]]


def _clean_one_phase(
    members: set,
    adj_to: dict,
    deg: dict,
    n_total: int,
    two_m: int,
    score_threshold: float,
    significance_threshold: float,
    only_original: bool,
) -> set:
    """One calculateSignificantNodes pass. ``adj_to[v]`` lists the
    neighbors u of v for every v that is (or was) a member; ``deg`` has
    every node appearing anywhere in the group."""
    community = set(members)
    original = set(members)
    edges_to_c: dict = defaultdict(int)
    for v in community:
        for u in adj_to.get(v, ()):
            edges_to_c[u] += 1
    candidates = {
        u
        for u in edges_to_c
        if u not in community and (not only_original or u in original)
    }
    total_stubs = sum(deg[v] for v in community)
    outgoing = total_stubs - sum(edges_to_c[v] for v in community)
    external_nodes = n_total - len(community)
    external_stubs = two_m - total_stubs

    significant: list = []
    while community:
        cand_scores = sorted(
            (s, u)
            for s, u in (
                (_r_score(deg[u], edges_to_c[u], outgoing, external_stubs), u)
                for u in candidates
            )
            if s < score_threshold
        )
        significant = _significant_prefix(
            cand_scores, external_nodes, significance_threshold
        )
        if significant:
            break
        internal = [
            (
                _r_score(
                    deg[u],
                    edges_to_c[u],
                    outgoing + 2 * edges_to_c[u] - deg[u],
                    external_stubs + deg[u],
                ),
                u,
            )
            for u in community
        ]
        # removeWorstNode: one node, or the worst 10% when >= 20 members
        internal.sort(reverse=True)
        n_remove = 1 if len(internal) < 20 else len(internal) // 10
        for _score, r in internal[:n_remove]:
            community.discard(r)
            if not only_original or r in original:
                candidates.add(r)
            external_nodes += 1
            d = deg[r]
            outgoing += 2 * edges_to_c[r] - d
            total_stubs -= d
            external_stubs += d
            for u in adj_to.get(r, ()):
                edges_to_c[u] -= 1
    return community | set(significant)


def _clean_community_group(pdf: pd.DataFrame) -> pd.DataFrame:
    comm = int(pdf["community"].iloc[0])
    n_total = int(pdf["n_total"].iloc[0])
    two_m = int(pdf["two_m"].iloc[0])
    score_t = float(pdf["score_t"].iloc[0])
    sig_t = float(pdf["sig_t"].iloc[0])
    only_orig = bool(pdf["only_orig"].iloc[0])

    deg: dict = {}
    members: set = set()
    adj_to: dict = defaultdict(list)
    for u, v, d, is_mem in zip(pdf["u"], pdf["v"], pdf["deg"], pdf["member"]):
        u = int(u)
        deg[u] = int(d)
        if is_mem:
            members.add(u)
        if v >= 0:
            adj_to[int(v)].append(u)

    cleaned = _clean_one_phase(
        members, adj_to, deg, n_total, two_m, score_t, sig_t, only_orig
    )
    return pd.DataFrame({"community": comm, "node": sorted(cleaned)})


def _gather_and_clean(
    graph: EdgeGraph,
    membership: DataFrame,
    n_total: int,
    two_m: int,
    score_threshold: float,
    significance_threshold: float,
    only_original: bool,
) -> DataFrame:
    sym = graph.sym().where(F.col("src") != F.col("dst"))
    # loop-free degrees: two_m and the incident gather both exclude
    # self-loops, so the degree table must too — otherwise total/external
    # stub counts drift on graphs with loops (the reference includes
    # loops in BOTH 2m and the stubs; this engine excludes them from
    # both, which is equivalent for the significance ratios)
    deg = degrees(
        graph.edges.where(F.col("src") != F.col("dst")), directed=False
    ).select("node", "deg")
    incident = (
        sym.join(membership.withColumnRenamed("node", "dst"), "dst")
        .select("community", F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    # every member also gets a sentinel row so kIn=0 members keep their
    # degree and membership visible to the group
    member_rows = membership.select(
        "community", F.col("node").alias("u"), F.lit(-1).cast("long").alias("v")
    )
    mem_flag = membership.select(
        "community", F.col("node").alias("u"), F.lit(True).alias("member")
    )
    rows = (
        incident.unionByName(member_rows)
        .join(deg.withColumnRenamed("node", "u"), "u")
        .join(mem_flag, ["community", "u"], "left")
        .select(
            "community",
            "u",
            "v",
            "deg",
            F.coalesce("member", F.lit(False)).alias("member"),
            F.lit(n_total).alias("n_total"),
            F.lit(two_m).alias("two_m"),
            F.lit(float(score_threshold)).alias("score_t"),
            F.lit(float(significance_threshold)).alias("sig_t"),
            F.lit(bool(only_original)).alias("only_orig"),
        )
    )
    return rows.groupBy("community").applyInPandas(
        _clean_community_group, "community long, node long"
    )


def merge_discarded_communities(
    graph: EdgeGraph,
    discarded: DataFrame,
    n_total: int,
    two_m: int,
    score_threshold: float = 0.1,
    significance_threshold: float = 0.1,
    iterations: int = 2,
    max_community_size: int | None = None,
) -> DataFrame:
    """``MergeCommunities`` (``cleanup/MergeCommunities.cpp:31-287``):
    try to assemble SIGNIFICANT communities out of the ones the cleanup
    discarded.  Per iteration: (1) build the coarse graph whose nodes
    are discarded communities and whose edge weights count original-
    graph edges between their member sets (``createDiscardedCommunities
    Graph``, ``:51-115``) — one membership double-join + aggregate;
    (2) group coarse nodes by local moving (``tryToMergeCommunities``,
    ``:117-140``); (3) run every merged candidate through the single-
    community significance cleanup and keep the survivors
    (``checkMergedCommunities``, ``:208-287``).

    Documented deviation: step (2) uses the engine's PLM modularity
    local-move on the coarse graph where the reference moves by r-score
    (``tryLocalMove``, ``:142-206``).  The merge step is only a
    CANDIDATE heuristic — step (3) applies the reference's own
    significance gate to every candidate, so the deviation can change
    which merges are proposed but never admit an insignificant
    community.  Returns the significant merged part of the cover.
    """
    from networkit_spark.operators.louvain import plm

    out = None
    discarded = discarded.persist()
    for _ in range(iterations):
        if discarded.limit(1).count() == 0:
            break
        # coarse graph over discarded communities (cover-aware: a node in
        # k communities contributes each incident edge to all k rows)
        sym = graph.sym().where(F.col("src") != F.col("dst"))
        ma = discarded.select(F.col("node").alias("src"), F.col("community").alias("ca"))
        mb = discarded.select(F.col("node").alias("dst"), F.col("community").alias("cb"))
        coarse_e = (
            sym.join(ma, "src")
            .join(mb, "dst")
            .groupBy(
                F.least("ca", "cb").alias("src"), F.greatest("ca", "cb").alias("dst")
            )
            .agg((F.count(F.lit(1)) / 2.0).alias("weight"))
            # the merge heuristic moves whole communities, so internal
            # (self-loop) weight never changes a move's delta — drop it
            .where(F.col("src") != F.col("dst"))
            .localCheckpoint(eager=True)
        )
        if coarse_e.limit(1).count() == 0:
            break
        coarse = EdgeGraph(coarse_e, directed=False, weighted=True)
        merged = plm(coarse, max_levels=1).select(
            F.col("node").alias("community"), F.col("label").alias("merged")
        )
        candidate = (
            discarded.join(merged, "community")
            .select("node", F.col("merged").alias("community"))
            .distinct()
        )
        if max_community_size is not None:
            small = (
                candidate.groupBy("community")
                .agg(F.count(F.lit(1)).alias("_sz"))
                .where(F.col("_sz") <= max_community_size)
                .select("community")
            )
            candidate = candidate.join(small, "community", "left_semi")
        cleaned = _gather_and_clean(
            graph, candidate, n_total, two_m, score_threshold,
            significance_threshold, False,
        ).localCheckpoint(eager=True)
        out = cleaned if out is None else out.unionByName(cleaned)
        # candidates whose cleanup failed stay discarded for the next round
        failed = candidate.join(cleaned.select("community").distinct(), "community", "left_anti")
        nxt = failed.persist()
        nxt.count()
        discarded.unpersist()
        discarded = nxt
    discarded.unpersist()
    if out is None:
        spark = graph.spark
        return spark.createDataFrame([], "node long, community long")
    return out


def significance_cleanup(
    graph: EdgeGraph,
    cover: DataFrame,
    score_threshold: float = 0.1,
    significance_threshold: float = 0.1,
    min_overlap_ratio: float = 0.5,
    merge_discarded: bool = False,
) -> DataFrame:
    """Clean every community of ``cover`` (node, community); returns the
    cleaned cover with insignificant / drastically-changed communities
    dropped — SignificanceCommunityCleanUp.run(); ``merge_discarded=True``
    additionally tries to merge the discarded communities into
    significant ones (``mergeDiscardedCommunities``,
    ``SignificanceCommunityCleanUp.cpp:33-34,85-99``)."""
    g = graph.to_undirected() if graph.directed else graph
    n_total = g.num_nodes()
    two_m = 2 * g.edges.where(F.col("src") != F.col("dst")).count()
    orig = cover.select("node", "community").persist()

    phase1 = _gather_and_clean(
        g, orig, n_total, two_m, score_threshold, significance_threshold, False
    ).persist()
    phase1.count()
    phase2 = _gather_and_clean(
        g, phase1, n_total, two_m, score_threshold, significance_threshold, True
    ).persist()
    phase2.count()

    # smallOverlap: |orig ∩ cleaned| / max(|orig|, |cleaned|) >= ratio
    orig_sizes = orig.groupBy("community").agg(F.count("*").alias("orig_size"))
    new_sizes = phase2.groupBy("community").agg(F.count("*").alias("new_size"))
    overlap = (
        phase2.join(orig, ["community", "node"], "left_semi")
        .groupBy("community")
        .agg(F.count("*").alias("overlap"))
    )
    keep = (
        orig_sizes.join(new_sizes, "community")
        .join(overlap, "community", "left")
        .where(
            F.coalesce("overlap", F.lit(0))
            / F.greatest("orig_size", "new_size")
            >= F.lit(float(min_overlap_ratio))
        )
        .select("community")
    )
    out = phase2.join(keep, "community", "left_semi").select("node", "community")
    out = out.localCheckpoint(eager=True)
    if merge_discarded:
        kept_comms = out.select("community").distinct()
        disc = orig.join(kept_comms, "community", "left_anti")
        merged = merge_discarded_communities(
            g, disc, n_total, two_m, score_threshold, significance_threshold
        )
        # merged community ids live in the coarse-label space; offset them
        # past the kept ids so the union stays collision-free
        max_id = (out.agg(F.max("community")).collect()[0][0] or 0) + 1
        out = out.unionByName(
            merged.select("node", (F.col("community") + F.lit(max_id)).alias("community"))
        ).localCheckpoint(eager=True)
    orig.unpersist()
    phase1.unpersist()
    phase2.unpersist()
    return out
