"""Graph generators — deterministic, SQL-only (no RNG state).

Reference inventory (§2.13, ``cpp/generators/``): ErdosRenyi,
BarabasiAlbert, WattsStrogatz, ChungLu, RMAT, Hyperbolic, LFR …  The
reference seeds thread-local RNGs (``setSeed(seed, useThreadId)``,
pyx:239-252); this engine derives every random choice from
``xxhash64(seed, index)`` — identical output at any parallelism, any
scale factor, resumable for free.

- ``erdos_renyi(n, p)``: Batagelj–Brandes geometric skips over fixed
  blocks of the pair-index space (O(p·block) per task, any n).
- ``chung_lu(weights)``: expected-degree model — edge (u,v) kept with
  prob ``min(w_u·w_v/Σw, 1)`` via the Miller–Hagberg skip walk.
- ``watts_strogatz(n, k, beta)``: ring lattice + hash-decided rewiring.
- ``rmat(scale, edge_factor, a, b, c, d)``: recursive quadrant descent,
  one hash bit-pair per level — the standard Graph500 skew generator,
  fully vectorized in SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import EdgeGraph, canonicalize, truncate_lineage


def _uniform(seed: int, *cols) -> "F.Column":
    """Deterministic U[0,1) from xxhash64."""
    h = F.abs(F.xxhash64(F.lit(seed), *cols))
    return (h % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def erdos_renyi(spark: SparkSession, n: int, p: float, seed: int = 42) -> EdgeGraph:
    """G(n, p) — undirected, no self-loops — via Batagelj–Brandes
    geometric skips over the linearized pair-index space [0, C(n,2)).

    The index space is cut into FIXED-size blocks (independent of
    parallelism); each block restarts the Bernoulli(p) process with a
    counter-based Philox RNG keyed (seed, block) — memorylessness makes
    the restart exact, so the union over blocks is a true G(n, p)
    sample, identical at any core count.  Work and memory per task are
    O(p·block) — no candidate-pair enumeration, no n ≤ 1e4 limit (the
    reference's per-thread skip sampler: ``cpp/generators/
    ErdosRenyiEnumerator.h``).
    """
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    total = n * (n - 1) // 2
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    if p <= 0.0 or total == 0:
        e = spark.createDataFrame([], "src long, dst long, weight double")
        return EdgeGraph(e, directed=False, weighted=False)
    block = 1 << 22
    nblocks = (total + block - 1) // block

    def gen(it):
        for pdf in it:
            for b in pdf["id"].to_numpy(np.int64):
                lo, hi = int(b) * block, min((int(b) + 1) * block, total)
                if p >= 1.0:
                    t = np.arange(lo, hi, dtype=np.int64)
                else:
                    rng = np.random.Generator(
                        np.random.Philox(key=np.array([seed, b], dtype=np.uint64))
                    )
                    est = int((hi - lo) * p * 1.25) + 32
                    pos, chunks = lo - 1, []
                    while True:
                        g = rng.geometric(p, size=est).astype(np.int64)
                        c = np.cumsum(g) + pos
                        chunks.append(c[c < hi])
                        if len(chunks[-1]) < len(g):
                            break
                        pos = int(c[-1])
                    t = np.concatenate(chunks)
                if not len(t):
                    continue
                # invert the pair index: t = C(u) + (v - u - 1) with
                # C(u) = u·n − u(u+1)/2; float solve + integer correction
                u = (
                    ((2.0 * n - 1.0) - np.sqrt((2.0 * n - 1.0) ** 2 - 8.0 * t)) // 2.0
                ).astype(np.int64)
                for _ in range(3):
                    cu = u * n - u * (u + 1) // 2
                    u = np.where(cu > t, u - 1, u)
                    nxt = (u + 1) * n - (u + 1) * (u + 2) // 2
                    u = np.where(nxt <= t, u + 1, u)
                cu = u * n - u * (u + 1) // 2
                yield pd.DataFrame({"src": u, "dst": u + 1 + (t - cu)})

    e = spark.range(nblocks).mapInPandas(gen, schema).withColumn("weight", F.lit(1.0))
    return EdgeGraph(e, directed=False, weighted=False)


def chung_lu(spark: SparkSession, weights: list[float], seed: int = 42) -> EdgeGraph:
    """Expected-degree (Chung-Lu) model — edge (u,v) kept with
    probability ``min(w_u·w_v/Σw, 1)`` — sampled with the
    Miller–Hagberg skip walk (no pair enumeration).

    Nodes are sorted by weight descending; for each source i the walk
    over j > i skips Geom(q) steps under the current upper bound
    q = min(w_i·w_j₀/Σw, 1) and thins to the exact p_ij by rejection —
    expected work per source is O(E[deg_i] + #bound-updates), so the
    former O(n²) crossJoin limit is gone.  Sources fan out across
    tasks; each task carries the sorted weight vector (the signature
    takes a driver-side list, so n is driver-bounded by construction —
    documented).  Randomness is a per-source counter-based Philox keyed
    (seed, i): identical output at any parallelism.
    """
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    s = float(sum(weights))
    n = len(weights)
    order = sorted(range(n), key=lambda i: (-weights[i], i))
    w_sorted = np.array([float(weights[i]) for i in order])
    ids = np.array(order, dtype=np.int64)
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )

    def gen(it):
        for pdf in it:
            out_s, out_d = [], []
            for i in pdf["id"].to_numpy(np.int64):
                i = int(i)
                rng = np.random.Generator(
                    np.random.Philox(key=np.array([seed, i], dtype=np.uint64))
                )
                j = i + 1
                if j >= n:
                    continue
                p = min(w_sorted[i] * w_sorted[j] / s, 1.0)
                while j < n and p > 0.0:
                    if p < 1.0:
                        r = rng.random()
                        j += int(np.log(max(r, 1e-300)) // np.log(1.0 - p))
                    if j < n:
                        q = min(w_sorted[i] * w_sorted[j] / s, 1.0)
                        if rng.random() < q / p:
                            out_s.append(ids[i])
                            out_d.append(ids[j])
                        p = q
                        j += 1
            yield pd.DataFrame(
                {"src": np.array(out_s, np.int64), "dst": np.array(out_d, np.int64)}
            )

    e = (
        spark.range(n)
        .mapInPandas(gen, schema)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
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


def barabasi_albert(
    spark: SparkSession, n: int, k: int = 4, n0: int | None = None, seed: int = 42
) -> EdgeGraph:
    """Barabási-Albert preferential attachment
    (``cpp/generators/BarabasiAlbertGenerator.h:19``: k edges per new
    node, nMax nodes, n0 seed nodes) via the Batagelj-Brandes linear
    method: the target of attachment edge e is a uniformly sampled slot
    of the edge array built so far — picking an ODD slot (a previous
    target) chains until an even slot (a source, deterministic), which
    realizes degree-proportional sampling without any sequential RNG
    state.  All randomness is splitmix64(seed, e) — vectorized numpy in
    ``mapInPandas``, identical at any parallelism.  Seed graph: circle
    on n0 nodes.  Multi-edges collapse (weighted_dedup='first'),
    matching the reference's simple-graph output."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    n0 = n0 if n0 is not None else k
    assert 1 <= n0 <= n
    M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

    def mix(x: "np.ndarray") -> "np.ndarray":
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & M64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & M64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & M64
        return x ^ (x >> np.uint64(31))

    def pos_of(e: "np.ndarray") -> "np.ndarray":
        # uniform slot in [0, 2e) for attachment edge e (e ≥ n0)
        u = mix(e.astype(np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B1))
        return ((u % np.uint64(1 << 62)).astype(np.float64) / float(1 << 62) * (2 * e)).astype(np.int64)

    def src_of(e: "np.ndarray") -> "np.ndarray":
        return np.where(e < n0, e, n0 + (e - n0) // k)

    def gen(it):
        for pdf in it:
            e = pdf["id"].to_numpy(np.int64)  # attachment edge indices ≥ n0
            v = src_of(e)
            pos = pos_of(e)
            target = np.full(len(e), -1, dtype=np.int64)
            live = np.arange(len(e))
            while len(live):
                p = pos[live]
                i = p // 2
                even = p % 2 == 0
                target[live[even]] = src_of(i[even])
                odd = ~even
                oi = i[odd]
                seed_edge = oi < n0
                tgt_rows = live[odd]
                target[tgt_rows[seed_edge]] = (oi[seed_edge] + 1) % n0
                chase = tgt_rows[~seed_edge]
                pos[chase] = pos_of(oi[~seed_edge])
                live = chase
            yield pd.DataFrame({"src": v, "dst": target})

    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    attach = spark.range(n0, n0 + (n - n0) * k).mapInPandas(gen, schema)
    circle = spark.range(n0).select(
        F.col("id").alias("src"), F.pmod(F.col("id") + 1, F.lit(n0)).alias("dst")
    )
    e = attach.unionByName(circle).where(F.col("src") != F.col("dst")).withColumn(
        "weight", F.lit(1.0)
    )
    return EdgeGraph(canonicalize(e, weighted_dedup="first"), directed=False, weighted=False)


def powerlaw_degree_sequence(
    spark: SparkSession, n: int, gamma: float = 2.5,
    dmin: int = 2, dmax: int | None = None, seed: int = 42,
):
    """(id, deg) — bounded-Pareto inverse-CDF sample of a power-law
    degree sequence (``PowerlawDegreeSequence``, pyx:2591 surface);
    deterministic per (seed, id)."""
    dmax = dmax or max(int(n ** 0.5), dmin + 1)
    u = _uniform(seed, "id")
    a, b, g1 = float(dmin), float(dmax), gamma - 1.0
    inv = (
        F.lit(1.0)
        - u * (1.0 - (a / b) ** g1)
    )
    deg = F.floor(F.lit(a) * F.pow(inv, F.lit(-1.0 / g1))).cast("long")
    return spark.range(n).select("id", F.least(deg, F.lit(int(dmax))).alias("deg"))


def lfr(
    spark: SparkSession,
    n: int,
    tau1: float = 2.5,
    tau2: float = 1.5,
    mu: float = 0.1,
    dmin: int = 4,
    dmax: int | None = None,
    smin: int = 20,
    smax: int = 100,
    seed: int = 42,
):
    """LFR-style community benchmark graph with ground truth
    (``cpp/generators/LFRGenerator.h:23`` surface): power-law degrees
    (exponent tau1), power-law community sizes (tau2), mixing parameter
    mu = expected fraction of a node's edges leaving its community.

    Deterministic Chung-Lu variant: internal edges pair (1-mu)-scaled
    degree weights within each community, external edges pair mu-scaled
    weights across the whole graph — E[deg] matches the drawn sequence
    and E[external fraction] = mu, the two properties the LFR quality
    benchmarks score against.  (The reference rewires a configuration
    model; expected-degree pairing is the order-free analog.)

    Returns ``(EdgeGraph, truth)`` with truth = (node, label).
    Pair enumeration is per-community O(s²) + cross O(n²) with a
    cheap hash filter — benchmark-fixture scale by design.
    """
    import hashlib

    # community sizes: bounded-Pareto, driver-side (#communities rows)
    sizes = []
    total = 0
    i = 0
    g1 = tau2 - 1.0
    while total < n:
        u = int(hashlib.md5(f"{seed}:cs:{i}".encode()).hexdigest()[:12], 16) / float(1 << 48)
        s = int(smin * (1.0 - u * (1.0 - (smin / smax) ** g1)) ** (-1.0 / g1))
        s = min(s, smax, n - total) if n - total >= smin else n - total
        sizes.append(s)
        total += s
        i += 1
    bounds, lo = [], 0
    for c, s in enumerate(sizes):
        bounds.append((c, lo, lo + s))
        lo += s
    comm = spark.createDataFrame(bounds, "label long, lo long, hi long")
    degs = powerlaw_degree_sequence(spark, n, gamma=tau1, dmin=dmin, dmax=dmax, seed=seed)
    nodes = degs.join(
        F.broadcast(comm),
        (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")),
    ).select("id", "deg", "label")
    wint = (F.col("deg") * (1.0 - mu)).alias("wi")
    wext = (F.col("deg") * mu).alias("we")
    nd = nodes.select("id", "label", wint, wext).persist()
    # internal: Chung-Lu within community
    sint = nd.groupBy("label").agg(F.sum("wi").alias("si"))
    a = nd.select(F.col("id").alias("src"), F.col("label"), F.col("wi").alias("wa"))
    b = nd.select(F.col("id").alias("dst"), F.col("label"), F.col("wi").alias("wb"))
    internal = (
        a.join(b, "label")
        .where(F.col("src") < F.col("dst"))
        .join(F.broadcast(sint), "label")
        .where(_uniform(seed + 7, "src", "dst") < F.least(F.col("wa") * F.col("wb") / F.col("si"), F.lit(1.0)))
        .select("src", "dst")
    )
    # external: Chung-Lu across communities
    se = nd.agg(F.sum("we")).collect()[0][0] or 1.0
    ax = nd.select(F.col("id").alias("src"), F.col("label").alias("la"), F.col("we").alias("wa"))
    bx = nd.select(F.col("id").alias("dst"), F.col("label").alias("lb"), F.col("we").alias("wb"))
    external = (
        ax.crossJoin(bx)
        .where((F.col("src") < F.col("dst")) & (F.col("la") != F.col("lb")))
        .where(_uniform(seed + 13, "src", "dst") < F.least(F.col("wa") * F.col("wb") / F.lit(se), F.lit(1.0)))
        .select("src", "dst")
    )
    e = internal.unionByName(external).withColumn("weight", F.lit(1.0))
    truth = nd.select(F.col("id").alias("node"), "label")
    g = EdgeGraph(canonicalize(e, weighted_dedup="first"), directed=False, weighted=False)
    return g, truth


def _hyperbolic_expected_degree(n: float, alpha: float, R: float) -> float:
    """Expected average degree of the T=0 random hyperbolic graph
    (Krioukov et al. 2010 eq. 22 first-order expansion, as used by
    ``cpp/geometric/HyperbolicSpace.h:137-144``)."""
    gamma = 2 * alpha + 1
    xi = (gamma - 1) / (gamma - 2)
    first = math.exp(-R / 2)
    second = math.exp(-alpha * R) * (
        alpha
        * (R / 2)
        * ((math.pi / 4) * (1 / alpha) ** 2 - (math.pi - 1) * (1 / alpha) + (math.pi - 2))
        - 1
    )
    return (2 / math.pi) * xi * xi * n * (first + second)


def _hyperbolic_target_radius(n: int, k: float, alpha: float, eps: float = 0.01) -> float:
    """Disk radius R giving expected average degree ``k`` — bisection on
    the closed-form expectation (``HyperbolicSpace.h:146-165``)."""
    gamma = 2 * alpha + 1
    xi_inv = (gamma - 2) / (gamma - 1)
    v = k * (math.pi / 2) * xi_inv * xi_inv
    if n <= v:
        raise ValueError(
            f"hyperbolic: avg_degree={k} is not achievable for n={n} "
            f"(requires n > {v:.1f}); the bisection bracket would be inverted"
        )
    lo, hi = math.log(n / v), 4 * math.log(n / v)
    r = 2 * math.log(n / v)
    # bounded bisection: the bracket halves each round, so 200 rounds is
    # far past float convergence — hitting it means eps is unreachable
    for _ in range(200):
        if abs(_hyperbolic_expected_degree(n, alpha, r) - k) <= eps:
            return r
        r = (lo + hi) / 2
        if _hyperbolic_expected_degree(n, alpha, r) < k:
            hi = r
        else:
            lo = r
    raise RuntimeError(
        f"hyperbolic: target-radius bisection did not reach eps={eps} "
        f"(n={n}, k={k}, alpha={alpha})"
    )


def hyperbolic(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    exp: float = 3.0,
    seed: int = 42,
    core_radius_frac: float = 0.7,
    brute: bool = False,
) -> EdgeGraph:
    """Random hyperbolic graph, threshold (T=0) model — reference
    ``cpp/generators/HyperbolicGenerator.h:21-46`` (von Looz et al.):
    n points on the hyperbolic disk of radius R, angle ~ U[0, 2π),
    radius ~ α·sinh(αr)/(cosh(αR)−1) with α=(exp−1)/2, an edge wherever
    the hyperbolic distance ≤ R.  Yields power-law degrees with exponent
    ``exp`` and high clustering (README's usage example).

    Distributed shape (the quadtree's role, Spark-first): points with
    r ≤ r_c = ``core_radius_frac``·R form a CORE — exponentially few
    points (E|core| ≈ n·e^{−α(1−frac)R}), broadcast-joined against all
    points.  Outer×outer pairs can only connect within an angular bound
    θ_max(r_c, r_c) = acos((cosh²r_c − cosh R)/sinh²r_c) (finite because
    r_c > R/2), so they join only on same-or-adjacent angular sectors of
    that width: candidate count ∝ Σ per-sector densities, not n².  Both
    candidate sets apply the EXACT distance filter
    cosh r_u·cosh r_v − sinh r_u·sinh r_v·cos Δφ ≤ cosh R, so pruning
    never changes the result (pytest asserts equality with the n²
    brute force).  All randomness is xxhash64(seed, id) — deterministic
    at any parallelism."""
    if exp <= 2:
        raise ValueError("power-law exponent must be > 2")
    alpha = (exp - 1) / 2
    R = _hyperbolic_target_radius(n, avg_degree, alpha)
    two_pi = 2 * math.pi
    cosh_aR = math.cosh(alpha * R)

    pts = spark.range(n).select(
        F.col("id"),
        (_uniform(seed, "id") * two_pi).alias("phi"),
        (F.acosh(1 + _uniform(seed + 1, "id") * (cosh_aR - 1)) / alpha).alias("r"),
    )
    pts = pts.select(
        "id", "phi", F.cosh("r").alias("cr"), F.sinh("r").alias("sr"), F.col("r")
    ).localCheckpoint(eager=True)

    if not core_radius_frac > 0.5:
        raise ValueError(
            f"hyperbolic: core_radius_frac={core_radius_frac} must exceed 0.5 — "
            f"below it the outer-pair angular reach cos term leaves [-1, 1] "
            f"(every outer-outer pair can connect; no sector pruning exists)"
        )
    e = _hyperbolic_edges(pts, R, core_radius_frac * R, brute=brute)
    return EdgeGraph(e, directed=False, weighted=False)


def _hyperbolic_edges(pts: DataFrame, R: float, r_c: float, brute: bool = False) -> DataFrame:
    """(src, dst, weight) — T=0 threshold edges (hyperbolic distance ≤ R)
    over a point table ``(id, phi, cr, sr, r)``, with the core-broadcast +
    outer-sector pruning documented on :func:`hyperbolic`."""
    two_pi = 2 * math.pi
    # angular reach of an outer-outer pair, exact (finite: r_c > R/2)
    w = math.acos(
        max(-1.0, (math.cosh(r_c) ** 2 - math.cosh(R)) / (math.sinh(r_c) ** 2))
    )
    nb = int(two_pi / w) if w > 0 else 0

    def exact_edges(a, b):
        dphi_raw = F.abs(F.col("phi_u") - F.col("phi_v"))
        dphi = F.least(dphi_raw, two_pi - dphi_raw)
        cond = (
            F.col("cr_u") * F.col("cr_v") - F.col("sr_u") * F.col("sr_v") * F.cos(dphi)
        ) <= math.cosh(R)
        return (
            a.join(b, F.col("src") < F.col("dst"))
            .where(cond)
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )

    u_side = pts.select(
        F.col("id").alias("src"), F.col("phi").alias("phi_u"),
        F.col("cr").alias("cr_u"), F.col("sr").alias("sr_u"), F.col("r").alias("r_u"),
    )
    v_side = pts.select(
        F.col("id").alias("dst"), F.col("phi").alias("phi_v"),
        F.col("cr").alias("cr_v"), F.col("sr").alias("sr_v"), F.col("r").alias("r_v"),
    )

    if nb < 4 or brute:
        # disk too small for sector pruning (or pruning disabled for
        # the pruned≡brute equality test) — exact n² filter
        return exact_edges(u_side, v_side)

    core_u = u_side.where(F.col("r_u") <= r_c)
    # core × all: |core| is tiny → broadcast side.  src≠dst (not src<dst:
    # that would drop pairs whose core endpoint has the larger id), then
    # canonicalize; core-core pairs match in both orders → distinct
    dphi_raw_c = F.abs(F.col("phi_u") - F.col("phi_v"))
    dphi_c = F.least(dphi_raw_c, two_pi - dphi_raw_c)
    e_core = (
        F.broadcast(core_u)
        .join(v_side, F.col("src") != F.col("dst"))
        .where(
            (F.col("cr_u") * F.col("cr_v") - F.col("sr_u") * F.col("sr_v") * F.cos(dphi_c))
            <= math.cosh(R)
        )
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .distinct()
    )

    sector = lambda phi: F.floor(phi / F.lit(two_pi / nb)).cast("long")  # noqa: E731
    outer_u = u_side.where(F.col("r_u") > r_c).withColumn("sec", sector(F.col("phi_u")))
    outer_v = v_side.where(F.col("r_v") > r_c).withColumn("sec_v", sector(F.col("phi_v")))
    # each unordered outer pair within reach differs by exactly one
    # offset in {-1, 0, 1} (mod nb) — matched once, no dedup needed
    cand_u = outer_u.withColumn("off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))).withColumn(
        "sec_v", F.pmod(F.col("sec") + F.col("off"), F.lit(nb))
    )
    dphi_raw = F.abs(F.col("phi_u") - F.col("phi_v"))
    dphi = F.least(dphi_raw, two_pi - dphi_raw)
    e_outer = (
        cand_u.join(outer_v, "sec_v")
        .where(F.col("src") < F.col("dst"))
        .where(
            (F.col("cr_u") * F.col("cr_v") - F.col("sr_u") * F.col("sr_v") * F.cos(dphi))
            <= math.cosh(R)
        )
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return e_core.unionByName(e_outer)


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


def dynamic_dorogovtsev_mendes_events(spark, steps: int, seed: int = 42):
    """``DynamicDorogovtsevMendesGenerator`` (``cpp/generators/
    DynamicDorogovtsevMendesGenerator.cpp:16-56``): start from a
    triangle; each TIME_STEP adds one node connected to BOTH endpoints
    of a uniformly chosen existing edge.  Returns the GraphEvent table
    ``(batch, kind, u, v, w)`` the streaming layer consumes
    (``apply_events`` / ``incremental_*``); batch = time step.

    The process is sequential BY DEFINITION (each step samples from the
    realized edge list), but the edge COUNT after step i is the closed
    form 3 + 2i, so the whole stream derives from a deterministic
    hash recurrence — driver-side numpy, metadata-scale: event streams
    are inputs to the distributed Dyn* consumers, not bulk data."""
    import hashlib

    rows = [
        (0, "NODE_ADDITION", 0, None, None),
        (0, "NODE_ADDITION", 1, None, None),
        (0, "NODE_ADDITION", 2, None, None),
        (0, "EDGE_ADDITION", 0, 1, 1.0),
        (0, "EDGE_ADDITION", 1, 2, 1.0),
        (0, "EDGE_ADDITION", 2, 0, 1.0),
        (0, "TIME_STEP", None, None, None),
    ]
    edges = [(0, 1), (1, 2), (2, 0)]
    node = 2
    for i in range(1, steps + 1):
        node += 1
        r = int(hashlib.md5(f"{seed}:dm:{i}".encode()).hexdigest()[:12], 16) % len(edges)
        s, t = edges[r]
        rows.append((i, "NODE_ADDITION", node, None, None))
        rows.append((i, "EDGE_ADDITION", node, s, 1.0))
        rows.append((i, "EDGE_ADDITION", node, t, 1.0))
        rows.append((i, "TIME_STEP", None, None, None))
        edges.append((s, node))
        edges.append((t, node))
    return spark.createDataFrame(
        rows, "batch long, kind string, u long, v long, w double"
    )


def is_sequence_realizable(sequence: list[int]) -> bool:
    """Erdős–Gallai test (``cpp/generators/
    StaticDegreeSequenceGenerator.cpp:25-72``): even sum, every degree
    < n, and for each prefix k: Σ_{i≤k} d_i ≤ k(k−1) + Σ_{i>k}
    min(d_i, k).  Vectorized O(n log n) (the reference's check is the
    same inequality evaluated quadratically)."""
    import numpy as np

    d = np.sort(np.asarray(sequence, dtype=np.int64))[::-1]
    n = len(d)
    if n == 0:
        return True
    if d[0] >= n or d[-1] < 0 or int(d.sum()) % 2 != 0:
        return False
    pref = np.cumsum(d)
    asc = d[::-1]  # ascending view for searchsorted
    asc_pref = np.cumsum(asc)
    for k in range(1, n + 1):
        # tail Σ_{i>k} min(d_i, k): elements ≥ k contribute k each,
        # the rest contribute themselves (tail of the DESC order =
        # prefix of the ASC order)
        tail_len = n - k
        if tail_len:
            cut = np.searchsorted(asc[:tail_len], k, side="left")
            small = int(asc_pref[cut - 1]) if cut else 0
            tail = small + (tail_len - cut) * k
        else:
            tail = 0
        if int(pref[k - 1]) > k * (k - 1) + tail:
            return False
    return True


def havel_hakimi(
    spark: SparkSession, sequence: list[int], ignore_if_realizable: bool = False
) -> EdgeGraph:
    """Havel–Hakimi degree-sequence realizer
    (``cpp/generators/HavelHakimiGenerator.{h,cpp}``): repeatedly
    connect the node of largest remaining deficit to the next-largest
    ones; if the sequence is graphical the realized degrees equal it
    EXACTLY.  ``ignore_if_realizable=True`` mirrors the reference flag:
    generate anyway, some nodes may end short.

    The construction is inherently sequential (the reference's bucket
    walk, ``HavelHakimiGenerator.cpp:22-120``); it runs driver-side
    over a heap in O(m log n) — degree sequences are metadata-scale
    inputs (the realizer pairs with ``powerlaw_degree_sequence``), the
    realized EDGE TABLE is what gets distributed."""
    import heapq

    if not is_sequence_realizable(sequence) and not ignore_if_realizable:
        raise ValueError("degree sequence is not realizable (Erdős–Gallai)")
    heap = [(-int(d), v) for v, d in enumerate(sequence) if d > 0]
    heapq.heapify(heap)
    edges = []
    while heap:
        negd, v = heapq.heappop(heap)
        deficit = -negd
        taken = []
        while deficit and heap:
            nd, u = heapq.heappop(heap)
            edges.append((v, u) if v < u else (u, v))
            deficit -= 1
            if nd + 1 < 0:
                taken.append((nd + 1, u))
        for item in taken:
            heapq.heappush(heap, item)
        # deficit > 0 here ⇒ not realizable; reachable only with the flag
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] or [], "src long, dst long, weight double"
    )
    return EdgeGraph(e, directed=False, weighted=False)


def regular_ring_lattice(spark: SparkSession, n: int, k: int) -> EdgeGraph:
    """Ring lattice: node i → (i+j) mod n for j = 1..k
    (``cpp/generators/RegularRingLatticeGenerator.cpp:12-29``, incl.
    the reference's clamp k ← n/2 − 1 when k would wrap)."""
    if k >= n // 2 - 1 and n >= 4:
        k = n // 2 - 1
    k = max(k, 0)
    ring = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("off"),
        )
        .select("src", F.pmod(F.col("src") + F.col("off"), F.lit(n)).alias("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    return EdgeGraph(
        canonicalize(ring, weighted_dedup="first"), directed=False, weighted=False
    )


def mocnik_points(spark: SparkSession, dim: int, n: int, seed: int = 42):
    """The Mocnik model's node positions: n points uniform in the ball
    B_{.5}(.5,…,.5) ⊂ [0,1)^dim, rejection-sampled from splitmix64
    (seed, id, trial, coord) — deterministic at any parallelism.
    Public so tests can oracle-check the edge rule on the SAME points.
    Columns: (id, x0 … x{dim-1})."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    pos_schema = T.StructType(
        [T.StructField("id", T.LongType())]
        + [T.StructField(f"x{j}", T.DoubleType()) for j in range(dim)]
    )

    def gen_points(it):
        M = np.uint64(0xFFFFFFFFFFFFFFFF)

        def mix(x):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & M
            x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & M
            x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & M
            return x ^ (x >> np.uint64(31))

        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            out = np.empty((len(ids), dim))
            done = np.zeros(len(ids), dtype=bool)
            for t in range(64):
                key = mix(
                    ids.astype(np.uint64)
                    + np.uint64(seed) * np.uint64(0x9E3779B1)
                    + np.uint64(t) * np.uint64(0xC2B2AE35)
                )
                c = np.empty((len(ids), dim))
                for j in range(dim):
                    key = mix(key + np.uint64(j + 1))
                    c[:, j] = (key >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                inside = ((c - 0.5) ** 2).sum(axis=1) < 0.25
                take = inside & ~done
                out[take] = c[take]
                done |= inside
                if done.all():
                    break
            # P(all 64 trials outside) < 1e-8 even at dim 4; fall back
            # to the ball center for the (never-seen) residue
            out[~done] = 0.5
            yield pd.DataFrame(
                {"id": ids, **{f"x{j}": out[:, j] for j in range(dim)}}
            )

    return spark.range(n).mapInPandas(gen_points, pos_schema)


def mocnik(
    spark: SparkSession, dim: int, n: int, k: float, seed: int = 42
) -> EdgeGraph:
    """Mocnik spatial-network model (``cpp/generators/
    MocnikGeneratorBasic.cpp:42-93``): n uniform points in the ball
    B_{.5}(.5,…,.5) ⊂ [0,1)^dim; DIRECTED edge i→j iff
    dist(i,j) ≤ k·distMin(i), distMin(i) = min_j dist(i,j).

    Spark shape (the improved ``MocnikGenerator``'s grid, not the
    basic O(n²) scan): points land in grid cells; nearest-neighbor
    distances come from a 3^dim cell-neighborhood self-join with the
    cell size DOUBLING for still-unresolved nodes (a found neighbor at
    distance ≤ cell side is provably the global minimum), then the
    edge pass re-joins at cell size max(k·distMin) and filters by each
    node's own radius.  Positions are rejection-sampled from
    xxhash64(seed, id, trial, coord) — deterministic at any
    parallelism."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    assert dim > 0 and n > 0 and k > 1

    pts = mocnik_points(spark, dim, n, seed).persist()
    xcols = [f"x{j}" for j in range(dim)]

    def cell_join(points, targets, cell: float):
        """targets ⋈ points over the 3^dim cell neighborhood of each
        target, with pairwise distance attached (self rows excluded)."""
        offs = spark.range(3 ** dim).select(
            *[
                (F.floor(F.col("id") / (3 ** j)) % 3 - 1).alias(f"o{j}")
                for j in range(dim)
            ]
        )
        t = targets.select(
            F.col("id").alias("i"),
            *[F.col(c).alias(f"t{c}") for c in xcols],
            *[F.floor(F.col(c) / cell).alias(f"tc{j}") for j, c in enumerate(xcols)],
        ).crossJoin(F.broadcast(offs))
        p = points.select(
            F.col("id").alias("j"),
            *xcols,
            *[F.floor(F.col(c) / cell).alias(f"pc{j}") for j, c in enumerate(xcols)],
        )
        cond = [t[f"tc{j}"] + t[f"o{j}"] == p[f"pc{j}"] for j in range(dim)]
        d2 = sum(
            (F.col(f"t{c}") - F.col(c)) * (F.col(f"t{c}") - F.col(c)) for c in xcols
        )
        return (
            t.join(p, cond)
            .where(F.col("i") != F.col("j"))
            .select("i", "j", F.sqrt(d2).alias("dist"))
        )

    # phase 1: nearest-neighbor distance, cell size doubling until found
    cell = (1.0 / n) ** (1.0 / dim)
    unresolved = pts
    dmin_parts = []
    for _ in range(64):
        found = (
            cell_join(pts, unresolved, cell)
            .groupBy("i")
            .agg(F.min("dist").alias("dmin"))
        )
        ok = found.where(F.col("dmin") <= cell).persist()
        dmin_parts.append(ok)
        unresolved = unresolved.join(
            ok.select(F.col("i").alias("id")), "id", "left_anti"
        ).persist()
        if unresolved.isEmpty():
            break
        cell *= 2.0
    from functools import reduce

    dmin = reduce(lambda a, b: a.unionByName(b), dmin_parts)

    # phase 2: edges within each node's own radius k·dmin
    radii = pts.join(dmin.withColumnRenamed("i", "id"), "id").select(
        "id", *xcols, (F.lit(float(k)) * F.col("dmin")).alias("reach")
    )
    gcell = radii.agg(F.max("reach")).collect()[0][0]
    e = (
        cell_join(pts, radii.select("id", *xcols), gcell)
        .join(radii.select(F.col("id").alias("i"), "reach"), "i")
        .where(F.col("dist") <= F.col("reach"))
        .select(F.col("i").alias("src"), F.col("j").alias("dst"), F.lit(1.0).alias("weight"))
    )
    return EdgeGraph(e, directed=True, weighted=False)


def stochastic_blockmodel(
    spark: SparkSession,
    membership,
    affinity: list[list[float]],
    seed: int = 42,
) -> EdgeGraph:
    """``StochasticBlockmodel`` (``cpp/generators/StochasticBlockmodel.cpp``):
    undirected G where pair (u,v) is an edge with probability
    ``affinity[block(u)][block(v)]``.  ``membership`` is a (node, block)
    DataFrame or a list (node i → block).  ``affinity`` must be symmetric
    (the reference scans pairs in id order, so an asymmetric matrix would
    make the draw depend on node numbering).

    Spark shape: every block pair (a ≤ b) is an independent Bernoulli
    index space — |A|·|B| cross pairs or C(|A|,2) diagonal pairs — cut
    into fixed chunks and sampled with the same counter-based
    Philox-geometric skips as :func:`erdos_renyi` (work ∝ expected
    edges, identical at any parallelism); sampled in-block ranks join
    back to node ids through the per-block rank table."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T
    from pyspark.sql.window import Window

    k = len(affinity)
    for a in range(k):
        if len(affinity[a]) != k:
            raise ValueError("affinity matrix must be nBlocks x nBlocks")
        for b in range(a + 1, k):
            if affinity[a][b] != affinity[b][a]:
                raise ValueError("affinity matrix must be symmetric")
    if not isinstance(membership, DataFrame):
        membership = spark.createDataFrame(
            [(i, int(b)) for i, b in enumerate(membership)], "node long, block int"
        )
    w = Window.partitionBy("block").orderBy("node")
    ranked = membership.select(
        "node", "block", (F.row_number().over(w) - 1).alias("rank")
    ).localCheckpoint(eager=True)
    sizes = {
        int(r["block"]): int(r["n"])
        for r in ranked.groupBy("block").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    chunk = 1 << 22
    tasks = []  # (a, b, chunk_id, lo, hi, p)
    for a in sorted(sizes):
        for b in sorted(sizes):
            if b < a:
                continue
            p = float(affinity[a][b])
            if p <= 0.0:
                continue
            sa, sb = sizes[a], sizes[b]
            total = sa * (sa - 1) // 2 if a == b else sa * sb
            for c in range(0, (total + chunk - 1) // chunk):
                tasks.append((a, b, c, c * chunk, min((c + 1) * chunk, total), p))
    if not tasks:
        e = spark.createDataFrame([], "src long, dst long, weight double")
        return EdgeGraph(e, directed=False, weighted=False)
    task_df = spark.createDataFrame(
        tasks, "a int, b int, c long, lo long, hi long, p double"
    ).repartition(min(len(tasks), 64))
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("ia", T.LongType()),
            T.StructField("ib", T.LongType()),
        ]
    )
    szs = dict(sizes)

    def gen(it):
        for pdf in it:
            for a, b, c, lo, hi, p in zip(
                pdf["a"], pdf["b"], pdf["c"], pdf["lo"], pdf["hi"], pdf["p"]
            ):
                a, b, lo, hi, p = int(a), int(b), int(lo), int(hi), float(p)
                if p >= 1.0:
                    t = np.arange(lo, hi, dtype=np.int64)
                else:
                    rng = np.random.Generator(
                        np.random.Philox(
                            key=np.array(
                                [seed, (a << 40) | (b << 20) | int(c)], dtype=np.uint64
                            )
                        )
                    )
                    est = int((hi - lo) * p * 1.25) + 32
                    pos, chunks = lo - 1, []
                    while True:
                        g = rng.geometric(p, size=est).astype(np.int64)
                        cum = np.cumsum(g) + pos
                        chunks.append(cum[cum < hi])
                        if len(chunks[-1]) < len(g):
                            break
                        pos = int(cum[-1])
                    t = np.concatenate(chunks)
                if not len(t):
                    continue
                if a == b:
                    n = szs[a]
                    u = (
                        ((2.0 * n - 1.0) - np.sqrt((2.0 * n - 1.0) ** 2 - 8.0 * t))
                        // 2.0
                    ).astype(np.int64)
                    for _ in range(3):
                        cu = u * n - u * (u + 1) // 2
                        u = np.where(cu > t, u - 1, u)
                        nxt = (u + 1) * n - (u + 1) * (u + 2) // 2
                        u = np.where(nxt <= t, u + 1, u)
                    cu = u * n - u * (u + 1) // 2
                    yield pd.DataFrame(
                        {"a": a, "b": b, "ia": u, "ib": u + 1 + (t - cu)}
                    )
                else:
                    sb = szs[b]
                    yield pd.DataFrame(
                        {"a": a, "b": b, "ia": t // sb, "ib": t % sb}
                    )

    sampled = task_df.mapInPandas(gen, schema)
    ra = ranked.select(
        F.col("block").alias("a"), F.col("rank").alias("ia"), F.col("node").alias("u")
    )
    rb = ranked.select(
        F.col("block").alias("b"), F.col("rank").alias("ib"), F.col("node").alias("v")
    )
    e = (
        sampled.join(ra, ["a", "ia"])
        .join(rb, ["b", "ib"])
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    return EdgeGraph(e, directed=False, weighted=False)


def clustered_random_graph(
    spark: SparkSession, n: int, k: int, pin: float, pout: float, seed: int = 42
):
    """``ClusteredRandomGraphGenerator``
    (``cpp/generators/ClusteredRandomGraphGenerator.cpp``): each node
    joins a uniform cluster of k; in-cluster pairs connect with ``pin``,
    cross-cluster with ``pout``.  Returns ``(graph, communities)`` with
    communities as a (node, label) DataFrame (the reference's
    ``getCommunities``).  Cluster draws are seeded-hash uniform; edge
    sampling rides :func:`stochastic_blockmodel`'s skip sampler."""
    if pin < pout:
        raise ValueError("pin must be >= pout")
    membership = spark.range(n).select(
        F.col("id").alias("node"),
        (F.abs(F.xxhash64("id", F.lit(seed))) % k).cast("int").alias("block"),
    ).localCheckpoint(eager=True)
    affinity = [
        [pin if a == b else pout for b in range(k)] for a in range(k)
    ]
    g = stochastic_blockmodel(spark, membership, affinity, seed=seed + 1)
    return g, membership.select("node", F.col("block").cast("long").alias("label"))


def dynamic_path_events(spark: SparkSession, steps: int) -> DataFrame:
    """``DynamicPathGenerator`` (``cpp/generators/DynamicPathGenerator.cpp``):
    one node per step, chained to the previous — the simplest GraphEvent
    stream.  Deterministic, derived distributed from ``spark.range``."""
    first = spark.createDataFrame(
        [(0, "NODE_ADDITION", 0, None, None)],
        "batch long, kind string, u long, v long, w double",
    )
    steps_df = spark.range(1, steps + 1)
    nodes = steps_df.select(
        F.col("id").alias("batch"),
        F.lit("NODE_ADDITION").alias("kind"),
        F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    edges = steps_df.select(
        F.col("id").alias("batch"),
        F.lit("EDGE_ADDITION").alias("kind"),
        (F.col("id") - 1).alias("u"),
        F.col("id").alias("v"),
        F.lit(1.0).alias("w"),
    )
    ticks = steps_df.select(
        F.col("id").alias("batch"),
        F.lit("TIME_STEP").alias("kind"),
        F.lit(None).cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    return first.unionByName(nodes).unionByName(edges).unionByName(ticks)


def dynamic_barabasi_albert_events(
    spark: SparkSession, k: int, steps: int, seed: int = 42
) -> DataFrame:
    """``DynamicBarabasiAlbertGenerator``
    (``cpp/generators/DynamicBarabasiAlbertGenerator.cpp``): seed path of
    k nodes, then one node per TIME_STEP with k distinct
    degree-proportional targets (the reference's cumulative-degree scan,
    including its ``rand <= deg`` inclusive quirk).  Growth is sequential
    by definition — driver-side with a seeded RNG, metadata-scale (event
    streams feed the distributed Dyn* consumers; the BULK generator is
    :func:`barabasi_albert`)."""
    import random as _random

    if k <= 0:
        raise ValueError("k must be at least 1")
    rng = _random.Random(seed)
    rows = []
    deg: list[int] = []
    for i in range(k):
        rows.append((0, "NODE_ADDITION", i, None, None))
        deg.append(0)
        if i > 0:
            rows.append((0, "EDGE_ADDITION", i - 1, i, 1.0))
            deg[i - 1] += 1
            deg[i] += 1
    rows.append((0, "TIME_STEP", None, None, None))
    deg_sum = sum(deg)
    for step in range(1, steps + 1):
        u = len(deg)
        deg.append(0)
        rows.append((step, "NODE_ADDITION", u, None, None))
        targets: set[int] = set()
        while len(targets) < k:
            r = rng.randint(0, deg_sum)
            for v in range(u):
                if r <= deg[v]:
                    targets.add(v)
                    break
                r -= deg[v]
        for v in sorted(targets):
            rows.append((step, "EDGE_ADDITION", u, v, 1.0))
            deg[u] += 1
            deg[v] += 1
            deg_sum += 2
        rows.append((step, "TIME_STEP", None, None, None))
    return spark.createDataFrame(
        rows, "batch long, kind string, u long, v long, w double"
    )


def dynamic_forest_fire_events(
    spark: SparkSession,
    p: float,
    steps: int,
    directed: bool = False,
    r: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """``DynamicForestFireGenerator``
    (``cpp/generators/DynamicForestFireGenerator.cpp``): each step picks
    a uniform ambassador and burns BFS-style — at every burned node,
    neighbors are added one at a time while a Uniform(0,1) draw stays
    ≤ p (≤ p·r along in-edges when directed) — and the new node links to
    every burned node.  Sequential by definition ⇒ driver-side seeded
    RNG, metadata-scale."""
    import random as _random

    rng = _random.Random(seed)
    rows = [(0, "NODE_ADDITION", 0, None, None), (0, "TIME_STEP", None, None, None)]
    out: list[list[int]] = [[]]
    inn: list[list[int]] = [[]]
    for step in range(1, steps + 1):
        a = rng.randrange(len(out))
        v = len(out)
        out.append([])
        inn.append([])
        rows.append((step, "NODE_ADDITION", v, None, None))
        visited = {a}
        queue = [a]
        burned = [a]
        qi = 0
        while qi < len(queue):
            wn = queue[qi]
            qi += 1
            picked: set[int] = set()
            for nbrs, prob in (
                ((out[wn], p),) if not directed else ((out[wn], p), (inn[wn], p * r))
            ):
                valid = [x for x in nbrs if x not in visited]
                while True:
                    q = rng.random()
                    if q > prob or not valid:
                        break
                    idx = rng.randrange(len(valid))
                    picked.add(valid[idx])
                    valid[idx] = valid[-1]
                    valid.pop()
            for x in sorted(picked):
                if x not in visited:
                    queue.append(x)
                    burned.append(x)
                    visited.add(x)
        for wn in burned:
            rows.append((step, "EDGE_ADDITION", v, wn, 1.0))
            out[v].append(wn)
            inn[wn].append(v)
            if not directed:
                out[wn].append(v)
                inn[v].append(wn)
        rows.append((step, "TIME_STEP", None, None, None))
    return spark.createDataFrame(
        rows, "batch long, kind string, u long, v long, w double"
    )


def pub_web(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neighborhood_radius: float = 0.1,
    max_neighbors: int = 4,
    seed: int = 42,
) -> tuple[EdgeGraph, DataFrame]:
    """``PubWebGenerator`` (``cpp/generators/PubWebGenerator.cpp``):
    geometric unit-TORUS graph — k dense circular areas (radius from the
    reference's anti-quadratic draw, populated ∝ rad^1.5 with
    Σ = n·k/(k+2), polar-uniform placement), the rest uniform; an edge
    joins u,v iff each lists the other among its ``max_neighbors``
    nearest in-range neighbors (the reference's eligible-then-insert
    scan = MUTUAL top-k, which is order-free), weighted 0.01/dist.

    Returns ``(graph, coords)`` with coords = (node, x, y).

    Spark shape: placement is per-node seeded-hash math (no sequential
    state); the reference's O(n²) scan (its own TODO points at spatial
    partitioning) becomes a torus-wrapped grid-cell 3×3 join — cell edge
    = the neighborhood radius, so every in-range pair is found and the
    shuffle is linear in n; top-k per node is a bounded window over
    in-range candidates only."""
    from pyspark.sql.window import Window
    import random as _random

    rng = _random.Random(seed)
    # driver-side metadata: area centers/radii/populations (k values)
    F_ = 5.0  # MIN_MAX_DENSE_AREA_FACTOR
    areas = []
    for _ in range(num_dense_areas):
        f = rng.random() * F_ + 1.0
        areas.append({"rad": 0.2 * f * f / (F_ * F_)})
    scale = sum(a["rad"] ** 1.5 for a in areas)
    dense_total = 0
    for a in areas:
        a["x"], a["y"] = rng.random(), rng.random()
        a["num"] = (
            round(n * (num_dense_areas / (num_dense_areas + 2.0)) * a["rad"] ** 1.5 / scale)
            if scale > 0
            else 0
        )
    # node id → area via cumulative offsets (broadcast-sized list)
    offs, acc2 = [], 0
    for i, a in enumerate(areas):
        offs.append((acc2, acc2 + a["num"], i, a["x"], a["y"], a["rad"]))
        acc2 += a["num"]
    area_df = spark.createDataFrame(
        [(lo, hi, i, x, y, r) for lo, hi, i, x, y, r in offs],
        "lo long, hi long, area int, ax double, ay double, rad double",
    )
    nodes = spark.range(n).select(F.col("id").alias("node"))
    placed = nodes.join(
        F.broadcast(area_df),
        (F.col("node") >= F.col("lo")) & (F.col("node") < F.col("hi")),
        "left",
    )
    u1 = (F.abs(F.xxhash64("node", F.lit(seed + 1))) % 1_000_000_007) / 1_000_000_007.0
    u2 = (F.abs(F.xxhash64("node", F.lit(seed + 2))) % 1_000_000_007) / 1_000_000_007.0
    angle = u1 * 2.0 * math.pi
    dist = u2 * F.col("rad")
    x_raw = F.when(
        F.col("area").isNotNull(), F.col("ax") + F.cos(angle) * dist
    ).otherwise(u1)
    y_raw = F.when(
        F.col("area").isNotNull(), F.col("ay") + F.sin(angle) * dist
    ).otherwise(u2)
    # moveNodeIntoUnitSquare: single torus wrap
    wrap = lambda z: F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)
    coords = placed.select(
        "node", wrap(x_raw).alias("x"), wrap(y_raw).alias("y")
    ).localCheckpoint(eager=True)

    mutual = _mutual_topk_pairs(coords, float(neighborhood_radius), max_neighbors)
    e = mutual.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        (0.01 / F.sqrt("sqd")).alias("weight"),
    )
    return EdgeGraph(e, directed=False, weighted=True), coords


def _mutual_topk_pairs(coords: DataFrame, r: float, max_neighbors: int) -> DataFrame:
    """(u, v, sqd) with u < v — pairs within torus radius ``r`` that are
    in EACH OTHER's ``max_neighbors``-nearest lists (the PubWeb
    eligible-twice rule).  Torus-wrapped grid-cell 3×3 join — linear
    shuffle, no O(n²) scan."""
    from pyspark.sql.window import Window

    spark = coords.sparkSession
    ncells = max(int(1.0 / r), 1)
    cell = 1.0 / ncells  # cell edge >= r, torus-aligned
    cells = coords.select(
        "node", "x", "y",
        F.least(F.floor(F.col("x") / cell).cast("int"), F.lit(ncells - 1)).alias("cx"),
        F.least(F.floor(F.col("y") / cell).cast("int"), F.lit(ncells - 1)).alias("cy"),
    )
    offs_df = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    probe = cells.crossJoin(F.broadcast(offs_df)).select(
        F.col("node").alias("u"), F.col("x").alias("xu"), F.col("y").alias("yu"),
        ((F.col("cx") + F.col("dx") + ncells) % ncells).alias("cx"),
        ((F.col("cy") + F.col("dy") + ncells) % ncells).alias("cy"),
    )
    other = cells.select(
        F.col("node").alias("v"), F.col("x").alias("xv"), F.col("y").alias("yv"),
        "cx", "cy",
    )
    tor = lambda d: F.when(d > 0.5, 1.0 - d).otherwise(d)
    dx = tor(F.abs(F.col("xu") - F.col("xv")))
    dy = tor(F.abs(F.col("yu") - F.col("yv")))
    pairs = (
        probe.join(other, ["cx", "cy"])
        .where(F.col("u") != F.col("v"))
        .select("u", "v", (dx * dx + dy * dy).alias("sqd"))
        .where(F.col("sqd") <= r * r)
        # 3x3 probe on a small torus can see the same v through two cell
        # aliases — dedup before ranking
        .groupBy("u", "v")
        .agg(F.min("sqd").alias("sqd"))
    )
    w = Window.partitionBy("u").orderBy("sqd", "v")
    topk = pairs.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= max_neighbors
    )
    a_side = topk.select("u", "v", "sqd")
    b_side = topk.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return a_side.join(b_side, ["u", "v"]).where(F.col("u") < F.col("v"))


def dynamic_pub_web_events(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neighborhood_radius: float = 0.1,
    max_neighbors: int = 4,
    steps: int = 5,
    seed: int = 42,
    write_initial: bool = True,
) -> DataFrame:
    """``DynamicPubWebGenerator``
    (``cpp/generators/DynamicPubWebGenerator.cpp``): start from a PubWeb
    graph; each TIME_STEP deletes 5% of the nodes (with their incident
    edges), inserts 5% new ones (cluster-or-noise placement), recomputes
    the mutual-top-k neighborhood, and emits EDGE_REMOVAL / EDGE_ADDITION
    for the structural diff plus EDGE_WEIGHT_UPDATE (0.01/d², the
    reference's dynamic weight) for every surviving edge.

    Returns the GraphEvent table ``(batch, kind, u, v, w)``.

    Spark shape: every step is a bounded set of joins — TakeOrdered picks
    the deletions (deviation: the reference draws uniformly with
    retries), the neighborhood recompute reuses the grid join, the diff
    is two anti-joins.  Driver state is one row count per step."""
    import random as _random

    area_rng = _random.Random(seed)  # same draw sequence as pub_web's areas
    F_ = 5.0
    areas = []
    for _ in range(num_dense_areas):
        f = area_rng.random() * F_ + 1.0
        areas.append({"rad": 0.2 * f * f / (F_ * F_)})
    for a in areas:
        a["x"], a["y"] = area_rng.random(), area_rng.random()
    area_meta = spark.createDataFrame(
        [(i, a["x"], a["y"], a["rad"]) for i, a in enumerate(areas)],
        "area int, ax double, ay double, rad double",
    )
    g0, coords = pub_web(
        spark, n, num_dense_areas, neighborhood_radius, max_neighbors, seed=seed
    )
    edges = g0.edges.select("src", "dst").localCheckpoint(eager=True)
    coords = coords.localCheckpoint(eager=True)
    ev_schema = "batch long, kind string, u long, v long, w double"
    streams = []
    if write_initial:
        streams.append(
            coords.select(
                F.lit(0).alias("batch"), F.lit("NODE_ADDITION").alias("kind"),
                F.col("node").alias("u"), F.lit(None).cast("long").alias("v"),
                F.lit(None).cast("double").alias("w"),
            )
        )
        streams.append(
            g0.edges.select(
                F.lit(0).alias("batch"), F.lit("EDGE_ADDITION").alias("kind"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.col("weight").alias("w"),
            )
        )
        streams.append(
            spark.createDataFrame([(0, "TIME_STEP", None, None, None)], ev_schema)
        )
    next_id = n
    r = float(neighborhood_radius)
    for step in range(1, steps + 1):
        cur_n = coords.count()
        n_del = int(cur_n * 0.05)
        n_ins = int(cur_n * 0.05)
        batch = F.lit(step).alias("batch")
        doomed = (
            coords.select("node")
            .orderBy(F.xxhash64("node", F.lit(seed + 7 * step)), "node")
            .limit(n_del)
            .localCheckpoint(eager=True)
        )
        dead_edges = edges.join(
            doomed.withColumnRenamed("node", "src"), "src", "leftsemi"
        ).unionByName(
            edges.join(doomed.withColumnRenamed("node", "dst"), "dst", "leftsemi")
            .select("src", "dst")
        ).distinct()
        streams.append(dead_edges.select(
            batch, F.lit("EDGE_REMOVAL").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(None).cast("double").alias("w"),
        ))
        streams.append(doomed.select(
            batch, F.lit("NODE_REMOVAL").alias("kind"),
            F.col("node").alias("u"), F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("double").alias("w"),
        ))
        coords = coords.join(doomed, "node", "left_anti")
        edges = edges.join(dead_edges, ["src", "dst"], "left_anti")
        # insertions: cluster draw over k+1 slots (k areas + noise)
        newbies = spark.range(next_id, next_id + n_ins).select(F.col("id").alias("node"))
        next_id += n_ins
        slot = (F.abs(F.xxhash64("node", F.lit(seed + 11 * step))) % (num_dense_areas + 1)).cast("int")
        u1 = (F.abs(F.xxhash64("node", F.lit(seed + 13 * step))) % 1_000_000_007) / 1_000_000_007.0
        u2 = (F.abs(F.xxhash64("node", F.lit(seed + 17 * step))) % 1_000_000_007) / 1_000_000_007.0
        placed = newbies.withColumn("area", slot).join(F.broadcast(area_meta), "area", "left")
        angle = u1 * 2.0 * math.pi
        dist = u2 * F.col("rad")
        wrap = lambda z: F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)
        x_raw = F.when(F.col("ax").isNotNull(), F.col("ax") + F.cos(angle) * dist).otherwise(u1)
        y_raw = F.when(F.col("ay").isNotNull(), F.col("ay") + F.sin(angle) * dist).otherwise(u2)
        new_coords = placed.select("node", wrap(x_raw).alias("x"), wrap(y_raw).alias("y"))
        streams.append(new_coords.select(
            batch, F.lit("NODE_ADDITION").alias("kind"),
            F.col("node").alias("u"), F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("double").alias("w"),
        ))
        # truncate_lineage: chained localCheckpoints degrade past ~10
        # iterations (graph.truncate_lineage docstring)
        coords = truncate_lineage(coords.unionByName(new_coords), step, every=4)
        # recompute neighborhood and diff
        mutual = _mutual_topk_pairs(coords, r, max_neighbors).localCheckpoint(eager=True)
        new_edges = mutual.select(F.col("u").alias("src"), F.col("v").alias("dst"), "sqd")
        gone = edges.join(new_edges.select("src", "dst"), ["src", "dst"], "left_anti")
        kept = new_edges.join(edges, ["src", "dst"], "leftsemi")
        born = new_edges.join(edges, ["src", "dst"], "left_anti")
        streams.append(gone.select(
            batch, F.lit("EDGE_REMOVAL").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(None).cast("double").alias("w"),
        ))
        streams.append(kept.select(
            batch, F.lit("EDGE_WEIGHT_UPDATE").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            (0.01 / F.col("sqd")).alias("w"),
        ))
        streams.append(born.select(
            batch, F.lit("EDGE_ADDITION").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            (0.01 / F.col("sqd")).alias("w"),
        ))
        streams.append(
            spark.createDataFrame([(step, "TIME_STEP", None, None, None)], ev_schema)
        )
        edges = truncate_lineage(new_edges.select("src", "dst"), step, every=4)
    out = streams[0]
    for s_ in streams[1:]:
        out = out.unionByName(s_)
    return out


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    exp: float = 3.0,
    move_each_step: float = 0.2,
    move_distance: float = 0.05,
    steps: int = 5,
    seed: int = 42,
    core_radius_frac: float = 0.7,
) -> tuple[EdgeGraph, DataFrame]:
    """``DynamicHyperbolicGenerator`` (T = 0 threshold model;
    ``cpp/generators/DynamicHyperbolicGenerator.cpp``): points live on
    the hyperbolic disk; each TIME_STEP every node moves with probability
    ``move_each_step`` — radial motion adds its per-node drift to
    cosh(α·r) (bouncing off the rim, crossing the center with a π flip,
    sign persisting across bounces, ``moveNode``:167-211) and angular
    motion adds drift/r — and the edge set (distance ≤ R) is re-derived,
    emitting EDGE_REMOVAL / EDGE_ADDITION diffs.

    Returns ``(initial graph, GraphEvent table)`` — the reference exposes
    the start state via ``getGraph()`` and streams only the diffs.

    Spark shape: movement is one closed-form SQL projection over the
    point table (no driver loop over nodes); each step's edges reuse the
    static generator's core-broadcast + sector-pruned kernel; the diff is
    two anti-joins.  Per-node drift vectors are seeded-hash uniforms, the
    wiggle draw re-keys per step — deterministic at any parallelism."""
    if exp <= 2:
        raise ValueError("power-law exponent must be > 2")
    alpha = (exp - 1) / 2
    R = _hyperbolic_target_radius(n, avg_degree, alpha)
    two_pi = 2 * math.pi
    cosh_aR = math.cosh(alpha * R)
    r_c = core_radius_frac * R
    scale = 10
    pts = spark.range(n).select(
        F.col("id"),
        (_uniform(seed, "id") * two_pi).alias("phi"),
        (F.acosh(1 + _uniform(seed + 1, "id") * (cosh_aR - 1)) / alpha).alias("r"),
        ((_uniform(seed + 2, "id") * 2 - 1) * move_distance).alias("am"),
        ((_uniform(seed + 3, "id") * 2 - 1) * scale * move_distance).alias("rm"),
    )
    state = pts.select(
        "id", "phi", "r", "am", "rm",
        F.cosh("r").alias("cr"), F.sinh("r").alias("sr"),
    ).localCheckpoint(eager=True)
    edges = _hyperbolic_edges(state, R, r_c).select("src", "dst").localCheckpoint(eager=True)
    g0 = EdgeGraph(
        edges.select("src", "dst", F.lit(1.0).alias("weight")),
        directed=False, weighted=False,
    )
    ev_schema = "batch long, kind string, u long, v long, w double"
    streams = []
    eps = 1e-12
    for step in range(1, steps + 1):
        batch = F.lit(step).alias("batch")
        wiggle = _uniform(seed + 100 + step, "id") < move_each_step
        currcdf = F.cosh(alpha * F.col("r"))
        newcosh0 = currcdf + alpha * F.col("rm")
        # bounce off the rim / cross the center (sign flip persists)
        hi = F.lit(float(cosh_aR))
        over = newcosh0 > hi
        under = newcosh0 < 1.0
        newcosh = (
            F.when(over, newcosh0 - 2 * (newcosh0 - hi))
            .when(under, newcosh0 + 2 * (1.0 - newcosh0))
            .otherwise(newcosh0)
        )
        new_rm = F.when(over | under, -F.col("rm")).otherwise(F.col("rm"))
        flip_phi = F.when(
            under,
            F.when(F.col("phi") > math.pi, F.col("phi") - math.pi).otherwise(F.col("phi") + math.pi),
        ).otherwise(F.col("phi"))
        new_r = F.least(F.acosh(F.greatest(newcosh, F.lit(1.0))) / alpha, F.lit(R - eps))
        new_phi0 = flip_phi + F.col("am") / new_r
        new_phi = F.pmod(new_phi0, F.lit(two_pi))
        state = state.select(
            "id",
            F.when(wiggle, new_phi).otherwise(F.col("phi")).alias("phi"),
            F.when(wiggle, new_r).otherwise(F.col("r")).alias("r"),
            "am",
            F.when(wiggle, new_rm).otherwise(F.col("rm")).alias("rm"),
        ).select(
            "id", "phi", "r", "am", "rm",
            F.cosh("r").alias("cr"), F.sinh("r").alias("sr"),
        )
        state = truncate_lineage(state, step, every=4)
        new_edges = truncate_lineage(
            _hyperbolic_edges(state, R, r_c).select("src", "dst"), step, every=4
        )
        gone = edges.join(new_edges, ["src", "dst"], "left_anti")
        born = new_edges.join(edges, ["src", "dst"], "left_anti")
        streams.append(gone.select(
            batch, F.lit("EDGE_REMOVAL").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(None).cast("double").alias("w"),
        ))
        streams.append(born.select(
            batch, F.lit("EDGE_ADDITION").alias("kind"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(1.0).alias("w"),
        ))
        streams.append(
            spark.createDataFrame([(step, "TIME_STEP", None, None, None)], ev_schema)
        )
        edges = new_edges
    out = streams[0]
    for s_ in streams[1:]:
        out = out.unionByName(s_)
    return g0, out
