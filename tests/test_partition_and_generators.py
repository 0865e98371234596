"""Partition similarity, generators, ANF tests."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.anf import (
    effective_diameter_approx,
    neighborhood_function_approx,
)
from networkit_spark.operators.generators import (
    chung_lu,
    erdos_renyi,
    rmat,
    watts_strogatz,
)
from networkit_spark.operators.partition_similarity import (
    adjusted_rand,
    jaccard_measure,
    nmi,
    rand_index,
)

from .conftest import edges_df


def _part(spark, assign):
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(assign)], "node long, label long"
    )


def test_partition_similarity_identical(spark):
    a = _part(spark, [0, 0, 1, 1, 2, 2])
    b = _part(spark, [5, 5, 7, 7, 9, 9])  # same grouping, different ids
    assert rand_index(a, b) == pytest.approx(1.0)
    assert adjusted_rand(a, b) == pytest.approx(1.0)
    assert jaccard_measure(a, b) == pytest.approx(1.0)
    assert nmi(a, b) == pytest.approx(1.0)


def test_partition_similarity_disjoint(spark):
    a = _part(spark, [0, 0, 0, 0])  # one block
    b = _part(spark, [0, 1, 2, 3])  # singletons
    assert rand_index(a, b) == pytest.approx(0.0)
    assert jaccard_measure(a, b) == pytest.approx(0.0)
    # ARI of one-vs-singletons is 0 by construction
    assert adjusted_rand(a, b) == pytest.approx(0.0)


def test_partition_similarity_known_value(spark):
    # sklearn-verifiable example
    a = _part(spark, [0, 0, 1, 1])
    b = _part(spark, [0, 0, 0, 1])
    # pairs: together in a = {01, 23}=2; in b = {01,02,12}=3; both = {01}=1
    # rand = (C(4,2) + 2*1 - 2 - 3)/C(4,2) = (6+2-5)/6 = 0.5
    assert rand_index(a, b) == pytest.approx(0.5)
    assert jaccard_measure(a, b) == pytest.approx(1.0 / 4.0)


def test_erdos_renyi_deterministic(spark):
    g1 = erdos_renyi(spark, 40, 0.1)
    g2 = erdos_renyi(spark, 40, 0.1)
    assert sorted(map(tuple, g1.edges.collect())) == sorted(map(tuple, g2.edges.collect()))
    m = g1.num_edges()
    assert 40 < m < 120  # E[m] = C(40,2)*0.1 = 78


def test_chung_lu_expected_degrees(spark):
    w = [10.0] * 5 + [1.0] * 45
    g = chung_lu(spark, w)
    deg = {r["node"]: r["deg"] for r in g.degrees().collect()}
    heavy = sum(deg.get(i, 0) for i in range(5)) / 5
    light = sum(deg.get(i, 0) for i in range(5, 50)) / 45
    assert heavy > 2 * light


def test_watts_strogatz(spark):
    g = watts_strogatz(spark, 30, 2, 0.1)
    # ring base: ~2 edges per node (minus rewiring collisions)
    assert 45 <= g.num_edges() <= 60
    d = g.degrees().agg(F.avg("deg")).collect()[0][0]
    assert 3.0 <= d <= 4.5


def test_rmat_skew(spark):
    g = rmat(spark, scale=8, edge_factor=8)
    deg = [r["deg"] for r in g.degrees().orderBy(F.desc("deg")).collect()]
    assert deg[0] > 4 * (sum(deg) / len(deg))  # hubby top node
    # determinism
    g2 = rmat(spark, scale=8, edge_factor=8)
    assert g2.num_edges() == g.num_edges()


def test_anf_path_graph(spark):
    edges = [(i, i + 1) for i in range(9)]
    from networkit_spark.graph import EdgeGraph

    g = EdgeGraph.from_edges(edges_df(spark, edges))
    nf = neighborhood_function_approx(g, max_h=12, num_trials=24)
    # monotone non-decreasing estimates
    ests = [e for _, e in nf]
    assert all(b >= a * 0.99 for a, b in zip(ests, ests[1:]))
    # N(h) is a sum of per-node estimates: N(∞) on a 10-node path is
    # exactly 100 reachable pairs — the FM estimate must land near it
    # (not near ~10, which the old geometric-mean scalar produced)
    assert 50 <= ests[-1] <= 200
    ed = effective_diameter_approx(g, ratio=0.9, max_h=12, num_trials=24)
    assert 4 <= ed <= 10  # true eff. diameter ~8 on a 10-node path


def test_barabasi_albert_powerlaw_tail(spark):
    from networkit_spark.operators.generators import barabasi_albert

    g = barabasi_albert(spark, n=1500, k=4)
    deg = g.degrees()
    n = g.num_nodes()
    assert n > 1400
    mx = deg.agg(F.max("deg")).collect()[0][0]
    med = deg.approxQuantile("deg", [0.5], 0.0)[0]
    # preferential attachment: heavy tail — the max degree is an order
    # of magnitude above the median; an ER graph of equal density is not
    assert mx >= 10 * med
    # determinism at different parallelism
    e1 = sorted(map(tuple, g.edges.collect()))
    g2 = barabasi_albert(spark, n=1500, k=4)
    e2 = sorted(map(tuple, g2.edges.repartition(32).collect()))
    assert e1 == e2


def test_lfr_ground_truth_quality(spark):
    """LFR benchmark harness (the fork's egosplit evaluation protocol):
    generate with ground truth, detect, score NMI / F1."""
    from networkit_spark.operators.generators import lfr
    from networkit_spark.operators.louvain import plm
    from networkit_spark.operators.plp import plp
    from networkit_spark.operators.partition_similarity import nmi
    from networkit_spark.operators.egosplit import ego_splitting, cover_f1

    # average degree ~18, like the published LFR benchmark configs; at the
    # generator default (~6) ego-nets are near-edgeless and ego-splitting
    # degenerates by construction (for every implementation, incl. the ref)
    g, truth = lfr(spark, n=400, mu=0.1, dmin=12, dmax=40, smin=30, smax=80, seed=3)
    truth = truth.persist()
    # mixing parameter is realized: external edge fraction ≈ mu
    t = truth
    lab = (
        g.edges.join(t.withColumnRenamed("node", "src").withColumnRenamed("label", "ls"), "src")
        .join(t.withColumnRenamed("node", "dst").withColumnRenamed("label", "ld"), "dst")
    )
    ext = lab.where("ls != ld").count() / lab.count()
    assert 0.03 <= ext <= 0.2
    det = plm(g, max_sweeps=8, max_levels=6)
    score = nmi(det, truth.join(det.select("node"), "node", "leftsemi"))
    assert score >= 0.75, score
    cov = ego_splitting(g)
    f1 = cover_f1(cov, truth.join(cov.select("node").distinct(), "node", "leftsemi"))
    assert f1 >= 0.8, f1


def test_hyperbolic_pruned_equals_brute(spark):
    """The core-broadcast + sector-adjacency pruning must reproduce the
    exact n² threshold graph edge-for-edge (HyperbolicGenerator.h:21-46
    semantics; pruning is an optimization, never a semantic)."""
    from networkit_spark.operators.generators import hyperbolic

    pruned = hyperbolic(spark, 400, avg_degree=8.0, exp=3.0, seed=5)
    brute = hyperbolic(spark, 400, avg_degree=8.0, exp=3.0, seed=5, brute=True)
    ep = {(r["src"], r["dst"]) for r in pruned.edges.collect()}
    eb = {(r["src"], r["dst"]) for r in brute.edges.collect()}
    assert ep == eb
    assert len(eb) > 400  # non-trivial graph


def test_hyperbolic_powerlaw_and_clustering(spark):
    """README's hyperbolic usage example: power-law degrees with high
    clustering.  At n=3000, exp=3: heavy degree tail (max >> mean) and
    mean local clustering in the cold-RHG ballpark (>= 0.6; the README
    quotes ~0.7 at 1e5 nodes)."""
    from networkit_spark.operators.generators import hyperbolic
    from networkit_spark.operators.triangles import local_clustering_coefficient
    from pyspark.sql import functions as F

    g = hyperbolic(spark, 3000, avg_degree=10.0, exp=3.0, seed=9)
    deg = g.degrees()
    stats = deg.agg(F.avg("deg").alias("mean"), F.max("deg").alias("mx")).collect()[0]
    assert 5.0 <= stats["mean"] <= 20.0  # target avg degree honored
    assert stats["mx"] >= 8 * stats["mean"]  # heavy power-law tail
    lcc = local_clustering_coefficient(g)
    elig = lcc.join(deg.where(F.col("deg") >= 2), "node")
    mean_cc = elig.agg(F.avg("lcc")).collect()[0][0]
    assert mean_cc >= 0.6


def test_erdos_renyi_large_n_no_crossjoin(spark):
    """The skip sampler must handle n where pair enumeration (C(n,2) ≈
    5·10¹¹ candidate rows) is impossible — seconds, not hours."""
    g = erdos_renyi(spark, 1_000_000, 2e-9, seed=7)
    m = g.num_edges()
    # E[m] = C(1e6, 2)·2e-9 ≈ 1000; Poisson 6σ window
    assert 800 <= m <= 1200
    stats = g.edges.agg(
        F.min("src"), F.max("dst"), F.sum((F.col("src") >= F.col("dst")).cast("int"))
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 1_000_000 and stats[2] == 0


def test_havel_hakimi_realizes_sequence_exactly(spark):
    from networkit_spark.operators.generators import (
        havel_hakimi,
        is_sequence_realizable,
    )

    seq = [3, 3, 2, 2, 2, 2, 1, 1]  # graphical (even sum, Erdős–Gallai)
    assert is_sequence_realizable(seq)
    g = havel_hakimi(spark, seq)
    deg = {r["node"]: r["deg"] for r in g.degrees().collect()}
    assert [deg.get(i, 0) for i in range(len(seq))] == seq
    # no self loops, no parallel edges
    e = [(r["src"], r["dst"]) for r in g.edges.collect()]
    assert all(a != b for a, b in e) and len(set(e)) == len(e)

    assert not is_sequence_realizable([3, 1])  # odd sum
    assert not is_sequence_realizable([5, 1, 1, 1, 1])  # fails Erdős–Gallai? n=5, d0=5 >= n
    assert not is_sequence_realizable([4, 4, 4, 1, 1])  # EG inequality fails
    with pytest.raises(ValueError):
        havel_hakimi(spark, [3, 1])
    # powerlaw pairing: realizer consumes the sequence generator's output
    from networkit_spark.operators.generators import powerlaw_degree_sequence

    pl = [r["deg"] for r in powerlaw_degree_sequence(spark, 60, seed=3).collect()]
    if sum(pl) % 2:
        pl[0] += 1
    g2 = havel_hakimi(spark, pl, ignore_if_realizable=True)
    realized = {r["node"]: r["deg"] for r in g2.degrees().collect()}
    # with the ignore flag nodes may fall short but never exceed
    assert all(realized.get(i, 0) <= d for i, d in enumerate(pl))


def test_regular_ring_lattice(spark):
    from networkit_spark.operators.generators import regular_ring_lattice

    g = regular_ring_lattice(spark, 12, 2)
    assert g.num_edges() == 24  # n·k
    deg = {r["node"]: r["deg"] for r in g.degrees().collect()}
    assert all(deg[i] == 4 for i in range(12))
    # reference clamp: k ≥ n/2 − 1 collapses to n/2 − 1
    g2 = regular_ring_lattice(spark, 10, 7)
    assert g2.num_edges() == 10 * 4


def test_mocnik_matches_bruteforce_oracle(spark):
    """Grid-join edges == the reference's O(n²) rule evaluated in numpy
    on the SAME points (MocnikGeneratorBasic.cpp:69-87)."""
    import numpy as np

    from networkit_spark.operators.generators import mocnik

    from networkit_spark.operators.generators import mocnik_points

    g = mocnik(spark, dim=2, n=120, k=2.0, seed=5)
    assert g.directed
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    # brute-force the reference rule on the SAME deterministic points
    pts = mocnik_points(spark, 2, 120, seed=5).orderBy("id").collect()
    P = np.array([[r["x0"], r["x1"]] for r in pts])
    D = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    dmin = D.min(axis=1)
    want = {
        (i, j)
        for i in range(120)
        for j in range(120)
        if i != j and D[i, j] <= 2.0 * dmin[i]
    }
    assert got == want
    # determinism + out-degree ≥ 1 (nearest neighbor always qualifies)
    g2 = mocnik(spark, dim=2, n=120, k=2.0, seed=5)
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == got
    assert {s for s, _ in got} == set(range(120))


def test_partition_intersection_refines_both(spark):
    from networkit_spark.operators.partition_similarity import (
        partition_intersection,
    )

    a = _part(spark, [0, 0, 0, 1, 1, 1])
    b = _part(spark, [0, 0, 1, 1, 2, 2])
    inter = partition_intersection(a, b).collect()
    lab = {r["node"]: r["label"] for r in inter}
    # expected blocks: {0,1} {2} {3} {4,5}
    assert lab[0] == lab[1] and lab[4] == lab[5]
    assert len({lab[0], lab[2], lab[3], lab[4]}) == 4
    # compacted to 0..k-1
    assert set(lab.values()) == set(range(4))
    # nodes assigned in only one input are dropped (reference `contains`)
    b2 = _part(spark, [0, 0, 1])  # nodes 3..5 missing
    inter2 = partition_intersection(a, b2).collect()
    assert {r["node"] for r in inter2} == {0, 1, 2}


def test_graph_rand_measures_exact_and_sampled(spark):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.partition_similarity import (
        dynamic_nmi,
        graph_rand_index,
        nmi,
        sampled_graph_rand,
        sampled_node_rand,
    )

    # two 4-cliques joined by one edge
    edges = (
        [(i, j, 1.0) for i in range(4) for j in range(i + 1, 4)]
        + [(i, j, 1.0) for i in range(4, 8) for j in range(i + 1, 8)]
        + [(3, 4, 1.0)]
    )
    g = EdgeGraph.from_edges(edges_df(spark, edges))
    truth = _part(spark, [0, 0, 0, 0, 1, 1, 1, 1])
    same = _part(spark, [9, 9, 9, 9, 4, 4, 4, 4])
    split = _part(spark, [0, 0, 1, 1, 2, 2, 3, 3])
    assert graph_rand_index(g, truth, same) == pytest.approx(1.0)
    # disagreeing edges under `split`: within-clique pairs split apart ->
    # edges (0,2)(0,3)(1,2)(1,3)(4,6)(4,7)(5,6)(5,7) disagree = 8 of 13
    assert graph_rand_index(g, truth, split) == pytest.approx(5.0 / 13.0)
    # sampling everything == exact; deterministic under the same seed
    s1 = sampled_graph_rand(g, truth, split, max_samples=13, seed=7)
    assert s1 == pytest.approx(5.0 / 13.0)
    s2 = sampled_node_rand(g, truth, split, max_samples=1000, seed=7)
    assert s2 == sampled_node_rand(g, truth, split, max_samples=1000, seed=7)
    assert 0.0 <= s2 <= 1.0
    assert dynamic_nmi(truth, same) == pytest.approx(nmi(truth, same))


def test_stochastic_blockmodel_rates_and_determinism(spark):
    from networkit_spark.operators.generators import stochastic_blockmodel

    n = 300
    membership = [i % 2 for i in range(n)]
    aff = [[0.2, 0.01], [0.01, 0.2]]
    g = stochastic_blockmodel(spark, membership, aff, seed=11)
    e = [(r["src"], r["dst"]) for r in g.edges.collect()]
    assert e and all(u < v for u, v in e)
    assert len(set(e)) == len(e)  # no duplicate pairs
    same = sum(1 for u, v in e if u % 2 == v % 2)
    cross = len(e) - same
    # expectations: same ≈ 0.2 * 2*C(150,2) = 4470, cross ≈ 0.01 * 150*150 = 225
    assert 3800 < same < 5200 and 120 < cross < 350, (same, cross)
    g2 = stochastic_blockmodel(spark, membership, aff, seed=11)
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == sorted(e)
    with pytest.raises(ValueError):
        stochastic_blockmodel(spark, membership, [[0.1, 0.3], [0.2, 0.1]])


def test_clustered_random_graph(spark):
    from networkit_spark.operators.generators import clustered_random_graph
    from networkit_spark.operators.quality import modularity

    g, comm = clustered_random_graph(spark, 200, 4, pin=0.3, pout=0.005, seed=7)
    assert comm.count() == 200
    # planted clusters should score clearly positive modularity
    assert modularity(g, comm) > 0.4
    with pytest.raises(ValueError):
        clustered_random_graph(spark, 10, 2, pin=0.1, pout=0.5)


def test_dynamic_event_generators_roundtrip(spark):
    from networkit_spark.operators.generators import (
        dynamic_barabasi_albert_events,
        dynamic_forest_fire_events,
        dynamic_path_events,
    )
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.streaming.events import apply_events

    def empty():
        return EdgeGraph(
            spark.createDataFrame([], "src long, dst long, weight double"),
            directed=False, weighted=False,
        )

    path_ev = dynamic_path_events(spark, 5)
    g = apply_events(empty(), path_ev)
    assert g.num_edges() == 5 and g.num_nodes() == 6

    ba = dynamic_barabasi_albert_events(spark, k=2, steps=6, seed=3)
    gba = apply_events(empty(), ba)
    # each step adds exactly k distinct edges: (k-1) seed + k*steps
    assert gba.num_edges() == 1 + 2 * 6
    assert gba.num_nodes() == 2 + 6

    ff = dynamic_forest_fire_events(spark, p=0.4, steps=8, seed=5)
    gff = apply_events(empty(), ff)
    assert gff.num_nodes() == 9
    # every step links the new node to >= 1 burned node (the ambassador)
    assert gff.num_edges() >= 8
    # deterministic under the same seed
    ff2 = dynamic_forest_fire_events(spark, p=0.4, steps=8, seed=5)
    assert sorted(map(tuple, ff.collect())) == sorted(map(tuple, ff2.collect()))


def test_pub_web_generator(spark):
    import math as _m

    from networkit_spark.operators.generators import pub_web

    n = 400
    g, coords = pub_web(spark, n, num_dense_areas=6, neighborhood_radius=0.12,
                        max_neighbors=4, seed=13)
    pts = {r["node"]: (r["x"], r["y"]) for r in coords.collect()}
    assert len(pts) == n
    assert all(0.0 <= x <= 1.0 and 0.0 <= y <= 1.0 for x, y in pts.values())
    edges = g.edges.collect()
    assert edges, "geometric graph should be non-empty at this density"

    def torus_d(a, b):
        dx = abs(pts[a][0] - pts[b][0]); dx = min(dx, 1 - dx)
        dy = abs(pts[a][1] - pts[b][1]); dy = min(dy, 1 - dy)
        return _m.hypot(dx, dy)

    deg = {}
    for r in edges:
        u, v, w = r["src"], r["dst"], r["weight"]
        d = torus_d(u, v)
        assert d <= 0.12 + 1e-9
        assert w == pytest.approx(0.01 / d, rel=1e-6)
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert max(deg.values()) <= 4  # mutual top-k bounds the degree
    # brute-force mutual-top-k oracle
    in_range = {
        u: sorted(
            ((torus_d(u, v), v) for v in pts if v != u and torus_d(u, v) <= 0.12)
        )[:4]
        for u in pts
    }
    want = {
        (min(u, v), max(u, v))
        for u, lst in in_range.items()
        for _, v in lst
        if any(x == u for _, x in in_range[v])
    }
    got = {(r["src"], r["dst"]) for r in edges}
    assert got == want


def test_dynamic_pub_web_stream_consistency(spark):
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.operators.generators import dynamic_pub_web_events
    from networkit_spark.streaming.events import apply_event_stream

    ev = dynamic_pub_web_events(
        spark, 120, num_dense_areas=4, neighborhood_radius=0.15,
        max_neighbors=3, steps=2, seed=9,
    ).localCheckpoint(eager=True)
    kinds = {r["kind"] for r in ev.select("kind").distinct().collect()}
    assert {"NODE_ADDITION", "EDGE_ADDITION", "TIME_STEP"} <= kinds
    assert "NODE_REMOVAL" in kinds and "EDGE_WEIGHT_UPDATE" in kinds
    # applying the full stream reproduces a mutual-top-k geometric graph:
    # every final edge's endpoints both exist and counts stay sane
    empty = EdgeGraph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        directed=False, weighted=True,
    )
    g = apply_event_stream(empty, ev)
    n_final = g.num_nodes()
    assert 100 <= n_final <= 132  # 120 -5% +5% twice, integer-rounded
    deg = {r["node"]: r["deg"] for r in g.degrees().collect()}
    assert max(deg.values()) <= 3


def test_dynamic_hyperbolic_stream(spark):
    from networkit_spark.operators.generators import dynamic_hyperbolic_events
    from networkit_spark.streaming.events import apply_event_stream

    g0, ev = dynamic_hyperbolic_events(
        spark, 150, avg_degree=6.0, exp=3.0, move_each_step=0.5,
        move_distance=0.2, steps=3, seed=21,
    )
    ev = ev.localCheckpoint(eager=True)
    m0 = g0.num_edges()
    assert m0 > 0
    kinds = {r["kind"] for r in ev.select("kind").distinct().collect()}
    assert "TIME_STEP" in kinds
    assert {"EDGE_ADDITION", "EDGE_REMOVAL"} & kinds, "movement produced no diffs"
    # folding the stream onto the initial graph keeps a valid edge set
    # (every edge still satisfies the threshold rule implicitly: the
    # stream IS the recomputed set's diff); edge count stays in a sane band
    g = apply_event_stream(g0, ev)
    m3 = g.num_edges()
    assert 0 < m3 < 4 * m0
    # determinism
    _, ev2 = dynamic_hyperbolic_events(
        spark, 150, avg_degree=6.0, exp=3.0, move_each_step=0.5,
        move_distance=0.2, steps=3, seed=21,
    )
    assert sorted(map(tuple, ev.collect())) == sorted(map(tuple, ev2.collect()))


def test_ba_duckdb_replay_second_params(spark):
    """The driver gate replays barabasi_albert(2000,3,7) in DuckDB; this
    cross-validates the replay generator (`__spark_entry__._ba_degrees_sql`)
    at a DIFFERENT (n, k, seed), so the oracle is general, not a
    one-point golden."""
    import duckdb

    import __spark_entry__ as entrymod
    from networkit_spark.operators.generators import barabasi_albert

    g = barabasi_albert(spark, n=500, k=2, seed=11)
    want = {
        (r["deg"], r["n_nodes"])
        for r in g.degrees()
        .groupBy("deg")
        .count()
        .withColumnRenamed("count", "n_nodes")
        .collect()
    }
    rows = duckdb.connect().execute(
        entrymod._ba_degrees_sql(n=500, k=2, seed=11)
    ).fetchall()
    assert {(d, c) for d, c in rows} == want
