"""Ingest tests: synthetic source table determinism, sha256 invariant,
edge extraction structure, tpch link graph."""

import hashlib

from pyspark.sql import functions as F

from networkit_spark.linkgraph.extract import extract_link_graph, tpch_link_graph
from networkit_spark.linkgraph.tables import content_hashes, source_files


def test_source_table_deterministic(spark):
    a = source_files(spark, num_repos=10, max_files=30).orderBy("repo", "path", "commit")
    b = (
        source_files(spark, num_repos=10, max_files=30)
        .repartition(7)
        .orderBy("repo", "path", "commit")
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_content_sha256_invariant(spark):
    """Per-row invariant (input_hint): sha256(content) recomputed in
    plain Python equals the engine's extraction."""
    t = source_files(spark, num_repos=5, max_files=20)
    joined = t.join(content_hashes(t), ["repo", "path", "commit"]).limit(50).collect()
    assert len(joined) > 0
    for r in joined:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]


def test_power_law_hub_skew(spark):
    """repo0 is the hub: strictly more files than the median repo."""
    t = source_files(spark, num_repos=20, max_files=200)
    sizes = (
        t.select("repo", "path").distinct().groupBy("repo").count().orderBy("repo").collect()
    )
    assert sizes[0]["count"] > 3 * sizes[10]["count"]


def test_extract_structure(spark):
    t = source_files(spark, num_repos=8, max_files=24)
    g, vertices = extract_link_graph(t)
    kinds = {r["kind"] for r in vertices.select("kind").distinct().collect()}
    assert kinds == {"r", "p", "c"}
    # canonical edges: src < dst, no duplicates
    e = g.edges
    assert e.where(F.col("src") >= F.col("dst")).count() == 0
    assert e.groupBy("src", "dst").count().where("count > 1").count() == 0
    # ids dense 0..n-1
    n = vertices.count()
    assert vertices.agg(F.min("id"), F.max("id")).collect()[0] == (0, n - 1)
    # containment edges exist: every repo links to >=3 paths
    rp = (
        vertices.where(F.col("kind") == "r")
        .join(g.sym(), F.col("id") == F.col("src"))
        .groupBy("id")
        .count()
    )
    assert rp.where(F.col("count") < 3).count() == 0


def test_tpch_link_graph(spark):
    g = tpch_link_graph(spark, "/root/testdata/sf0.001")
    assert g.edges.where(F.col("src") >= F.col("dst")).count() == 0
    n, m = g.num_nodes(), g.num_edges()
    assert n > 100 and m > 500
    # tripartite: customer ids < 1e6 <= part < 2e6 <= supplier
    kinds = g.vertices().select(
        F.when(F.col("id") < 1_000_000, "c")
        .when(F.col("id") < 2_000_000, "p")
        .otherwise("s")
        .alias("k")
    )
    got = {r["k"] for r in kinds.distinct().collect()}
    assert got == {"c", "p", "s"}


def test_source_table_to_pagerank_e2e(spark):
    """North-rule end-to-end slice: synthetic Iceberg-shaped source table
    → typed link graph → blob-engine PageRank → scores match the sql
    implementation (same fixpoint)."""
    import numpy as np
    from networkit_spark.operators.pagerank import pagerank

    t = source_files(spark, num_repos=12, max_files=40)
    g, vertices = extract_link_graph(t)
    fast = {r["node"]: r["rank"] for r in pagerank(g, tol=1e-8, impl="blob").collect()}
    ref = {r["node"]: r["rank"] for r in pagerank(g, tol=1e-8, impl="sql").collect()}
    assert set(fast) == set(ref)
    assert all(abs(fast[k] - ref[k]) < 1e-6 for k in ref)
    # the power-law hub repo ranks top-5 among repo nodes
    repo_ids = {r["id"] for r in vertices.where("kind = 'r'").collect()}
    hub = vertices.where("kind = 'r' and key = 'repo00000'").collect()[0]["id"]
    top5 = sorted(((v, k) for k, v in fast.items() if k in repo_ids), reverse=True)[:5]
    assert hub in {k for _, k in top5}


def test_assign_dense_ids_partition_equivalence(spark):
    """Ids from assign_dense_ids = global ascending-key rank, identical
    at 2/8/32 partitions, and the plan has no single-partition global
    window Exchange (the scale fix for densify/persona id assignment)."""
    from networkit_spark.graph import assign_dense_ids

    keys = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.format_string("%06d", (F.col("id") * 7919) % 5000)).alias("key")
    ).distinct()
    expected = None
    for p in (2, 8, 32):
        got = {
            r["key"]: r["id"]
            for r in assign_dense_ids(keys, "key", num_parts=p).collect()
        }
        ranks = {k: i for i, k in enumerate(sorted(got))}
        assert got == ranks
        if expected is None:
            expected = got
        assert got == expected
    plan = assign_dense_ids(keys, "key", num_parts=8)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_index_edges_dense_and_deterministic(spark):
    """indexEdges: dense 0-based ids, deterministic = (src,dst) rank,
    stable under re-partitioning (no single-partition global window)."""
    from networkit_spark.graph import EdgeGraph, index_edges
    from tests.conftest import edges_df

    pairs = [(5, 9), (0, 1), (3, 4), (0, 7), (2, 3)]
    g = EdgeGraph.from_edges(edges_df(spark, pairs))
    idx = index_edges(g.edges)
    got = {(r["src"], r["dst"]): r["edge_id"] for r in idx.collect()}
    want = {p: i for i, p in enumerate(sorted(pairs))}
    assert got == want
    # repartitioned input → identical ids
    idx2 = index_edges(g.edges.repartition(7))
    got2 = {(r["src"], r["dst"]): r["edge_id"] for r in idx2.collect()}
    assert got2 == want


def test_random_nodes_edges_seeded(spark):
    """Sampling primitives: deterministic per seed, distinct, uniform-ish
    (different seeds pick different winners on a big enough set)."""
    from networkit_spark.graph import EdgeGraph, random_edges, random_nodes
    from tests.conftest import edges_df

    g = EdgeGraph.from_edges(edges_df(spark, [(i, i + 1) for i in range(50)]))
    a = random_nodes(g, k=5, seed=1)
    b = random_nodes(g, k=5, seed=1)
    c = random_nodes(g, k=5, seed=2)
    assert a == b and len(set(a)) == 5
    assert a != c
    e1 = random_edges(g, k=3, seed=1)
    assert e1 == random_edges(g, k=3, seed=1) and len(set(e1)) == 3
