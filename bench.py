"""Benchmark harness (driver contract + scaling evidence).

Default mode — the driver contract: run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "pagerank": {...}}

``--pagerank-only N`` — run exactly N PageRank supersteps (tol=0) and
report throughput; used by scripts/scaling.py to evidence the
north-rule two-cluster-size criterion (local[8] vs local[32] on the
same input → throughput@N, throughput@4N, efficiency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from networkit_spark.session import get_spark
from networkit_spark.linkgraph.extract import tpch_link_graph
from networkit_spark.operators import triangles as tri
from networkit_spark.functions import dedup, similarity


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return -1.0


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def run_headline(spark, sf_dir: str) -> dict:
    g = tpch_link_graph(spark, sf_dir)
    g.edges.persist()
    m = g.num_edges()
    m_sym = 2 * m  # no self-loops in this graph
    results: dict[str, float] = {}
    detail: dict[str, object] = {"edges": m, "edges_sym": m_sym}

    # Partition sizing for the superstep engines: each partition is one
    # vectorized python worker per stage, so undersized partitions pay
    # stage overhead and oversubscribe the memory bus (the kernels are
    # bandwidth-bound, not vCPU-bound).  Target >= ~400k edges per
    # partition, capped at the core count — at sf0.1 that is 8 parts; on
    # the 800M-edge scaling store it saturates at the core count.
    cpus = int(spark.sparkContext.defaultParallelism)
    sized_parts = max(4, min(cpus, (2 * m) // 400_000))
    blob_parts = int(os.environ.get("SPARK_GRAFT_BLOB_PARTS", "0")) or sized_parts

    # ONE prepared (CSR blob) store shared by ALL the iterative kernels
    # — PageRank, connected components, AND PLP run off the same blobs
    # (round 4 built two near-identical stores; 31% of the headline)
    from networkit_spark.linkgraph.blobstep import PageRankBlobEngine

    prep_s, blob_eng = timed(lambda: PageRankBlobEngine(g, num_parts=blob_parts))
    results["prepare"] = round(prep_s, 3)
    pr_s, pr = timed(lambda: blob_eng.run(damp=0.85, tol=1e-6))
    n_rows = pr.count()
    results["pagerank_1e6"] = round(pr_s, 3)
    it_s, _ = timed(lambda: blob_eng.run(damp=0.85, tol=0.0, max_iter=10).count())
    detail["pagerank"] = {
        "wall_sec_tol1e6": round(pr_s, 3),
        "wall_sec_10_supersteps": round(it_s, 3),
        "edges_per_sec_per_superstep": round(m_sym * 10 / it_s, 1),
        "rows": n_rows,
    }
    results["pagerank_10iter"] = round(it_s, 3)

    cc_s, cc = timed(lambda: blob_eng.run_components().count())
    results["connected_components"] = round(cc_s, 3)

    plp_s, _ = timed(lambda: blob_eng.run_plp(max_iter=5).count())
    results["plp_5_sweeps"] = round(plp_s, 3)
    blob_eng.close()

    tri_s, total = timed(lambda: tri.triangle_list(g).count())
    results["triangle_count"] = round(tri_s, 3)
    detail["triangles"] = total

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dd_s, pairs = timed(lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5).count())
    results["minhash_lsh_dedup"] = round(dd_s, 3)
    detail["near_dup_pairs"] = pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    knn_s, _ = timed(
        lambda: similarity.cosine_topk(emb, queries=emb.where(F.col("vec_id") < 20), k=5).count()
    )
    results["cosine_topk"] = round(knn_s, 3)

    g.edges.unpersist()
    return {"queries": results, "detail": detail}


def synthetic_graph(spark, n: int, m: int, seed: int = 42):
    """Deterministic hub-skewed directed gather graph (RMAT-flavored):
    src ~ (uniform)^3 · n (power-law-ish hubs), dst uniform.  Pure SQL
    generation — identical rows at any parallelism.  Used by the scaling
    protocol so per-superstep numpy compute dominates scheduler overhead
    (the regime a 1000-executor cluster actually runs in)."""
    from networkit_spark.graph import EdgeGraph

    e = spark.range(m).select(
        (
            (F.pow((F.abs(F.xxhash64("id", F.lit(seed))) % 1000000) / 1e6, 3.0) * n)
        ).cast("long").alias("src"),
        (F.abs(F.xxhash64("id", F.lit(seed + 1))) % n).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return EdgeGraph(e, directed=True, weighted=True)


def run_pagerank_only(
    spark,
    sf_dir: str,
    iters: int,
    synthetic: str | None = None,
    blob_dir: str | None = None,
    prepare_only: bool = False,
    num_parts: int | None = None,
) -> dict:
    """PageRank throughput probe on the blob superstep engine.

    ``blob_dir`` + ``prepare_only``: build the blob store and exit.
    ``blob_dir`` alone (store exists): attach without re-preparing —
    the two-cluster-size protocol runs N and 4N against the SAME store.
    """
    from networkit_spark.linkgraph.blobstep import PageRankBlobEngine

    attach = blob_dir is not None and os.path.exists(os.path.join(blob_dir, "meta.json"))
    if attach and not prepare_only:
        eng = PageRankBlobEngine.attach(spark, blob_dir)
        prep_s = 0.0
        m_sym = sum(
            int(__import__("numpy").load(os.path.join(blob_dir, f"p{p}_rinv.npy"), mmap_mode="r").shape[0])
            for p in eng.state_parts
            if os.path.exists(os.path.join(blob_dir, f"p{p}_rinv.npy"))
        )
    else:
        if synthetic:
            n, m = (int(x) for x in synthetic.split(","))
            g = synthetic_graph(spark, n, m)
            m_sym = m  # directed: gather rows = edge rows
        else:
            g = tpch_link_graph(spark, sf_dir)
            g.edges.persist()
            m_sym = 2 * g.num_edges()
        prep_s, eng = timed(lambda: PageRankBlobEngine(g, num_parts=num_parts, blob_dir=blob_dir))
        if prepare_only:
            return {"prepared": eng.blob_dir, "prepare_sec": round(prep_s, 3), "edges_sym": m_sym}
    wall, _ = timed(lambda: eng.run(damp=0.85, tol=0.0, max_iter=iters).count())
    if blob_dir is None:
        eng.close()
    return {
        "edges_sym": m_sym,
        "supersteps": iters,
        "prepare_sec": round(prep_s, 3),
        "wall_sec": round(wall, 3),
        "edges_per_sec_per_superstep": round(m_sym * iters / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--pagerank-only", type=int, default=0, metavar="ITERS")
    ap.add_argument(
        "--synthetic", default=None, metavar="N,M",
        help="use the deterministic synthetic graph (N nodes, M edges) instead of sf-dir",
    )
    ap.add_argument("--blob-dir", default=None, help="shared blob store path (scaling protocol)")
    ap.add_argument("--prepare-only", action="store_true", help="build the blob store and exit")
    ap.add_argument(
        "--master", default=None,
        help="override the Spark master (e.g. local-cluster[8,1,4096] for "
             "a true multi-executor pseudo-cluster: separate executor JVMs, "
             "real scheduler/shuffle paths — the closest single-box analog "
             "of the N-vs-4N-executor criterion)",
    )
    ap.add_argument(
        "--blob-parts", type=int, default=None, metavar="P",
        help="CSR partition count whenever the engine builds a fresh blob "
             "store (any run whose --blob-dir lacks meta.json, not just "
             "--prepare-only; default: shuffle partitions).  Size it like "
             "a cluster: >= 2 waves per core at the LARGEST parallelism "
             "the store will run at, so stage walls are not quantized to "
             "the slowest (hub-heaviest) task",
    )
    args = ap.parse_args()

    cpus = int(args.cpus)
    spark = get_spark(
        app_name="networkit-spark-bench",
        master=args.master or f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        if args.pagerank_only or args.prepare_only:
            out = run_pagerank_only(
                spark, args.sf_dir, args.pagerank_only or 0, args.synthetic,
                blob_dir=args.blob_dir, prepare_only=args.prepare_only,
                num_parts=args.blob_parts,
            )
            out.update({"cpus": cpus, "sf": _sf_of(args.sf_dir), "synthetic": args.synthetic})
            print(json.dumps(out))
            return
        res = run_headline(spark, args.sf_dir)
        total = round(sum(res["queries"].values()), 3)
        line = {
            "metric": "headline_total",
            "value": total,
            "unit": "sec",
            "queries": res["queries"],
            "sf": _sf_of(args.sf_dir),
            "cpus": cpus,
            "detail": res["detail"],
        }
        print(json.dumps(line))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
