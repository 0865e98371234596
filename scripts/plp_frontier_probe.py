"""PLP frontier A/B — full gather vs restricted-edge frontier gather.

The TPCH link graph OSCILLATES under synchronous label propagation
(tripartite-ish structure: per-sweep deltas plateau at ~60% of n), so
the 5-sweep headline bench can never show the frontier's value there.
This probe runs PLP TO CONVERGENCE on an RMAT graph (power-law, like
real link graphs; converges with a collapsing active set) with the
frontier off (frontier_frac=0) and on (default), interleaved, and
prints per-variant walls + the per-sweep delta profile.

Usage: python scripts/plp_frontier_probe.py [--scale 18] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=17)
    ap.add_argument("--edge-factor", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--max-iter", type=int, default=30)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from bench import synthetic_graph  # reuse the deterministic generator
    from networkit_spark.graph import EdgeGraph
    from networkit_spark.linkgraph.superstep import Checkpointer, prepare
    from networkit_spark.operators.plp import plp
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n, m = 1 << args.scale, args.edge_factor << args.scale
    raw = synthetic_graph(spark, n, m).edges
    e = (
        raw.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g = EdgeGraph(e, directed=False, weighted=False)
    g.edges.persist()
    mm = g.num_edges()
    prepared = prepare(g.sym())

    ck = Checkpointer()
    plp(g, max_iter=args.max_iter, impl="csr", prepared=prepared, checkpointer=ck).count()
    deltas = [h.get("delta") for h in ck.history if h.get("delta") is not None]
    print(json.dumps({"nodes": g.num_nodes(), "edges": mm, "deltas": deltas}))

    results = {"full": [], "frontier": []}
    for rep in range(args.reps):
        for label, frac in (("full", 0.0), ("frontier", 0.3)):
            t0 = time.time()
            plp(
                g, max_iter=args.max_iter, impl="csr", prepared=prepared,
                frontier_frac=frac,
            ).count()
            wall = round(time.time() - t0, 2)
            results[label].append(wall)
            print(f"rep{rep} {label}: {wall}s", flush=True)
    print(json.dumps({"walls": results, "supersteps": len(deltas)}))
    spark.stop()


if __name__ == "__main__":
    main()
