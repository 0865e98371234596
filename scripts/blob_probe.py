"""One-off probe: per-superstep overhead vs chain_k / cpus on a kept
blob store.  Usage:
  python scripts/blob_probe.py prepare <blob_dir> [N,M] [prep_cpus]
  python scripts/blob_probe.py run <blob_dir> <cpus> <chain_k> [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.session import get_spark


def main():
    mode, blob_dir = sys.argv[1], sys.argv[2]
    if mode == "prepare":
        n, m = (int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "200000,100000000").split(","))
        cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 16
        spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        from bench import synthetic_graph
        from networkit_spark.linkgraph.blobstep import PageRankBlobEngine
        t0 = time.time()
        eng = PageRankBlobEngine(synthetic_graph(spark, n, m), blob_dir=blob_dir)
        print(json.dumps({"prepared": blob_dir, "P": eng.P, "sec": round(time.time() - t0, 2)}))
        return
    cpus, chain_k = int(sys.argv[3]), int(sys.argv[4])
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    sp = int(os.environ.get("PROBE_SHUFFLE_PARTS", cpus))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=sp,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    from networkit_spark.linkgraph.blobstep import PageRankBlobEngine
    eng = PageRankBlobEngine.attach(spark, blob_dir)
    t0 = time.time()
    eng.run(damp=0.85, tol=0.0, max_iter=iters, chain_k=chain_k).count()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "chain_k": chain_k, "iters": iters,
                      "wall": round(wall, 2), "sec_per_superstep": round(wall / iters, 3)}))


if __name__ == "__main__":
    main()
