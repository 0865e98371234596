"""Spark-free concurrency probe of the blob gather kernel.

Question the N-vs-4N windows can't answer by themselves: when local[4]
only reaches ~1.5x local[1] (scaling_n4n.json: eff 0.384) while the
sequential-STREAM probe says the bus scales 0.89 at 4 procs, is the
shortfall (a) the engine/Spark serializing work, or (b) the host not
scaling for THIS access pattern (np.repeat + random-write bincount is
latency/TLB-bound, not streaming-bound)?

This script strips Spark out entirely: K worker processes each run the
IDENTICAL per-part gather algebra (searchsorted plan -> repeat ->
bincount) straight off the mmap'd blobs, round-robin over the store's
parts.  Each worker times its own kernel; we report the per-part kernel
time distribution at concurrency 1 vs K.  If per-part kernel time
inflates ~K/speedup-fold at K procs, the hardware is the limit and the
engine's per-partition independence is exonerated; flat per-part times
would instead indict the Spark layer.

Usage: python scripts/kernel_concurrency_probe.py <blob_dir> [levels=1,4] [reps=3]
Writes kernel_concurrency.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _parts(bd):
    return sorted(
        int(f[1:].split("_")[0])
        for f in os.listdir(bd)
        if f.endswith("_row.npy")
    )


def worker(bd, parts, reps, out_q):
    per_part = {}
    edges = 0
    for part in parts:
        snodes = np.load(os.path.join(bd, f"p{part}_snodes.npy"), mmap_mode="r")
        invw = np.load(os.path.join(bd, f"p{part}_invw.npy"))
        row_nodes = np.load(os.path.join(bd, f"p{part}_row.npy"))
        indptr = np.load(os.path.join(bd, f"p{part}_indptr.npy"))
        inv = np.load(os.path.join(bd, f"p{part}_rinv.npy"))
        bounds = np.load(os.path.join(bd, f"p{part}_rbounds.npy"))
        pos = np.searchsorted(snodes, row_nodes)
        counts = np.diff(indptr)
        ranks = np.full(len(snodes), 1.0 / max(len(snodes), 1))
        edges += int(inv.shape[0])
        t = []
        for _ in range(reps):
            t0 = time.perf_counter()
            vals = ranks * invw
            contrib = np.repeat(vals[pos], counts)
            np.bincount(inv, weights=contrib, minlength=int(bounds[-1]))
            t.append(time.perf_counter() - t0)
        per_part[part] = min(t)
    out_q.put((per_part, edges))


def run_level(bd, k, reps):
    parts = _parts(bd)
    chunks = [parts[i::k] for i in range(k)]
    q = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(bd, c, reps, q)) for c in chunks if c
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    per_part = {}
    edges = 0
    for pp, e in results:
        per_part.update(pp)
        edges += e
    kern_sum = sum(per_part.values())
    return {
        "concurrency": k,
        "parts": len(per_part),
        "edges_sym": edges,
        "kernel_sum_s": round(kern_sum, 3),
        "kernel_max_part_s": round(max(per_part.values()), 4),
        "kernel_med_part_s": round(sorted(per_part.values())[len(per_part) // 2], 4),
        "agg_kernel_edges_per_s": round(edges * reps / wall / 1e6, 1),
        "wall_s": round(wall, 3),
        "per_part": {str(p): round(v, 4) for p, v in sorted(per_part.items())},
    }


def main():
    bd = sys.argv[1]
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,4").split(",")]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # warm page cache once so level order doesn't matter
    run_level(bd, max(levels), 1)
    out = {"blob_dir": bd, "reps": reps, "levels": []}
    for k in levels + levels[::-1]:  # interleave-ish: 1,4,4,1
        out["levels"].append(run_level(bd, k, reps))
        print(json.dumps(out["levels"][-1], indent=None))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "kernel_concurrency.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
