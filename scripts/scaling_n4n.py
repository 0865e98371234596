"""North-rule N vs 4N window at core counts the host bus can actually serve.

BENCH.md's STREAM probe shows this box's aggregate memory bandwidth
scales near-linearly from 1 to 4 concurrent streaming processes
(5.7 -> 20.2 GB/s, eff 0.89) and COLLAPSES beyond 8 (32 procs: 1.2 GB/s)
— the VM's 32 vCPUs are oversubscribed on the host.  The round-2/3/4
local[8]/local[32] pairs therefore measure the host's bus contention,
not the engine.  This script runs the SAME shared-blob-store protocol
at local[1] vs local[4] — a genuine N vs 4N pair inside the regime
where the hardware itself scales — interleaved (1,4,4,1,1,4) with a
fresh JVM per leg so host drift hits both levels.

Usage: python scripts/scaling_n4n.py [--iters 20] [--synthetic 200000,100000000]
Writes scaling_n4n.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra, cpus):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--cpus", str(cpus)] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--synthetic", default="200000,100000000")
    ap.add_argument("--n", type=int, default=1, help="small cluster size (cores)")
    ap.add_argument("--prepare-cpus", type=int, default=16)
    args = ap.parse_args()
    lo, hi = args.n, 4 * args.n

    blob_dir = tempfile.mkdtemp(prefix="nk_scaling_n4n_")
    try:
        print(f"preparing blob store ({args.synthetic}) ...", flush=True)
        prep = run_bench(
            ["--prepare-only", "--synthetic", args.synthetic, "--blob-dir", blob_dir],
            cpus=args.prepare_cpus,
        )
        print(json.dumps(prep), flush=True)

        legs = [lo, hi, hi, lo, lo, hi]
        samples = {lo: [], hi: []}
        for c in legs:
            print(f"running local[{c}] ...", flush=True)
            r = run_bench(["--pagerank-only", str(args.iters), "--blob-dir", blob_dir], cpus=c)
            r["cpus"] = c
            print(json.dumps(r), flush=True)
            samples[c].append(r["edges_per_sec_per_superstep"])

        med = {c: statistics.median(v) for c, v in samples.items()}
        summary = {
            "synthetic": args.synthetic,
            "supersteps": args.iters,
            "levels": [lo, hi],
            "samples": {str(k): v for k, v in samples.items()},
            "median_throughput": {str(k): v for k, v in med.items()},
            "efficiency_n_to_4n": round((med[hi] / med[lo]) / 4.0, 3),
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        print(json.dumps(summary), flush=True)
        with open(os.path.join(REPO, "scaling_n4n.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(blob_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
