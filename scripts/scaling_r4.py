"""Round-4 scaling window: one shared blob store, interleaved legs at
local[2] / local[8] / local[32] (fresh JVM each), reporting BOTH the
2->8 and the 8->32 pairs from the same host window.

Leg order interleaves levels so host drift hits all levels equally:
2, 8, 32, 8, 32, 2.  Medians per level; efficiency from medians.

Usage: python scripts/scaling_r4.py [--iters 20] [--synthetic 500000,800000000]
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
    ap.add_argument("--synthetic", default="500000,800000000")
    ap.add_argument("--prepare-cpus", type=int, default=16)
    # P >= 2 waves/core at the largest leg (local[32]) — the P=16 store
    # quantized local[8] to 2 waves and starved half of local[32]'s
    # cores outright; see BENCH.md "controlled windows" for the A/B.
    ap.add_argument("--blob-parts", type=int, default=64)
    args = ap.parse_args()

    blob_dir = tempfile.mkdtemp(prefix="nk_scaling_r4_")
    try:
        print(f"preparing blob store ({args.synthetic}) ...", flush=True)
        prep = run_bench(
            ["--prepare-only", "--synthetic", args.synthetic, "--blob-dir", blob_dir,
             "--blob-parts", str(args.blob_parts)],
            cpus=args.prepare_cpus,
        )
        print(json.dumps(prep), flush=True)

        legs = [2, 8, 32, 8, 32, 2]
        samples = {2: [], 8: [], 32: []}
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
            "samples": samples,
            "median_throughput": med,
            "eff_2_to_8": round((med[8] / med[2]) / 4.0, 3),
            "eff_8_to_32": round((med[32] / med[8]) / 4.0, 3),
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        print(json.dumps(summary), flush=True)
        with open(os.path.join(REPO, "scaling_r4.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(blob_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
