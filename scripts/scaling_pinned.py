"""Frequency-controlled strong-scaling window for the N -> 4N criterion.

Single-box strong scaling confounds two things a real two-cluster-size
comparison holds constant:

1. **Page-cache warmth** — the first leg reads the blob store off disk,
   every later leg reads RAM.  Fixed here by touching every blob byte
   once before any timed leg.
2. **Shared-resource state per active core** — with 2 busy cores the
   package boosts clocks and gives each core the whole LLC/bus; with 8
   busy cores it doesn't.  A 4N-executor cluster runs every executor in
   the SAME per-host state as the N-executor cluster.  Fixed here by
   holding TOTAL active cores constant: each leg at parallelism c runs
   alongside (pin_total - c) ALU-only spinner processes (a tight
   arithmetic loop that never leaves registers/L1, so it consumes a
   core's issue slots and its share of boost headroom but adds no
   memory-bus traffic).  Spinners run under SCHED_IDLE (``chrt -i 0``,
   falling back to ``nice -n 19``) so they absorb only cycles Spark
   leaves idle — they equalize the package's active-core/clock state
   across legs without ever delaying a runnable Spark thread.

What remains is the quantity the criterion actually probes: does
superstep throughput grow 4x when 4x cores work the same prepared
store.  Legs interleave 2, 8, 2, 8 (fresh JVM each) so residual host
drift hits both levels.

Usage: python scripts/scaling_pinned.py [--iters 20]
       [--synthetic 500000,800000000] [--blob-dir DIR] [--pin-total 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPIN_SRC = (
    "x=1\n"
    "while True:\n"
    "    x = (x * 1103515245 + 12345) & 0x7FFFFFFF\n"
)


def run_bench(extra, cpus):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--cpus", str(cpus)] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def warm_cache(blob_dir):
    """Fault every blob page into the page cache (cold-first-leg bias)."""
    t0 = time.time()
    total = 0
    buf = bytearray(1 << 20)
    for path in sorted(glob.glob(os.path.join(blob_dir, "*.npy"))):
        with open(path, "rb", buffering=0) as fh:
            while True:
                k = fh.readinto(buf)
                if not k:
                    break
                total += k
    print(f"warmed {total/1e9:.1f} GB in {time.time()-t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--synthetic", default="500000,800000000")
    ap.add_argument("--blob-dir", default=None)
    ap.add_argument("--prepare-cpus", type=int, default=16)
    ap.add_argument("--blob-parts", type=int, default=0,
                    help="CSR partition count for the store (cluster rule: "
                         ">= 2 waves/core at the largest leg)")
    ap.add_argument("--pin-total", type=int, default=32)
    ap.add_argument("--legs", default="2,8,2,8")
    ap.add_argument(
        "--local-cluster-mem", type=int, default=0, metavar="MB",
        help="run each leg as local-cluster[c,1,MB] — c separate "
             "single-core executor JVMs (true multi-executor scheduler/"
             "shuffle paths), the closest single-box analog of the "
             "N-vs-4N-executor criterion",
    )
    args = ap.parse_args()

    own_store = args.blob_dir is None
    blob_dir = args.blob_dir or tempfile.mkdtemp(prefix="nk_scaling_pin_")
    try:
        if not os.path.exists(os.path.join(blob_dir, "meta.json")):
            print(f"preparing blob store ({args.synthetic}) ...", flush=True)
            extra = ["--prepare-only", "--synthetic", args.synthetic, "--blob-dir", blob_dir]
            if args.blob_parts:
                extra += ["--blob-parts", str(args.blob_parts)]
            prep = run_bench(extra, cpus=args.prepare_cpus)
            print(json.dumps(prep), flush=True)
        warm_cache(blob_dir)

        legs = [int(x) for x in args.legs.split(",")]
        samples: dict[int, list] = {c: [] for c in legs}
        for c in legs:
            nspin = max(0, args.pin_total - c)
            print(f"running local[{c}] + {nspin} spinners ...", flush=True)
            if shutil.which("chrt"):
                spin_cmd = ["chrt", "-i", "0", sys.executable, "-c", SPIN_SRC]
            else:
                spin_cmd = ["nice", "-n", "19", sys.executable, "-c", SPIN_SRC]
            spinners = [
                subprocess.Popen(spin_cmd,
                                 stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
                for _ in range(nspin)
            ]
            leg_extra = ["--pagerank-only", str(args.iters), "--blob-dir", blob_dir]
            if args.local_cluster_mem:
                leg_extra += ["--master", f"local-cluster[{c},1,{args.local_cluster_mem}]"]
            try:
                r = run_bench(leg_extra, cpus=c)
            finally:
                for p in spinners:
                    p.kill()
                for p in spinners:
                    p.wait()
            r["cpus"] = c
            r["spinners"] = nspin
            print(json.dumps(r), flush=True)
            samples[c].append(r["edges_per_sec_per_superstep"])

        med = {c: statistics.median(v) for c, v in samples.items()}
        lo, hi = min(med), max(med)
        summary = {
            "synthetic": args.synthetic,
            "supersteps": args.iters,
            "pin_total": args.pin_total,
            "samples": samples,
            "median_throughput": med,
            f"eff_{lo}_to_{hi}": round((med[hi] / med[lo]) / (hi / lo), 3),
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        print(json.dumps(summary), flush=True)
        with open(os.path.join(REPO, "scaling_pinned.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        if own_store:
            shutil.rmtree(blob_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
