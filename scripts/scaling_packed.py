"""Fixed-utilization (packing-matched) N -> 4N scaling window.

On a real cluster, growing N executors to 4N adds HOSTS; every host
runs the same number of executors at both sizes, so per-host clock,
LLC, and memory-bus conditions are IDENTICAL across the two
measurements.  Single-box strong scaling violates exactly that
invariant: a local[2] leg leaves the box's shared resources 94 % idle
while a local[8] leg makes its own contention.

This harness restores the invariant: every leg keeps the SAME total
number of executor-grade memory workers resident (default 8, each a
separate single-core executor JVM via local-cluster), of which the
measured job owns c and BALLAST jobs — running the *identical*
PageRank superstep kernel against the same blob store — own the rest.
Efficiency is then (throughput@4N / throughput@N) / 4 with per-box
cache/bus/clock pressure held constant, which is the quantity the
two-cluster-size criterion actually probes.  SCHED_IDLE spinners top
the box up to --pin-total active cores for clock-state uniformity.

Usage: python scripts/scaling_packed.py --blob-dir DIR
       [--iters 20] [--total 8] [--legs 2,8,2,8]
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
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPIN_SRC = (
    "x=1\n"
    "while True:\n"
    "    x = (x * 1103515245 + 12345) & 0x7FFFFFFF\n"
)


def bench_cmd(extra, cpus):
    return [sys.executable, os.path.join(REPO, "bench.py"), "--cpus", str(cpus)] + extra


def run_bench(extra, cpus):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    out = subprocess.run(bench_cmd(extra, cpus), capture_output=True, text=True,
                         cwd=REPO, env=env)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def warm_cache(blob_dir):
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
    ap.add_argument("--blob-dir", required=True)
    ap.add_argument("--prepare-cpus", type=int, default=16)
    ap.add_argument("--blob-parts", type=int, default=64)
    ap.add_argument("--total", type=int, default=8,
                    help="executor-grade memory workers resident per leg")
    ap.add_argument("--exec-mem", type=int, default=4096)
    ap.add_argument("--pin-total", type=int, default=32)
    ap.add_argument("--ballast-warmup", type=float, default=45.0,
                    help="seconds to let ballast reach steady state "
                         "(JVM + prepare-attach) before the timed leg")
    ap.add_argument("--legs", default="2,8,2,8")
    args = ap.parse_args()

    blob_dir = args.blob_dir
    if not os.path.exists(os.path.join(blob_dir, "meta.json")):
        print(f"preparing blob store ({args.synthetic}) ...", flush=True)
        extra = ["--prepare-only", "--synthetic", args.synthetic,
                 "--blob-dir", blob_dir, "--blob-parts", str(args.blob_parts)]
        print(json.dumps(run_bench(extra, cpus=args.prepare_cpus)), flush=True)
    warm_cache(blob_dir)

    spin_cmd = (["chrt", "-i", "0"] if shutil.which("chrt") else ["nice", "-n", "19"]) + [
        sys.executable, "-c", SPIN_SRC
    ]

    # ephemeral checkpoint-state dirs are created next to the blob store
    # (blobstep.py: tempfile.mkdtemp(prefix="nk_prstate_",
    # dir=dirname(blob_dir))); sweep ONLY dirs that appear there after a
    # ballast starts, never a tempdir-wide glob that could hit an
    # unrelated concurrent run's live state
    state_root = os.path.dirname(os.path.abspath(blob_dir)) or "."

    def _state_dirs():
        return set(glob.glob(os.path.join(state_root, "nk_prstate_*")))

    legs = [int(x) for x in args.legs.split(",")]
    samples: dict[int, list] = {c: [] for c in legs}
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    for c in legs:
        nball = max(0, args.total - c)
        nspin = max(0, args.pin_total - args.total)
        print(f"leg local-cluster[{c}] + ballast local-cluster[{nball}] "
              f"+ {nspin} idle spinners ...", flush=True)
        ballast = None
        pre_state = _state_dirs()
        if nball:
            # ballast = the identical kernel, enough supersteps to outlast
            # the timed leg; killed as soon as the leg finishes
            ballast = subprocess.Popen(
                bench_cmd(
                    ["--pagerank-only", "100000", "--blob-dir", blob_dir,
                     "--master", f"local-cluster[{nball},1,{args.exec_mem}]"],
                    cpus=nball,
                ),
                cwd=REPO, env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            time.sleep(args.ballast_warmup)
        spinners = [
            subprocess.Popen(spin_cmd, stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
            for _ in range(nspin)
        ]
        try:
            r = run_bench(
                ["--pagerank-only", str(args.iters), "--blob-dir", blob_dir,
                 "--master", f"local-cluster[{c},1,{args.exec_mem}]"],
                cpus=c,
            )
        finally:
            for p in spinners:
                p.kill()
            if ballast is not None:
                ballast.terminate()  # graceful: lets atexit clean temp state
            for p in spinners:
                p.wait()
            if ballast is not None:
                try:
                    ballast.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    ballast.kill()
                    ballast.wait()
            # sweep only the checkpoint-state dirs THIS leg created (the
            # ballast/leg may have leaked them on kill) — dirs that
            # predate the leg belong to other runs and stay untouched
            for d in _state_dirs() - pre_state:
                shutil.rmtree(d, ignore_errors=True)
        r["cpus"] = c
        r["ballast"] = nball
        print(json.dumps(r), flush=True)
        samples[c].append(r["edges_per_sec_per_superstep"])

    med = {c: statistics.median(v) for c, v in samples.items()}
    lo, hi = min(med), max(med)
    summary = {
        "synthetic": args.synthetic,
        "supersteps": args.iters,
        "total_resident": args.total,
        "pin_total": args.pin_total,
        "samples": samples,
        "median_throughput": med,
        f"eff_{lo}_to_{hi}": round((med[hi] / med[lo]) / (hi / lo), 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    # machine-checkable pairwise efficiencies for EVERY adjacent leg
    # pair (a 3-level matrix otherwise records only the end-to-end
    # number and the quoted intermediate steps aren't reproducible)
    sizes = sorted(med)
    for a, b in zip(sizes, sizes[1:]):
        summary[f"eff_{a}_to_{b}"] = round((med[b] / med[a]) / (b / a), 3)
    print(json.dumps(summary), flush=True)
    with open(os.path.join(REPO, "scaling_packed.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
