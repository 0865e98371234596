"""Two-cluster-size scaling evidence (north rule, sandbox protocol).

Protocol: prepare the blob store ONCE (the durable prepared-graph
artifact), then run the IDENTICAL PageRank job (fixed supersteps, same
store) at two parallelism levels — local[N] and local[4N] — in separate
subprocesses (fresh JVM each).  Reports throughput at both plus
scaling efficiency = (throughput@4N / throughput@N) / 4, and writes
BENCH.md.

Usage: python scripts/scaling.py [--n 8] [--iters 20]
       [--synthetic 2000000,200000000] [--parts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra: list[str], cpus: int) -> dict:
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
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--synthetic", default="500000,800000000")
    ap.add_argument("--prepare-cpus", type=int, default=16,
                    help="parallelism for the one-time prepare; also sets P")
    args = ap.parse_args()

    blob_dir = tempfile.mkdtemp(prefix="nk_scaling_")
    try:
        print(f"preparing blob store ({args.synthetic}) ...", flush=True)
        prep = run_bench(
            ["--prepare-only", "--synthetic", args.synthetic, "--blob-dir", blob_dir],
            cpus=args.prepare_cpus,
        )
        print(json.dumps(prep), flush=True)

        levels = [args.n, 4 * args.n]
        res = {}
        for c in levels:
            print(f"running local[{c}] ...", flush=True)
            res[c] = run_bench(
                ["--pagerank-only", str(args.iters), "--blob-dir", blob_dir], cpus=c
            )
            print(json.dumps(res[c]), flush=True)

        thr_n = res[levels[0]]["edges_per_sec_per_superstep"]
        thr_4n = res[levels[1]]["edges_per_sec_per_superstep"]
        eff = (thr_4n / thr_n) / 4.0
        summary = {
            "synthetic": args.synthetic,
            "supersteps": args.iters,
            "N": levels[0],
            "throughput_N": thr_n,
            "throughput_4N": thr_4n,
            "scaling_efficiency": round(eff, 3),
            "pass_0.8": eff >= 0.8,
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        print(json.dumps(summary), flush=True)

        nodes, edges = args.synthetic.split(",")
        section = f"""## Scaling (north rule: N vs 4N parallelism, same job, same input)

Protocol: the blob store (per-partition CSR blocks + static state) is
prepared ONCE from the deterministic synthetic hub-skewed graph
({int(nodes):,} nodes, {int(edges):,} directed edges), then the
IDENTICAL PageRank job ({args.iters} supersteps, damping 0.85, blob
superstep engine) runs against that same store at two parallelism
levels in fresh JVMs.  Throughput = edges·supersteps / wall-clock.

| parallelism | wall {args.iters} supersteps (s) | edges/sec/superstep |
|---|---|---|
| local[{levels[0]}]  (N)  | {res[levels[0]]['wall_sec']} | {thr_n:,.0f} |
| local[{levels[1]}] (4N) | {res[levels[1]]['wall_sec']} | {thr_4n:,.0f} |

**Scaling efficiency = (throughput@4N / throughput@N) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json; measured {time.strftime('%Y-%m-%d')}).

Caveat: single-machine local mode shares one JVM heap, memory bus, and
OS page cache across "executors"; per-superstep fixed costs (job launch,
Python-runner round trips, shuffle commit) do not shrink with cores, so
this under-states the efficiency a real multi-executor cluster sees,
where prepare-once + O(n)-bytes-per-superstep exchange is the property
that transfers.

"""
        # Replace ONLY the scaling section; keep everything after the
        # next "## " heading (headline bench, headroom, ...) intact.
        path = os.path.join(REPO, "BENCH.md")
        head = "# BENCH — measured numbers\n\n"
        rest = ""
        if os.path.exists(path):
            old = open(path).read()
            marker = old.find("## Headline bench")
            if marker < 0:
                # fallback: preserve from the first non-scaling "## "
                # heading — never silently drop the rest of the file
                for m in re.finditer(r"^## .*$", old, re.M):
                    if "scaling" not in m.group(0).lower():
                        marker = m.start()
                        break
            if marker >= 0:
                rest = old[marker:]
            elif old.strip():
                print("WARNING: no '## ' section marker in BENCH.md; aborting rewrite")
                return
        with open(path, "w") as f:
            f.write(head + section + rest)
        print("wrote BENCH.md (scaling section)")
    finally:
        shutil.rmtree(blob_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
