"""Same-window interleaved A/B of the headline bench across code versions.

Round-2 verdict ("What's wrong #2"): BENCH_r02's headline regressed
72.7 s -> 95.2 s vs BENCH_r01, plausibly host noise (this box's identical
runs vary 3.3x — see BENCH.md's bandwidth probe), plausibly real cost
(the round-2 ``max_bucket`` pass in minhash_lsh_dedup) — but the two
code versions were never run in the SAME host window, so neither claim
was a measurement.  This script is that measurement:

  for round in 1..N:            # interleaved, so host drift hits all
      for variant in variants:  # versions inside every round equally
          subprocess: python bench.py   (fresh JVM, same env)

Variants are (label, workdir) pairs — workdirs are git worktrees of the
round-1 / round-2 final commits plus the live tree.  Per-query medians
and min (calm-window proxy) are reported; results land in a JSON file
for BENCH.md.

Usage:
    python scripts/ab_headline.py --rounds 3 \
        r1=/tmp/ab_r1 r2=/tmp/ab_r2 r3=/root/repo \
        --out /root/repo/ab_headline.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time


def run_bench(workdir: str, sf_dir: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sf-dir", sf_dir, "--cpus", str(cpus)],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {workdir}: {proc.stdout[-500:]} {proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+", metavar="LABEL=WORKDIR")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="ab_headline.json")
    args = ap.parse_args()

    variants = [v.split("=", 1) for v in args.variants]
    runs: list[dict] = []
    for rnd in range(args.rounds):
        for label, workdir in variants:
            t0 = time.time()
            res = run_bench(workdir, args.sf_dir, args.cpus)
            runs.append({"round": rnd, "variant": label, "result": res})
            print(
                f"[round {rnd}] {label}: total={res['value']}s "
                f"(wall {time.time() - t0:.0f}s) queries={res['queries']}",
                flush=True,
            )
            with open(args.out, "w") as f:
                json.dump(runs, f, indent=1)

    # summary: per-variant per-query median + min across rounds
    queries = sorted({q for r in runs for q in r["result"]["queries"]})
    summary: dict[str, dict] = {}
    for label, _ in variants:
        vals = [r["result"] for r in runs if r["variant"] == label]
        summary[label] = {
            "total_median": statistics.median(v["value"] for v in vals),
            "total_min": min(v["value"] for v in vals),
            "queries_median": {
                q: statistics.median(v["queries"][q] for v in vals if q in v["queries"])
                for q in queries
                if any(q in v["queries"] for v in vals)
            },
            "queries_min": {
                q: min(v["queries"][q] for v in vals if q in v["queries"])
                for q in queries
                if any(q in v["queries"] for v in vals)
            },
        }
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump({"runs": runs, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
