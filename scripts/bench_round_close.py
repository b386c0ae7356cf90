#!/usr/bin/env python
"""Round-close A/B: HEAD vs a base ref under the FAIR protocol.

Round 8 proved the naive protocol lies: the runs-first side inherits a
calmer box (~10% under co-tenant load) and a working repo's leftover
spark-warehouse state penalizes whichever side runs from it. The
protocol this script encodes (BENCH_NOTES round 8):

- BOTH sides run `bench.py` from CLEAN `git worktree` checkouts, so
  neither inherits warehouse/metastore leftovers.
- Per-rep ORDER ALTERNATION (odd reps base-first, even head-first), so
  box-load drift cancels across the pooled min.
- 1-min load average recorded before every run, so a spike is visible
  in the log instead of silently skewing a side.

Usage: python scripts/bench_round_close.py BASE_REF [reps] [sf_dir]
Prints per-run JSON lines and a final per-query min table + composite.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def sh(cmd: list[str], **kw) -> str:
    return subprocess.run(
        cmd, check=True, capture_output=True, text=True, **kw
    ).stdout


def bench(worktree: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = sh([sys.executable, "bench.py"], cwd=worktree, env=env)
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    base_ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head_ref = sh(["git", "rev-parse", "HEAD"], cwd=repo).strip()

    trees = {}
    for name, ref in (("base", base_ref), ("head", head_ref)):
        path = f"/tmp/abw_{name}"
        subprocess.run(
            ["git", "worktree", "remove", "--force", path],
            cwd=repo, capture_output=True,
        )
        sh(["git", "worktree", "add", "--detach", path, ref], cwd=repo)
        trees[name] = path

    mins: dict[str, dict[str, float]] = {"base": {}, "head": {}}
    try:
        for rep in range(1, reps + 1):
            order = ("base", "head") if rep % 2 == 1 else ("head", "base")
            for side in order:
                load = os.getloadavg()[0]
                r = bench(trees[side], sf_dir)
                for q, s in r["queries"].items():
                    cur = mins[side].get(q)
                    mins[side][q] = s if cur is None or s < cur else cur
                print(json.dumps({
                    "rep": rep, "side": side, "load_before": round(load, 1),
                    "total": r["value"], "queries": r["queries"],
                }), flush=True)
    finally:
        for path in trees.values():
            subprocess.run(
                ["git", "worktree", "remove", "--force", path],
                cwd=repo, capture_output=True,
            )

    qs = sorted(set(mins["base"]) | set(mins["head"]))
    both = [q for q in qs if q in mins["base"] and q in mins["head"]]
    print(f"\n{'query':28s} {'base':>8s} {'head':>8s}  delta")
    for q in qs:
        b, h = mins["base"].get(q), mins["head"].get(q)
        bs = f"{b:8.3f}" if b is not None else f"{'n/a':>8s}"
        hs = f"{h:8.3f}" if h is not None else f"{'n/a':>8s}"
        ds = f"{(h - b) / b * 100:+.1f}%" if b and h else "n/a"
        print(f"{q:28s} {bs} {hs}  {ds}")
    # composite over the INTERSECTION only: a query present on one side
    # (e.g. the base ref predates a bench query added later) would skew
    # the sums asymmetrically.
    one_sided = [q for q in qs if q not in both]
    if one_sided:
        print(f"(one-sided queries excluded from composite: {one_sided})")
    bt = sum(mins["base"][q] for q in both)
    ht = sum(mins["head"][q] for q in both)
    print(f"{'COMPOSITE (sum of mins)':28s} {bt:8.3f} {ht:8.3f}  "
          f"{(ht - bt) / bt * 100:+.1f}%")


if __name__ == "__main__":
    main()
