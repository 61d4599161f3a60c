"""Paired A/B of the encode-path bench queries: HEAD vs the r4 commit.

r5 verdict #2: encode_lineitem/encode_events/decode_lineitem regressed
16-39% r4→r5 while every other query got faster; no encode-path code
changed in r5, so host drift is the hypothesis — but three correlated
regressions deserve paired evidence, not a shrug. Methodology matches
BASELINE.md's interleaved-scaling protocol: the two legs alternate
WITHIN each round (A B / B A order flipped per round so slow waves hit
both legs equally), fresh JVM per leg, per-query PAIRED ratios, median
over rounds.

Usage: python tools/ab_encode_regression.py [rounds] [r4_worktree]
Writes tools/ab_encode_r4_vs_head.json and prints a summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HEAD = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(HEAD, "tools", "ab_encode_probe.py")
QUERIES = ("encode_lineitem", "encode_events", "decode_lineitem")


def run_leg(repo: str) -> dict:
    env = dict(os.environ, AB_REPO=repo)
    out = subprocess.run(
        [sys.executable, PROBE], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(f"probe failed for {repo}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r4 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ab_r4_worktree"
    if not os.path.isdir(r4):
        subprocess.run(
            ["git", "worktree", "add", "--detach", r4, "007faf7"],
            cwd=HEAD, check=True,
        )
    legs: list[dict] = []
    for i in range(rounds):
        order = [("r4", r4), ("head", HEAD)]
        if i % 2:
            order.reverse()
        row = {"round": i}
        for name, repo in order:
            row[name] = run_leg(repo)
            print(f"round {i} {name}: "
                  f"{ {q: row[name][q] for q in QUERIES} }", flush=True)
        legs.append(row)
    report = {"rounds": rounds, "r4_commit": "007faf7", "legs": legs}
    ratios = {}
    for q in QUERIES:
        per_round = [leg["head"][q] / leg["r4"][q] for leg in legs]
        ratios[q] = {
            "paired_ratios_head_over_r4": [round(x, 3) for x in per_round],
            "median_ratio": round(statistics.median(per_round), 3),
            "head_median_sec": round(
                statistics.median(leg["head"][q] for leg in legs), 3),
            "r4_median_sec": round(
                statistics.median(leg["r4"][q] for leg in legs), 3),
        }
    report["paired"] = ratios
    path = os.path.join(HEAD, "tools", "ab_encode_r4_vs_head.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({q: ratios[q]["median_ratio"] for q in QUERIES}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
