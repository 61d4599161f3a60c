"""Scaling experiment matrix for the 8->32 gap (round-3 verdict item 6).

Runs bench_scaling's child job at local[8] and local[32] under
candidate configurations, alternating variants so host-noise waves hit
them all alike, and prints one JSON line per variant plus a ranking.

Context: tools/kernel_ceiling.py shows the raw encode kernel scales
~0.72 from 8->32 processes on this host, while the engine's raw pair
was 0.43 — so ~40%% of the shortfall is Spark-attributable. Candidate
causes: shuffle codec CPU, 2-wave task quantization (64 tasks over 32
slots), straggler tails on an overcommitted VM.

Usage: python tools/scaling_experiments.py [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import _ensure_fixture, measure  # noqa: E402

VARIANTS: dict[str, dict] = {
    "baseline": {},
    # 4 waves at 32 slots: smooths stragglers, halves wave quantization
    "parts128": {"SCALING_PARTS": "128"},
    # shuffle bytes live in /dev/shm; skip the lz4 encode/decode CPU
    "nocompress": {"SCALING_CONF": json.dumps({
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false"})},
    "parts128_nocompress": {
        "SCALING_PARTS": "128",
        "SCALING_CONF": json.dumps({
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false"})},
}


def main() -> int:
    rounds = 2
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    _ensure_fixture()
    best: dict[str, dict[int, dict]] = {v: {} for v in VARIANTS}
    for _ in range(rounds):
        for name, env in VARIANTS.items():
            os.environ.pop("SCALING_PARTS", None)
            os.environ.pop("SCALING_CONF", None)
            os.environ.update(env)
            for cpus in (8, 32):
                r = measure(cpus, runs=2)
                if cpus not in best[name] or r["sec"] < best[name][cpus]["sec"]:
                    best[name][cpus] = r
    ranked = []
    for name in VARIANTS:
        lo, hi = best[name][8], best[name][32]
        eff = round(hi["rows_per_sec"] / (4 * lo["rows_per_sec"]), 3)
        row = {"variant": name, "sec8": lo["sec"], "sec32": hi["sec"],
               "mb32": hi["mb_in_per_sec"], "eff_8to32": eff}
        ranked.append(row)
        print(json.dumps(row), flush=True)
    ranked.sort(key=lambda r: -r["eff_8to32"])
    print(json.dumps({"winner": ranked[0]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
