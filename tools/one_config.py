"""Measure ONE scaling config (local[8] or local[32]) in a verified-quiet
window: waits up to --wait seconds for 1-min loadavg < threshold, runs the
end-to-end job once, and records the loadavg before/after so samples taken
during an external-tenant spike can be rejected (load_after is expected to
be ~ own core count; anything well above means contention). Appends to
tools/scaling_samples.jsonl.

Usage: python tools/one_config.py <cores> [n_convs] [wait_sec] [quiet_thresh]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.scaling_bench import run  # noqa: E402


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cores = int(sys.argv[1])
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 90000
    wait = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    t0 = time.time()
    while load1() > thresh:
        if time.time() - t0 > wait:
            print(json.dumps({"skipped": True, "load1": load1()}))
            return
        time.sleep(20)
    before = load1()
    res = run(cores, n_convs, repo)
    after = load1()
    # own job pushes the 1-min average toward ~cores; beyond that = tenants
    obs = {"ts": time.time(), "cores": cores, "load_before": before,
           "load_after": after, "tainted": after > cores + 4, **res}
    with open(os.path.join(repo, "tools", "scaling_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(obs) + "\n")
    print(json.dumps(obs))


if __name__ == "__main__":
    main()
