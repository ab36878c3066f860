"""N-vs-4N EXECUTOR scaling, emulated the honest way: independent JVMs.

Threads in one JVM share a heap, a GC, and one memory bus — measured on
this box, the end-to-end job stops scaling past ~8 threads (local[32] is
no faster than local[8] even on an idle box), while the same job's
map-heavy stages scale to ~93% of the box's own hardware ceiling. Real
executors bring their own heap/GC/bus, so the closest sandbox emulation of
"N executors -> 4N executors" is N independent local[8] PROCESSES:

  P=1: one local[8] JVM processes a shard (wall T1)
  P=4: four concurrent local[8] JVMs process one equal shard each (T4 =
       max of the four walls)

Per-shard work is identical, so the north criterion's
(throughput@4N / throughput@N) / 4 reduces to T1 / T4 (4x the aggregate
input in T4 vs 1x in T1). Each worker times only the steady-state region
(input materialized + Python workers warmed first, as executors would be).

Usage: python tools/multiproc_scaling.py [shard_convs] [cores_each] [quiet_thresh]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.scaling_bench import WORKER  # noqa: E402


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def spawn(cores: int, n_convs: int, repo: str, cpu_set: str | None = None) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "12g")
    cmd = [sys.executable, "-c", WORKER.format(repo=repo), str(cores), str(n_convs)]
    if cpu_set is not None:
        # pin the whole JVM+Python-worker tree to its own CPU set: without
        # this every JVM sizes GC/compiler/shuffle pools for ALL visible
        # CPUs (availableProcessors=32) and four co-located workers
        # oversubscribe the box ~4x (measured: 8x slowdown). Pinning is
        # also the truest emulation of executors on separate machines.
        cmd = ["taskset", "-c", cpu_set] + cmd
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )


def collect(procs: list[subprocess.Popen]) -> list[dict]:
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=2000)
        lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"worker failed:\n{stderr[-2000:]}")
        outs.append(json.loads(lines[-1]))
    return outs


def wait_quiet(thresh: float, max_wait: int = 240) -> float:
    t0 = time.time()
    while load1() > thresh and time.time() - t0 < max_wait:
        time.sleep(15)
    return load1()

def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shard = int(sys.argv[1]) if len(sys.argv) > 1 else 22500
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sets = [f"{i * cores}-{(i + 1) * cores - 1}" for i in range(4)]
    l_a = wait_quiet(thresh)
    solo = collect([spawn(cores, shard, repo, sets[0])])[0]
    l_b = wait_quiet(thresh)
    t0 = time.time()
    quad = collect([spawn(cores, shard, repo, sets[i]) for i in range(4)])
    l_c = load1()
    t4 = max(r["wall_sec"] for r in quad)
    eff = solo["wall_sec"] / t4
    result = {
        "shard_convs": shard, "cores_each": cores,
        "loads": {"before_solo": l_a, "before_quad": l_b, "after_quad": l_c},
        "solo_wall": solo["wall_sec"], "quad_walls": [r["wall_sec"] for r in quad],
        "quad_window_sec": round(time.time() - t0, 2),
        "agg_throughput_solo": solo["triples_per_sec"],
        "agg_throughput_quad": round(sum(r["triples_per_sec"] for r in quad), 1),
        "n_triples_each": solo["n_triples"],
        "outputs_identical": len({(r["n_triples"], r["ic11"], r["ic12"]) for r in quad + [solo]}) == 1,
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8",
        "pass": eff >= 0.8,
    }
    with open(os.path.join(repo, "tools", "scaling_samples.jsonl"), "a") as fh:
        fh.write(json.dumps({"multiproc": result}) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
