"""Multi-process N-vs-4N sample for the AT-REST validate-many path:
1 vs 4 taskset-pinned local[8] JVMs on disjoint 8-core sets, each running
CubeValidator hot path (IC-11/12) + full validate_all() straight off the
prepped bucketed cube (shared read-only warehouse; every worker
re-registers the table into its own in-memory catalog via run_table's
cross-session path — no rebuild, validation only).

This is the closest honest stand-in for 1 vs 4 *executors* on this box
(threads in one JVM share a heap, one GC and one memory bus; pinned
processes multiply heap + GC; the memory bus stays shared, which a real
cluster would also multiply — see BENCH_SCALING.md). The workload models
the validate-many deployment: independent validation jobs over at-rest
cubes, the unit a 1000-executor cluster schedules thousands of.

Aggregate-throughput efficiency = sum(quad rates) / (4 * solo rate).

Usage: python tools/multiproc_atrest.py [n_convs] [max_load1] [max_load5]
(quiet-gated; prep is cached per n_convs by tools/atrest_scaling.py)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.atrest_scaling import PREP, WORKER, _load  # noqa: E402

CORE_SETS = ["0-7", "8-15", "16-23", "24-31"]


def _spawn(worker: str, cores_list: str) -> subprocess.Popen:
    # stderr to a FILE, not a pipe: four concurrent JVMs logging into
    # 64KB pipes drained only after the run would block on write and
    # inflate the measured walls
    errf = open(f"/tmp/multiproc_atrest_err_{cores_list}.log", "w")
    p = subprocess.Popen(
        ["taskset", "-c", cores_list, sys.executable, "-c", worker, "8"],
        stdout=subprocess.PIPE,
        stderr=errf,
        text=True,
    )
    p._errpath = errf.name  # type: ignore[attr-defined]
    return p


def _collect(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    if p.returncode != 0:
        raise RuntimeError(open(p._errpath).read()[-3000:])  # type: ignore[attr-defined]
    return json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 90000
    max1 = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    max5 = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    l1, l5 = _load()
    if l1 > max1 or l5 > max5:
        print(json.dumps({"skipped": True, "load1": l1, "load5": l5}))
        return
    workdir = f"/tmp/atrest_scaling_{n_convs}"
    warehouse = os.path.join(workdir, "warehouse")
    fmt = dict(repo=REPO, workdir=workdir, warehouse=warehouse, n_convs=n_convs)
    if not os.path.exists(os.path.join(workdir, "_MANIFEST.json")):
        out = subprocess.run(
            [sys.executable, "-c", PREP.format(**fmt)], capture_output=True, text=True
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-3000:])
    # SPARK_ATREST_PRIVATE_COPIES=1: give each quad worker its OWN copy of
    # the workdir+warehouse — a controlled experiment separating shared-file
    # /page-cache contention from shared-memory-bus contention (the bus
    # stays shared either way; unchanged quad walls with private copies
    # confirm the bus as the binding resource)
    private = os.environ.get("SPARK_ATREST_PRIVATE_COPIES") == "1"
    import shutil

    worker_scripts = []
    for i in range(len(CORE_SETS)):
        wd_i = workdir
        if private and i > 0:
            wd_i = f"{workdir}_copy{i}"
            if not os.path.exists(wd_i):
                shutil.copytree(workdir, wd_i)
                # the manifest records ABSOLUTE snapshot/table locations;
                # left as-is the copy would re-register its bucketed table
                # over the ORIGINAL warehouse files and the isolation would
                # be fictional (round-5 review finding) — repoint every
                # path into the copy
                mp = os.path.join(wd_i, "_MANIFEST.json")
                with open(mp) as fh:
                    manifest_txt = fh.read()
                with open(mp, "w") as fh:
                    fh.write(manifest_txt.replace(workdir, wd_i))
        worker_scripts.append(
            WORKER.format(repo=REPO, workdir=wd_i,
                          warehouse=os.path.join(wd_i, "warehouse"),
                          n_convs=n_convs)
        )
    l1p, _ = _load()
    solo = _collect(_spawn(worker_scripts[0], CORE_SETS[0]))
    l1b, _ = _load()
    quad = [
        _collect(p)
        for p in [_spawn(w, cs) for w, cs in zip(worker_scripts, CORE_SETS)]
    ]
    l1c, _ = _load()
    for q in quad:
        if q["violations"] != solo["violations"]:
            raise RuntimeError(f"divergent results: {q} vs {solo}")
    agg_hot = sum(q["hot_triples_per_sec"] for q in quad)
    agg_full = sum(q["triples_per_sec"] for q in quad)
    obs = {
        "multiproc_atrest": {
            "n_convs": n_convs,
            "private_copies": private,
            "loads": {"before": l1, "after_prep": l1p, "mid": l1b, "after": l1c},
            "solo": solo,
            "quad": quad,
            "outputs_identical": True,
            "hot_agg_efficiency": round(agg_hot / (4 * solo["hot_triples_per_sec"]), 3),
            "full_agg_efficiency": round(agg_full / (4 * solo["triples_per_sec"]), 3),
        }
    }
    with open(os.path.join(REPO, "tools", "scaling_samples.jsonl"), "a") as fh:
        fh.write(json.dumps(obs) + "\n")
    print(json.dumps(obs))


if __name__ == "__main__":
    main()
