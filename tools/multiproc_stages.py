"""Per-stage multi-process scaling: times the CPU-bound stage (Arrow
extraction) and the bandwidth-bound stage (normalize set-dedup) separately,
solo vs 4 pinned co-located JVMs. Separates 'this plan doesn't scale' from
'this BOX stops supplying bytes' — the distinction the N->4N-executor
criterion turns on, since real executors add a memory bus per node.

Usage: python tools/multiproc_stages.py [shard_convs] [cores_each] [quiet]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.multiproc_scaling import load1, wait_quiet  # noqa: E402

STAGE_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from nospa_rdf_data_cube_validator_spark.session import get_spark
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts
from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
from nospa_rdf_data_cube_validator_spark.functions.linking import (
    alias_edges, canonicalize, link_mentions, resolve_aliases, surface_dict)
from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph
from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

cores = int(sys.argv[1]); n_convs = int(sys.argv[2])
spark = get_spark(app_name=f"mstage-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
tr = synth_transcripts(spark, n_convs=n_convs, base_turns=16, hot_convs=4,
                       hot_turns=8000).localCheckpoint(eager=True)
n_turns = tr.count()
extract_mentions(tr.limit(50000)).count()   # warm python workers
t0 = time.time(); n_m = extract_mentions(tr).count(); extract_sec = time.time() - t0
canon = canonicalize(link_mentions(extract_mentions(tr), surface_dict(spark)),
                     resolve_aliases(alias_edges(spark)))
triples = edges_to_graph(spark, canon).localCheckpoint(eager=True)
n_triples = triples.count()
t1 = time.time(); n_norm = normalize(TripleStore(triples)).df.count()
shuffle_sec = time.time() - t1
print(json.dumps({{"cores": cores, "n_turns": n_turns,
                  "extract_sec": round(extract_sec, 2),
                  "extract_rate": round(n_turns / extract_sec, 1),
                  "n_triples": n_triples,
                  "shuffle_sec": round(shuffle_sec, 2),
                  "shuffle_rate": round(n_triples / shuffle_sec, 1)}}))
"""


def spawn(cores: int, n_convs: int, repo: str, cpu_set: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "12g")
    return subprocess.Popen(
        ["taskset", "-c", cpu_set, sys.executable, "-c",
         STAGE_WORKER.format(repo=repo), str(cores), str(n_convs)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )


def collect(procs):
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=2000)
        lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"worker failed:\n{stderr[-2000:]}")
        outs.append(json.loads(lines[-1]))
    return outs


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shard = int(sys.argv[1]) if len(sys.argv) > 1 else 45000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sets = [f"{i * cores}-{(i + 1) * cores - 1}" for i in range(4)]
    l_a = wait_quiet(thresh)
    solo = collect([spawn(cores, shard, repo, sets[0])])[0]
    l_b = wait_quiet(thresh)
    quad = collect([spawn(cores, shard, repo, sets[i]) for i in range(4)])
    l_c = load1()
    out = {
        "shard_convs": shard,
        "loads": {"before_solo": l_a, "before_quad": l_b, "after_quad": l_c},
        "solo": solo,
        "quad": quad,
        "extract_agg_eff": round(
            sum(r["extract_rate"] for r in quad) / solo["extract_rate"] / 4, 3),
        "shuffle_agg_eff": round(
            sum(r["shuffle_rate"] for r in quad) / solo["shuffle_rate"] / 4, 3),
    }
    with open(os.path.join(repo, "tools", "scaling_samples.jsonl"), "a") as fh:
        fh.write(json.dumps({"multiproc_stages": out}) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
