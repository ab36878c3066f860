"""Per-stage N-vs-4N scaling: separates the compute-bound stage (Arrow
extraction — the 100 TB bottleneck) from the shuffle-bound stage (normalize
set-dedup), because the shared box caps them differently (BENCH.md §0:
raw-CPU ceiling 3.21x, memory-bus/shuffle ceiling ~2x from 8->32 threads).

Usage: python tools/stage_scaling.py [n_convs] [repeats]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from nospa_rdf_data_cube_validator_spark.session import get_spark
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts
from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
from nospa_rdf_data_cube_validator_spark.functions.linking import (
    alias_edges, canonicalize, link_mentions, resolve_aliases, surface_dict)
from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph
from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

cores = int(sys.argv[1]); n_convs = int(sys.argv[2])
spark = get_spark(app_name=f"stage-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
tr = synth_transcripts(spark, n_convs=n_convs, base_turns=16, hot_convs=4, hot_turns=8000)
tr = tr.localCheckpoint(eager=True)
n_turns = tr.count()
# warm the python workers so worker-boot cost is excluded from both levels
extract_mentions(tr.limit(50000)).count()

t0 = time.time()
n_mentions = extract_mentions(tr).count()
extract_sec = time.time() - t0

canon = canonicalize(link_mentions(extract_mentions(tr), surface_dict(spark)),
                     resolve_aliases(alias_edges(spark)))
triples = edges_to_graph(spark, canon).localCheckpoint(eager=True)
n_triples = triples.count()
t1 = time.time()
norm = normalize(TripleStore(triples))
n_norm = norm.df.count()
shuffle_sec = time.time() - t1
print(json.dumps({{"cores": cores, "n_turns": n_turns, "n_mentions": n_mentions,
                  "extract_sec": round(extract_sec, 2),
                  "extract_turns_per_sec": round(n_turns / extract_sec, 1),
                  "n_triples": n_triples, "n_norm": n_norm,
                  "shuffle_sec": round(shuffle_sec, 2),
                  "shuffle_triples_per_sec": round(n_triples / shuffle_sec, 1)}}))
"""


def run(cores: int, n_convs: int, repo: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "48g")  # see scaling_bench.run
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo), str(cores), str(n_convs)],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker cores={cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 90000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run(8, n_convs, repo))
        hi_runs.append(run(32, n_convs, repo))
    lo_e = max(lo_runs, key=lambda r: r["extract_turns_per_sec"])
    hi_e = max(hi_runs, key=lambda r: r["extract_turns_per_sec"])
    lo_s = max(lo_runs, key=lambda r: r["shuffle_triples_per_sec"])
    hi_s = max(hi_runs, key=lambda r: r["shuffle_triples_per_sec"])
    print(json.dumps({
        "extract": {"low": lo_e["extract_turns_per_sec"], "high": hi_e["extract_turns_per_sec"],
                    "speedup": round(hi_e["extract_turns_per_sec"] / lo_e["extract_turns_per_sec"], 3),
                    "efficiency": round(hi_e["extract_turns_per_sec"] / lo_e["extract_turns_per_sec"] / 4, 3)},
        "normalize_dedup": {"low": lo_s["shuffle_triples_per_sec"], "high": hi_s["shuffle_triples_per_sec"],
                            "speedup": round(hi_s["shuffle_triples_per_sec"] / lo_s["shuffle_triples_per_sec"], 3),
                            "efficiency": round(hi_s["shuffle_triples_per_sec"] / lo_s["shuffle_triples_per_sec"] / 4, 3)},
        "all": {"low": lo_runs, "high": hi_runs},
    }))


if __name__ == "__main__":
    main()
