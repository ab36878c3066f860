"""Like-for-like dedup_simhash datapoint (round-2 verdict item 5).

BENCH_r01's dedup_simhash (2.1s) ran `simhash_duplicates(documents)` over the
raw sf0.1 documents table with the UNCAPPED implementation; BENCH_r02 (4.5s)
ran the new seeded-family oracle workload with the hot-bucket cap. This tool
decomposes the delta by running BOTH workloads against the CURRENT (capped)
implementation back-to-back in one session:

  - r01 workload x current code  -> isolates the cap's overhead (vs 2.1s)
  - r02 workload x current code  -> reproduces the 4.5s point (same session)

Usage: python tools/simhash_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nospa_rdf_data_cube_validator_spark.operators import dedup  # noqa: E402
from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402


def loadavg() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="simhash-ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    import __spark_entry__ as entry_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    load_start = loadavg()

    # warm the Python workers once so neither side pays spin-up
    dedup.simhash_duplicates(docs.limit(200)).count()

    samples = []
    for r in range(rounds):
        t0 = time.time()
        n_r01 = dedup.simhash_duplicates(docs).count()
        r01_sec = time.time() - t0
        t0 = time.time()
        n_r02 = entry_mod.q_dedup_simhash(spark, sf_dir).count()
        r02_sec = time.time() - t0
        samples.append({"round": r, "r01_workload_sec": round(r01_sec, 3), "r02_workload_sec": round(r02_sec, 3)})

    print(
        json.dumps(
            {
                "metric": "simhash_ab",
                "sf_dir": sf_dir,
                "samples": samples,
                "r01_workload_best": min(s["r01_workload_sec"] for s in samples),
                "r02_workload_best": min(s["r02_workload_sec"] for s in samples),
                "r01_pairs": n_r01,
                "r02_pairs": n_r02,
                "loadavg_start": load_start,
                "loadavg_end": loadavg(),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
