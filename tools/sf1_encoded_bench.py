"""sf1-class validate-only bench: string engine vs dictionary-encoded engine.

The encoded engine's claimed win (plans/encoding.py docstring) is on the
VALIDATE side at reference scale — the reference's own headline is 540K-obs /
"million level" cubes (README.md:15,91-97), while the per-round sf0.1 bench
(182K obs) is construction-dominated and measures the two engines neutral.
This tool builds a ~1-2M-obs cube ONCE, materializes both at-rest forms
(string triples; int64 dictionary-encoded triples), then times validate-only
(normalize excluded — both engines validate the same normalized logical cube)
for each, interleaved A/B within one session so box noise hits both sides.

Usage: python tools/sf1_encoded_bench.py [n_convs] [rounds]
Prints one JSON line with per-round times, obs/s, and loadavg context.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions  # noqa: E402
from nospa_rdf_data_cube_validator_spark.functions.linking import (  # noqa: E402
    alias_edges,
    canonicalize,
    link_mentions,
    resolve_aliases,
    surface_dict,
)
from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize  # noqa: E402
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator  # noqa: E402
from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph  # noqa: E402
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore  # noqa: E402
from nospa_rdf_data_cube_validator_spark.plans.encoding import encode_store  # noqa: E402
from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts  # noqa: E402


def loadavg() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def validate_only(store) -> tuple[float, int, int]:
    t0 = time.time()
    v = CubeValidator(store)
    n11 = v.ic11().count()
    n12 = v.ic12().count()
    sec = time.time() - t0
    v.unpersist()
    return sec, n11, n12


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 55_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sf1-encoded-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g")},
    )
    load_start = loadavg()

    tr = synth_transcripts(spark, n_convs=n_convs, base_turns=8, hot_convs=3, hot_turns=4000)
    mentions = extract_mentions(tr)
    linked = link_mentions(mentions, surface_dict(spark))
    canon = canonicalize(linked, resolve_aliases(alias_edges(spark)))
    triples = edges_to_graph(spark, canon)

    # one normalized logical cube; both engines validate exactly this
    t0 = time.time()
    s_store = normalize(TripleStore(triples))
    s_store.df = s_store.df.localCheckpoint(eager=True)
    n_triples = s_store.df.count()
    build_sec = time.time() - t0
    n_obs = s_store.df.where(
        F.col("pred") == "http://purl.org/linked-data/cube#dataSet"
    ).count()

    t0 = time.time()
    e_store = encode_store(s_store)
    e_store.df = e_store.df.localCheckpoint(eager=True)
    e_store.df.count()
    encode_sec = time.time() - t0

    # interleaved A/B with ALTERNATING order per round (JIT/GC warm-up and
    # co-tenant noise would otherwise bias whichever side runs first); round
    # 0 is a discarded warm-up for both engines.
    validate_only(s_store)
    validate_only(e_store)
    samples = []
    for r in range(rounds):
        if r % 2 == 0:
            s_sec, s11, s12 = validate_only(s_store)
            e_sec, e11, e12 = validate_only(e_store)
        else:
            e_sec, e11, e12 = validate_only(e_store)
            s_sec, s11, s12 = validate_only(s_store)
        assert (s11, s12) == (e11, e12), f"violation counts diverged: {(s11, s12)} vs {(e11, e12)}"
        samples.append(
            {"round": r, "string_sec": round(s_sec, 3), "encoded_sec": round(e_sec, 3)}
        )

    import statistics

    best_s = min(s["string_sec"] for s in samples)
    best_e = min(s["encoded_sec"] for s in samples)
    med_s = statistics.median(s["string_sec"] for s in samples)
    med_e = statistics.median(s["encoded_sec"] for s in samples)
    print(
        json.dumps(
            {
                "metric": "sf1_validate_only",
                "n_convs": n_convs,
                "n_triples": n_triples,
                "n_obs": n_obs,
                "build_sec": round(build_sec, 3),
                "encode_sec": round(encode_sec, 3),
                "samples": samples,
                "string_best_sec": best_s,
                "encoded_best_sec": best_e,
                "string_median_sec": med_s,
                "encoded_median_sec": med_e,
                "string_obs_per_sec": round(n_obs / best_s),
                "encoded_obs_per_sec": round(n_obs / best_e),
                "speedup_best": round(best_s / best_e, 3),
                "speedup_median": round(med_s / med_e, 3),
                "loadavg_start": load_start,
                "loadavg_end": loadavg(),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
