"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the KG-construction pipeline (extract->link->canonicalize),
the IC-11/12 hot path over a cube built from synthetic transcripts at a
size proportional to sf, and the heaviest relational/dedup/similarity
operators. Each timing forces full computation via count().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize  # noqa: E402
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator  # noqa: E402
from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph  # noqa: E402
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore  # noqa: E402
from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions  # noqa: E402
from nospa_rdf_data_cube_validator_spark.functions.linking import (  # noqa: E402
    alias_edges,
    canonicalize,
    link_mentions,
    resolve_aliases,
    surface_dict,
)
from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts  # noqa: E402

HEADLINE = [
    "kg_triples",
    "ic12_duplicates",
    "path_join",
    "window_top1",
    "closure",
    "dedup_minhash",
    "dedup_simhash",
    "ann_topk",
    "text_quality",
    "multimodal",
    "events_sessionize",
]


def bench_cube_validation(spark, sf: float) -> tuple[float, dict]:
    """Build a KG cube from synthetic transcripts (~1M turns/sf unit) and run
    the IC-11/12 hot path — the reference's >99%-of-runtime operator."""
    n_convs = max(200, int(sf * 100000))
    tr = synth_transcripts(spark, n_convs=n_convs, base_turns=8, hot_convs=3, hot_turns=4000)
    mentions = extract_mentions(tr)
    linked = link_mentions(mentions, surface_dict(spark))
    canon = canonicalize(linked, resolve_aliases(alias_edges(spark)))
    triples = edges_to_graph(spark, canon)
    store = TripleStore(triples)
    t0 = time.time()
    store.df = store.df.localCheckpoint(eager=True)  # materialize construction
    n_triples = store.df.count()
    normalized = normalize(store)
    normalized.df = normalized.df.localCheckpoint(eager=True)
    build_sec = time.time() - t0  # construction + normalization materialized
    v = CubeValidator(normalized)
    t1 = time.time()
    n_obs = normalized.df.where(F.col("pred") == "http://purl.org/linked-data/cube#dataSet").count()
    n11 = v.ic11().count()
    n12 = v.ic12().count()
    validate_sec = time.time() - t1
    v.unpersist()  # release the validator's obs-scale caches before the next bench

    # At-rest validate-many (the 100 TB deployment shape and run_pipeline's
    # DEFAULT): encode + bucket ONCE (amortized over every later validation
    # run, so timed separately), then time the same hot path straight off
    # the table — its HashPartitioning(subj) plans carry no observation-
    # scale Exchange. Reported in stats only; NOT added to the headline
    # total, which stays comparable across rounds.
    from nospa_rdf_data_cube_validator_spark.plans.encoding import encode_store
    from nospa_rdf_data_cube_validator_spark.sources.rdf import write_bucketed

    t2 = time.time()
    enc = encode_store(normalized, parts=spark.sparkContext.defaultParallelism)
    # a previous SESSION's managed-table dir survives the in-memory catalog
    # (on-disk warehouse): drop both before re-creating, as run_table does
    spark.sql("DROP TABLE IF EXISTS bench_cube_atrest")
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "bench_cube_atrest"), ignore_errors=True)
    write_bucketed(enc.df, "bench_cube_atrest", buckets=spark.sparkContext.defaultParallelism)
    enc.df = spark.table("bench_cube_atrest")
    encode_sec = time.time() - t2
    v2 = CubeValidator(enc)
    t3 = time.time()
    a11 = v2.ic11().count()
    a12 = v2.ic12().count()
    atrest_sec = time.time() - t3
    v2.unpersist()
    if (a11, a12) != (n11, n12):  # at-rest path must agree with in-memory
        raise RuntimeError(f"at-rest IC mismatch: {(a11, a12)} != {(n11, n12)}")

    stats = {
        "n_triples": n_triples,
        "n_obs": n_obs,
        "ic11": n11,
        "ic12": n12,
        "build_sec": round(build_sec, 3),
        "validate_sec": round(validate_sec, 3),
        "obs_per_sec": round(n_obs / max(validate_sec, 1e-9)),
        "triples_per_sec": round(n_triples / max(build_sec + validate_sec, 1e-9)),
        "atrest_encode_bucket_sec": round(encode_sec, 3),
        "atrest_validate_sec": round(atrest_sec, 3),
        "atrest_obs_per_sec": round(n_obs / max(atrest_sec, 1e-9)),
    }
    return build_sec + validate_sec, stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    spark = get_spark(
        app_name="nospa-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    queries = entry_mod.queries()
    # Warm the session before timing: boot the Arrow Python workers and
    # fault the parquet data pages in. The headline measures steady-state
    # query throughput; JVM/worker cold-start is a per-session constant
    # that the first-listed query would otherwise absorb (~8s at local[32]).
    # NOTE: count() alone would read only footers — aggregate a real column
    # so the column chunks actually hit the page cache.
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.mapInPandas(lambda it: it, schema=warm.schema).count()
    for t in ("orders", "lineitem", "documents", "embeddings", "events", "customer"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.select([F.count(c) for c in df.columns]).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    cube_sec, cube_stats = bench_cube_validation(spark, sf)
    timings["cube_build_validate"] = round(cube_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "cube": cube_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
