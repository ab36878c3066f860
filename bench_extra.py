"""Extra measurement harness for the optimization round (guide §1.4/§1.5).

NOT the driver contract — bench.py stays frozen. This file isolates each
headline query and each stage of the cube pipeline with the noop sink
(forces every column of every row, unlike count() which lets the optimizer
prune), labels jobs, and records per-query shuffle bytes.

Usage:
  python bench_extra.py [queries|cube|all] [repeat]

Prints one JSON line per timed item: {"item": ..., "sec": ..., "shuffle_read": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench import shuffle_totals  # noqa: E402
from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, sink=noop):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    pre = shuffle_totals(spark)
    out = fn()
    if out is not None:
        sink(out)
    post = shuffle_totals(spark)
    sec = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"item": name, "sec": sec, "shuffle_read": post[0] - pre[0]}), flush=True)
    return sec


def warm(spark):
    w = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    w.mapInPandas(lambda it: it, schema=w.schema).count()
    for t in ("orders", "lineitem", "documents", "embeddings", "events", "customer"):
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.select([F.count(c) for c in df.columns]).collect()


def bench_queries(spark, repeat=1):
    qs = entry_mod.queries()
    names = [
        "kg_triples", "ic12_duplicates", "path_join", "window_top1", "closure",
        "dedup_minhash", "dedup_simhash", "ann_topk", "text_quality",
        "multimodal", "events_sessionize",
    ]
    for r in range(repeat):
        for name in names:
            timed(spark, f"q:{name}#{r}", lambda n=name: qs[n](spark, SF_DIR))


def bench_cube_stages(spark):
    """Per-stage breakdown of bench.py::bench_cube_validation."""
    from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
    from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
    from nospa_rdf_data_cube_validator_spark.functions.linking import (
        alias_edges, canonicalize, link_mentions, resolve_aliases, surface_dict,
    )
    from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts

    sf = 0.1
    n_convs = max(200, int(sf * 100000))
    tr = synth_transcripts(spark, n_convs=n_convs, base_turns=8, hot_convs=3, hot_turns=4000)
    timed(spark, "cube:transcripts", lambda: tr)
    mentions = extract_mentions(tr)
    timed(spark, "cube:mentions", lambda: mentions)
    linked = link_mentions(mentions, surface_dict(spark))
    timed(spark, "cube:linked", lambda: linked)
    canon = canonicalize(linked, resolve_aliases(alias_edges(spark)))
    triples = edges_to_graph(spark, canon)
    store = TripleStore(triples)
    timed(spark, "cube:construct_checkpoint",
          lambda: store.__setattr__("df", store.df.localCheckpoint(eager=True)))
    timed(spark, "cube:construct_count", lambda: None, sink=lambda _: None) \
        if False else None
    t0 = time.time()
    n_triples = store.df.count()
    print(json.dumps({"item": "cube:count", "sec": round(time.time() - t0, 3),
                      "n_triples": n_triples}), flush=True)
    normalized = normalize(store)
    timed(spark, "cube:normalize_checkpoint",
          lambda: normalized.__setattr__("df", normalized.df.localCheckpoint(eager=True)))
    v = CubeValidator(normalized)
    timed(spark, "cube:n_obs",
          lambda: normalized.df.where(F.col("pred") == "http://purl.org/linked-data/cube#dataSet"),
          )
    timed(spark, "cube:ic11", lambda: v.ic11())
    timed(spark, "cube:ic12", lambda: v.ic12())
    v.unpersist()

    from nospa_rdf_data_cube_validator_spark.plans.encoding import encode_store
    from nospa_rdf_data_cube_validator_spark.sources.rdf import write_bucketed

    enc_holder = {}

    def do_encode():
        enc = encode_store(normalized, parts=spark.sparkContext.defaultParallelism)
        enc.df = enc.df.localCheckpoint(eager=True)
        enc_holder["enc"] = enc
        return None

    timed(spark, "cube:encode_store", do_encode, sink=lambda _: None)
    enc = enc_holder["enc"]
    v_enc = CubeValidator(enc)
    timed(spark, "cube:enc_ic12", lambda: v_enc.ic12())
    v_enc.unpersist()

    spark.sql("DROP TABLE IF EXISTS benchx_cube_atrest")
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "benchx_cube_atrest"), ignore_errors=True)
    timed(spark, "cube:write_bucketed",
          lambda: write_bucketed(enc.df, "benchx_cube_atrest",
                                 buckets=spark.sparkContext.defaultParallelism),
          sink=lambda _: None)
    enc.df = spark.table("benchx_cube_atrest")
    v2 = CubeValidator(enc)
    timed(spark, "cube:atrest_ic11", lambda: v2.ic11())
    timed(spark, "cube:atrest_ic12", lambda: v2.ic12())
    v2.unpersist()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(
        app_name="nospa-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    warm(spark)
    print(json.dumps({"item": "loadavg_start", "sec": round(os.getloadavg()[0], 2)}), flush=True)
    if mode in ("queries", "all"):
        bench_queries(spark, repeat)
    if mode in ("cube", "all"):
        bench_cube_stages(spark)


if __name__ == "__main__":
    main()
