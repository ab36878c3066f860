"""Measured prototype for ROADMAP item 1 (dictionary-encoding RDF terms).

Builds an ORDER-PRESERVING int64 term dictionary (global range-sort +
zipWithIndex, so min(id) == min(term) and every min()-based selection in
the validators stays exact), encodes the triples to (s_id, p_id, o_id),
and times the two dominant observation-scale plans both ways:

  1. the normalize-style full-output dedup,
  2. the IC-11/12 fused base (per-(subj, pred) aggregation).

Prints one JSON line with string-vs-encoded wall times + the encode cost,
so the ROADMAP decision stays tied to numbers. Not wired into the engine.

Usage: python tools/encode_prototype.py [n_convs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts  # noqa: E402
from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions  # noqa: E402
from nospa_rdf_data_cube_validator_spark.functions.linking import (  # noqa: E402
    alias_edges, canonicalize, link_mentions, resolve_aliases, surface_dict)
from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph  # noqa: E402


def order_preserving_dict(triples, parts=64):
    """(term string, id bigint) with id rank-ordered by term: a range
    repartition + within-partition sort makes the RDD globally ordered, and
    zipWithIndex assigns ids in that order — no single-partition window."""
    terms_ = (
        triples.select(F.col("subj").alias("term"))
        .unionByName(triples.select(F.col("pred").alias("term")))
        .unionByName(triples.select(F.col("obj").alias("term")))
        .distinct()
        .repartitionByRange(parts, "term")
        .sortWithinPartitions("term")
    )
    spark = triples.sparkSession
    rdd = terms_.rdd.map(lambda r: r["term"]).zipWithIndex()
    return spark.createDataFrame(rdd, "term string, id long")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 90000
    spark = get_spark(app_name="encode-proto", shuffle_partitions=64)
    tr = synth_transcripts(spark, n_convs=n_convs, base_turns=16, hot_convs=4, hot_turns=8000)
    canon = canonicalize(link_mentions(extract_mentions(tr), surface_dict(spark)),
                         resolve_aliases(alias_edges(spark)))
    triples = edges_to_graph(spark, canon).localCheckpoint(eager=True)
    n = triples.count()

    t0 = time.time()
    d = order_preserving_dict(triples).localCheckpoint(eager=True)
    n_terms = d.count()
    dict_sec = time.time() - t0

    t0 = time.time()
    enc = triples
    for col in ("subj", "pred", "obj"):
        enc = (
            enc.join(d.withColumnRenamed("term", col).withColumnRenamed("id", col + "_id"), col)
            .drop(col)
        )
    enc = enc.select("subj_id", "pred_id", "obj_id", "obj_kind").localCheckpoint(eager=True)
    n_enc = enc.count()
    encode_sec = time.time() - t0

    def timed(df, keys):
        t = time.time()
        df.dropDuplicates(keys).count()
        dedup = time.time() - t
        t = time.time()
        (df.groupBy(keys[0], keys[1]).agg(F.count("*").alias("n"), F.min(keys[2]).alias("m"))
           .groupBy(keys[0]).agg(F.count("*").alias("k")).count())
        agg = time.time() - t
        return dedup, agg

    s_dedup, s_agg = timed(triples, ["subj", "pred", "obj"])
    e_dedup, e_agg = timed(enc, ["subj_id", "pred_id", "obj_id"])
    print(json.dumps({
        "n_triples": n, "n_terms": n_terms, "n_enc": n_enc,
        "dict_sec": round(dict_sec, 2), "encode_sec": round(encode_sec, 2),
        "dedup_sec": {"strings": round(s_dedup, 2), "encoded": round(e_dedup, 2)},
        "ic_agg_sec": {"strings": round(s_agg, 2), "encoded": round(e_agg, 2)},
        "dedup_speedup": round(s_dedup / max(e_dedup, 1e-9), 2),
        "agg_speedup": round(s_agg / max(e_agg, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
