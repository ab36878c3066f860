"""Capture .explain('formatted') output for the round-6 optimization
evidence (plans/r06/<query>_<suffix>.txt).

Usage: python tools/capture_plans_r06.py <suffix> [query ...]

Covers both declared queries() entries and named internal stages of the
cube bench path (prefix 'stage:'). Streaming/bucketed-table queries are
skipped unless explicitly named (they execute side effects on build).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from pyspark.sql import functions as F
from nospa_rdf_data_cube_validator_spark.session import get_spark

DEFAULT = [
    "kg_mentions", "kg_triples", "dedup_minhash", "dedup_simhash",
    "ann_topk", "closure", "ic12_duplicates", "multimodal",
    "events_sessionize", "cube_ic11", "cube_ic12", "enc_cube_ic12",
    "stage:cube_normalized", "stage:cube_ic11", "stage:cube_ic12",
]


def stage_df(spark, sf_dir, name):
    from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize
    from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
    from nospa_rdf_data_cube_validator_spark.pipeline import edges_to_graph
    from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
    from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
    from nospa_rdf_data_cube_validator_spark.functions.linking import (
        alias_edges, canonicalize, link_mentions, resolve_aliases, surface_dict,
    )
    from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts

    tr = synth_transcripts(spark, n_convs=1000, base_turns=8, hot_convs=3, hot_turns=400)
    mentions = extract_mentions(tr)
    linked = link_mentions(mentions, surface_dict(spark))
    canon = canonicalize(linked, resolve_aliases(alias_edges(spark)))
    triples = edges_to_graph(spark, canon)
    store = TripleStore(triples)
    if name == "stage:cube_construct":
        return store.df
    store.df = store.df.localCheckpoint(eager=True)
    normalized = normalize(store)
    if name == "stage:cube_normalized":
        return normalized.df
    normalized.df = normalized.df.localCheckpoint(eager=True)
    v = CubeValidator(normalized)
    if name == "stage:cube_ic11":
        return v.ic11()
    if name == "stage:cube_ic12":
        return v.ic12()
    raise KeyError(name)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = em.queries()
    for name in names:
        df = stage_df(spark, sf_dir, name) if name.startswith("stage:") else qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        fname = name.replace("stage:cube_", "cube_stage_") + f"_{suffix}.txt"
        with open(os.path.join(out_dir, fname), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {fname} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
