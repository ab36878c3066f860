"""Bench-scale Structured Streaming demo (ROADMAP item: streaming e2e).

Feeds sf-scale synthetic transcripts through the file-source stream in
N-file micro-batches, materializes KG edges via the idempotent
batch_id-partitioned foreachBatch sink with per-micro-batch lineage, folds
the lineage into the batch pipeline's manifest (record_stream_stage), and
verifies STREAM/BATCH EQUIVALENCE: the streamed edge set must equal what
the batch operators produce on the identical input (one code path, two
execution modes — the foundation of the lambda-free design).

Usage: python tools/streaming_demo.py [n_convs] [n_shards]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
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
from nospa_rdf_data_cube_validator_spark.session import get_spark  # noqa: E402
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts  # noqa: E402
from nospa_rdf_data_cube_validator_spark.streaming.ingest import (  # noqa: E402
    record_stream_stage,
    stream_transcripts,
    streaming_kg_materialize,
)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="streaming-demo", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    base = "/tmp/streaming_demo"
    shutil.rmtree(base, ignore_errors=True)
    feed, out, ckpt, lineage, wd = (os.path.join(base, d) for d in
                                    ("feed", "out", "ckpt", "lineage", "wd"))

    tr = synth_transcripts(spark, n_convs=n_convs, base_turns=8, hot_convs=3, hot_turns=2000)
    tr.repartition(n_shards).write.parquet(feed)
    n_turns = spark.read.parquet(feed).count()

    t0 = time.time()
    stream = stream_transcripts(spark, feed, max_files=1)  # 1 file per micro-batch
    q = streaming_kg_materialize(spark, stream, out, ckpt, lineage_dir=lineage).start()
    q.awaitTermination()
    stream_sec = time.time() - t0

    stage = record_stream_stage(spark, wd, "kg_edges_streamed", out, lineage)

    # batch twin on the identical input; sets must be EQUAL
    batch_edges = (
        canonicalize(
            link_mentions(extract_mentions(spark.read.parquet(feed)), surface_dict(spark)),
            resolve_aliases(alias_edges(spark)),
        )
        .select(
            F.col("subj_entity").alias("subj"),
            F.col("rel").alias("pred"),
            F.col("obj_entity").alias("obj"),
            "conv_id",
            "turn_idx",
        )
    )
    streamed = spark.read.parquet(out).select("subj", "pred", "obj", "conv_id", "turn_idx")
    k = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    only_stream = streamed.join(batch_edges, k, "left_anti").count()
    only_batch = batch_edges.join(streamed, k, "left_anti").count()

    print(
        json.dumps(
            {
                "metric": "streaming_demo",
                "n_turns": n_turns,
                "n_shards": n_shards,
                "micro_batches": len(stage["micro_batches"]),
                "edges": stage["rows"],
                "stream_sec": round(stream_sec, 3),
                "turns_per_sec": round(n_turns / stream_sec),
                "stream_batch_equal": only_stream == 0 and only_batch == 0,
                "only_stream": only_stream,
                "only_batch": only_batch,
                "manifest_stage": "kg_edges_streamed",
            }
        )
    )


if __name__ == "__main__":
    main()
