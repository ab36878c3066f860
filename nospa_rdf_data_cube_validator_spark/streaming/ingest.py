"""Structured Streaming front-end for transcript ingestion.

The reference is batch-only (SURVEY.md §2.9); this module adds the streaming
shape a 10^12-turn pipeline needs for continuous ingestion:

- file-source stream of transcript parquet (Iceberg streaming reads swap in
  transparently on a real catalog),
- watermarked event-time windowed mention counts (late data bounded),
- incremental KG materialization via foreachBatch (each micro-batch is
  extracted/linked/canonicalized with the SAME batch operators — one code
  path for both modes — and appended to the triples snapshot),
- a stateful per-conversation turn-order invariant check
  (applyInPandasWithState): flags turns arriving with a turn_idx <= the
  maximum already seen for that conversation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.extraction import extract_mentions
from ..functions.linking import (
    alias_edges,
    canonicalize,
    link_mentions,
    resolve_aliases,
    surface_dict,
)

TRANSCRIPT_STREAM_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def stream_transcripts(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """File-source transcript stream (one parquet file per micro-batch unit)."""
    return (
        spark.readStream.schema(TRANSCRIPT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_mention_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked windowed mention counts per relation.

    The extraction mapInPandas is the same vectorized kernel as batch; the
    watermark bounds state for late turns."""
    mentions = extract_mentions(
        stream.select("conv_id", "turn_idx", "text", "ts"), extra_cols=["ts"]
    )
    return (
        mentions.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "rel")
        .agg(F.count("*").alias("n_mentions"))
        .select(F.col("w.start").alias("window_start"), "rel", "n_mentions")
    )


def materialize_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    dictionary: DataFrame,
    alias_map: DataFrame,
    lineage_dir: str | None = None,
) -> None:
    """One micro-batch of KG materialization, written idempotently.

    The batch's triples land in their own ``batch_id=N`` partition under
    dynamic partition overwrite: re-running the same batch (foreachBatch
    redelivery after a crash between the data write and the checkpoint
    commit) replaces the partition byte-for-byte instead of duplicating it.

    ``lineage_dir`` (optional) receives per-(micro-batch, partition) row
    counts under the same idempotent batch_id-partitioned scheme — the
    streaming analogue of the batch pipeline's ``_lineage_*`` tables."""
    mentions = extract_mentions(batch_df)
    canon = canonicalize(link_mentions(mentions, dictionary), alias_map)
    edges = canon.select(
        F.col("subj_entity").alias("subj"),
        F.col("rel").alias("pred"),
        F.col("obj_entity").alias("obj"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )
    if lineage_dir is not None:
        edges = edges.persist()
    try:
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        if lineage_dir is not None:
            lineage = (
                edges.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count("*").alias("row_count"))
                .withColumn("batch_id", F.lit(batch_id))
            )
            (
                lineage.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(lineage_dir)
            )
    finally:
        # release even when a write throws: foreachBatch redelivers the
        # batch, and un-released caches from failed attempts would pin
        # executor memory across retries
        if lineage_dir is not None:
            edges.unpersist()


def streaming_kg_materialize(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    lineage_dir: str | None = None,
):
    """Incrementally materialize KG edge triples from a transcript stream.

    foreachBatch reuses the exact batch operators, so streaming and batch
    produce identical triples for identical input. The sink is idempotent
    per micro-batch: each batch writes to its own ``batch_id=N`` partition
    with dynamic partition overwrite, so a retried batch (failure after the
    data write but before the streaming checkpoint commits) REPLACES its own
    partition instead of appending duplicates — foreachBatch's at-least-once
    redelivery composed with an idempotent write gives effectively-once
    output."""
    dictionary = surface_dict(spark)
    alias_map = resolve_aliases(alias_edges(spark))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        materialize_batch(batch_df, batch_id, out_dir, dictionary, alias_map, lineage_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def record_stream_stage(
    spark: SparkSession, workdir: str, stage: str, out_dir: str, lineage_dir: str
) -> dict:
    """Fold a finished streaming run into the batch pipeline's manifest.

    Writes one StageRunner-compatible stage entry (``done``/``rows``) whose
    ``micro_batches`` map carries the per-batch lineage row totals AND whose
    ``path`` records the streamed snapshot's actual data directory, so a
    subsequent batch `run_pipeline` resume (StageRunner._snapshot_path
    honors ``path`` before the ``<workdir>/<stage>[/vN]`` convention) reads
    the streamed data instead of silently rebuilding — the lineage chain is
    unbroken across the batch/streaming boundary (north rule: per-partition
    lineage + checkpoint-resume)."""
    import json
    import os

    lineage = spark.read.parquet(lineage_dir)
    per_batch = {
        str(r["batch_id"]): r["rows"]
        for r in lineage.groupBy("batch_id").agg(F.sum("row_count").alias("rows")).collect()
    }
    rows = spark.read.parquet(out_dir).count()
    if rows != sum(per_batch.values()):
        # hard error, not assert: -O must not let a data/lineage mismatch
        # be recorded as a completed stage
        raise ValueError(
            f"lineage total {sum(per_batch.values())} != snapshot rows {rows} — "
            "a micro-batch wrote data without lineage (or vice versa)"
        )
    os.makedirs(workdir, exist_ok=True)
    manifest_path = os.path.join(workdir, "_MANIFEST.json")
    manifest = {"stages": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    entry = {
        "done": True,
        "rows": rows,
        "streaming": True,
        "path": os.path.abspath(out_dir),
        "micro_batches": dict(sorted(per_batch.items(), key=lambda kv: int(kv[0]))),
    }
    manifest["stages"][stage] = entry
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, manifest_path)
    return entry


_ORDER_STATE = StructType([StructField("max_turn", IntegerType(), True)])
_ORDER_OUT = StructType(
    [
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("max_seen", IntegerType(), True),
    ]
)


def streaming_turn_order_check(stream: DataFrame) -> DataFrame:
    """Stateful per-conversation invariant: emit turns whose turn_idx is not
    strictly greater than every previously seen turn_idx (out-of-order or
    duplicate arrivals). applyInPandasWithState keeps one int per conv."""

    def check(key, pdfs, state: GroupState):
        (conv_id,) = key
        max_turn = state.get[0] if state.exists else -1
        bad_rows = []
        for pdf in pdfs:
            for t in sorted(int(x) for x in pdf["turn_idx"]):
                if t <= max_turn:
                    bad_rows.append((conv_id, t, max_turn))
                else:
                    max_turn = t
        state.update((max_turn,))
        if bad_rows:
            yield pd.DataFrame(bad_rows, columns=["conv_id", "turn_idx", "max_seen"])

    return stream.select("conv_id", "turn_idx").groupBy("conv_id").applyInPandasWithState(
        check,
        outputStructType=_ORDER_OUT,
        stateStructType=_ORDER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DUP_STATE = StructType(
    [
        StructField("rep", StringType(), True),
        StructField("n_seen", LongType(), True),
    ]
)
_DUP_OUT = StructType(
    [
        StructField("ds", StringType(), True),
        StructField("dim_key", StringType(), True),
        StructField("obs", StringType(), True),
        StructField("rep", StringType(), True),
    ]
)


def _dup_step(
    rep: str | None, n_seen: int, obs_batch
) -> tuple[str | None, int, list[tuple[str, str]]]:
    """Pure per-(key, micro-batch) transition of the incremental dup check:
    fold a batch of observation ids into (representative, count) state and
    return the (obs, rep_at_emission) rows to flag. Kept side-effect-free
    so the convergence property — flagged set == all-but-global-min
    regardless of how arrivals are ordered or batched — is directly
    property-testable without a streaming harness (hypothesis, see
    tests/test_streaming.py)."""
    flagged: list[tuple[str, str]] = []
    for obs in sorted(obs_batch):
        n_seen += 1
        if rep is None:
            rep = obs
        elif obs == rep:
            # redelivery of the representative itself: one observation,
            # not a duplicate of itself
            continue
        elif obs < rep:
            # late-arriving smaller id: the former representative is,
            # under batch semantics, the duplicate — emit it now
            flagged.append((rep, obs))
            rep = obs
        else:
            flagged.append((obs, rep))
    return rep, n_seen, flagged


def streaming_ic12_dup_check(stream: DataFrame) -> DataFrame:
    """Incremental IC-12: flag duplicate observations AS THEY ARRIVE.

    The batch validator (operators/validate.py::ic12) re-scans the cube per
    run; at continuous-ingestion scale the stream form keeps one tiny state
    row per (ds, dim_key) — the minimum observation id seen (the
    representative) and a count — and emits every arriving observation
    whose key is already claimed. EVENTUAL batch equivalence: when a
    SMALLER obs id arrives later, the former representative is emitted
    (late) and the state re-points, so the flagged set converges exactly
    to the batch rule "all but the minimum obs per (ds, dim-value-set
    key)"; redelivered micro-batches can re-emit a row (at-least-once —
    the idempotent batch_id-partitioned sink or a downstream distinct
    dedupes), but the converged SET is order-independent.

    Input: per-observation rows (ds, obs, dim_key) where dim_key is the
    same value-set duplicate key the batch path builds (the caller
    computes it with identical semantics — e.g. sorted distinct dim
    values joined with a reserved separator).

    Deployment note: state is one (rep, count) row per key; at
    100 TB key cardinality back it with the RocksDB provider
    (``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
    so state spills to local disk instead of the executor heap — the
    operator itself is provider-agnostic."""

    def check(key, pdfs, state: GroupState):
        import numpy as np

        ds, dim_key = key
        rep, n_seen = state.get if state.exists else (None, 0)
        outs = []
        for pdf in pdfs:
            # null obs must not enter the state: str(None) would coerce to
            # the literal "None" and could even become the representative,
            # corrupting the converged set (r5 ADVICE finding)
            obs = pdf["obs"].dropna().astype(str)
            if obs.empty:
                continue
            arr = np.sort(obs.to_numpy())
            if rep is not None and arr[0] >= rep:
                # common case (ids arriving in or above representative
                # order): the whole batch folds vectorized — every element
                # except redeliveries of the representative is a duplicate
                # of the unchanged rep. Only a batch whose minimum
                # undercuts the representative (late smaller id) needs the
                # element-order _dup_step walk.
                n_seen += len(arr)
                dups = arr[arr != rep]
                if len(dups):
                    outs.append(
                        pd.DataFrame(
                            {"ds": ds, "dim_key": dim_key, "obs": dups, "rep": rep}
                        )
                    )
            else:
                rep, n_seen, flagged = _dup_step(rep, n_seen, arr.tolist())
                if flagged:
                    outs.append(
                        pd.DataFrame(
                            [(ds, dim_key, o, r) for o, r in flagged],
                            columns=["ds", "dim_key", "obs", "rep"],
                        )
                    )
        state.update((rep, n_seen))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return (
        stream.select("ds", "obs", "dim_key")
        .groupBy("ds", "dim_key")
        .applyInPandasWithState(
            check,
            outputStructType=_DUP_OUT,
            stateStructType=_DUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ic11_missing_dims(stream: DataFrame, ds_dims: DataFrame) -> DataFrame:
    """Incremental IC-11: flag observations missing declared dimensions AS
    THEY ARRIVE. Stateless — dimension completeness is decidable per
    observation given the (metadata-scale, broadcast) declared-dims table
    (ds, dims array<string>), so the same plan serves batch and stream:
    arriving rows (ds, obs, dims_present array<string>) join the broadcast
    and explode the array_except. The companion to streaming_ic12's
    stateful check: together they put the reference's fused IC-11/12 hot
    path (ValidatorIC11_12.java:61-85) on a continuous-ingestion footing."""
    return (
        stream.join(F.broadcast(ds_dims), "ds")
        .select(
            "ds",
            "obs",
            F.explode(F.array_except("dims", "dims_present")).alias("dim"),
        )
    )
