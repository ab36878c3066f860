"""Structured Streaming tests: file-source micro-batches with availableNow
triggers; streaming results must equal the batch operators' results."""

import os

import pytest
from pyspark.sql import functions as F

from nospa_rdf_data_cube_validator_spark.functions.extraction import extract_mentions
from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts
from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
    stream_transcripts,
    streaming_kg_materialize,
    streaming_mention_counts,
    streaming_turn_order_check,
)


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    tr = synth_transcripts(spark, n_convs=10, base_turns=4, hot_convs=1, hot_turns=20)
    tr.repartition(4).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "counts" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_mention_counts_match_batch(spark, transcript_dir):
    stream = stream_transcripts(spark, transcript_dir, max_files=2)
    _run_to_memory(streaming_mention_counts(stream), "counts")
    got = {
        (r["rel"],): r["n_mentions"]
        for r in spark.sql("select rel, sum(n_mentions) as n_mentions from counts group by rel").collect()
    }
    batch = spark.read.parquet(transcript_dir)
    expect = {
        (r["rel"],): r["n"]
        for r in extract_mentions(batch).groupBy("rel").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect


def test_streaming_kg_materialize_matches_batch(spark, transcript_dir, tmp_path):
    out = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_transcripts(spark, transcript_dir, max_files=2)
    q = streaming_kg_materialize(spark, stream, out, ckpt).start()
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = spark.read.parquet(transcript_dir)
    assert got.count() == extract_mentions(batch).count()
    # restart with same checkpoint: no duplicate processing
    q2 = streaming_kg_materialize(spark, stream_transcripts(spark, transcript_dir), out, ckpt).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == got.count()


def test_streaming_turn_order_check(spark, tmp_path):
    """Turn-order state carries across micro-batches: batch 2 replays c1's
    turn 1 (duplicate) and delivers c2's turn 3 after its turn 5
    (out-of-order); both must be flagged with the state from batch 1."""
    import time as _time

    path = str(tmp_path / "ooo")
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    batch1 = [
        ("c1", 0, "user", "x", "", None),
        ("c1", 1, "user", "x", "", None),
        ("c2", 5, "user", "x", "", None),
    ]
    batch2 = [
        ("c1", 1, "user", "x", "", None),  # duplicate of batch-1 turn
        ("c2", 3, "user", "x", "", None),  # arrives after turn 5
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(path)
    _time.sleep(1.1)  # distinct modTime -> deterministic micro-batch order
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(path)
    stream = stream_transcripts(spark, path, max_files=1)
    q = (
        streaming_turn_order_check(stream)
        .writeStream.format("memory")
        .queryName("ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["conv_id"], r["turn_idx"]) for r in spark.sql("select * from ooo").collect()}
    assert got == {("c1", 1), ("c2", 3)}


def test_materialize_batch_retry_idempotent(spark, transcript_dir, tmp_path):
    """foreachBatch redelivery: re-running the SAME batch_id must replace its
    partition, not append duplicates (dynamic partition overwrite)."""
    from nospa_rdf_data_cube_validator_spark.functions.linking import (
        alias_edges,
        resolve_aliases,
        surface_dict,
    )
    from nospa_rdf_data_cube_validator_spark.streaming.ingest import materialize_batch

    out = str(tmp_path / "retry_edges")
    batch = spark.read.parquet(transcript_dir)
    d = surface_dict(spark)
    am = resolve_aliases(alias_edges(spark))
    materialize_batch(batch, 0, out, d, am)
    n1 = spark.read.parquet(out).count()
    materialize_batch(batch, 0, out, d, am)  # simulated redelivery
    assert spark.read.parquet(out).count() == n1
    # a second batch appends its own partition
    materialize_batch(batch.limit(5), 1, out, d, am)
    assert spark.read.parquet(out).count() > n1


def test_streaming_lineage_rows(spark, transcript_dir, tmp_path):
    """Per-micro-batch lineage: row counts per (batch_id, partition) are
    written idempotently next to the materialized triples and must sum to
    the triple count; a redelivered batch replaces its lineage partition."""
    from nospa_rdf_data_cube_validator_spark.functions.linking import (
        alias_edges,
        resolve_aliases,
        surface_dict,
    )
    from nospa_rdf_data_cube_validator_spark.streaming.ingest import materialize_batch

    out = str(tmp_path / "l_edges")
    lin = str(tmp_path / "l_lineage")
    batch = spark.read.parquet(transcript_dir)
    d = surface_dict(spark)
    am = resolve_aliases(alias_edges(spark))
    materialize_batch(batch, 0, out, d, am, lineage_dir=lin)
    materialize_batch(batch.limit(7), 1, out, d, am, lineage_dir=lin)
    edges = spark.read.parquet(out)
    lineage = spark.read.parquet(lin)
    got = {r["batch_id"]: r["s"] for r in lineage.groupBy("batch_id").agg(F.sum("row_count").alias("s")).collect()}
    exp = {r["batch_id"]: r["c"] for r in edges.groupBy("batch_id").count().withColumnRenamed("count", "c").collect()}
    assert got == exp
    # redelivery: batch 0's lineage is replaced, not appended
    materialize_batch(batch, 0, out, d, am, lineage_dir=lin)
    again = {r["batch_id"]: r["s"] for r in spark.read.parquet(lin).groupBy("batch_id").agg(F.sum("row_count").alias("s")).collect()}
    assert again == exp


def test_record_stream_stage_folds_lineage_into_manifest(spark, transcript_dir, tmp_path):
    """The streaming lineage folds into the batch pipeline's manifest as a
    completed stage (rows + per-micro-batch totals), and the fold REFUSES a
    lineage/snapshot mismatch."""
    import json
    import os

    from nospa_rdf_data_cube_validator_spark.functions.linking import (
        alias_edges,
        resolve_aliases,
        surface_dict,
    )
    from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
        materialize_batch,
        record_stream_stage,
    )

    out = str(tmp_path / "m_edges")
    lin = str(tmp_path / "m_lineage")
    wd = str(tmp_path / "m_wd")
    batch = spark.read.parquet(transcript_dir)
    d = surface_dict(spark)
    am = resolve_aliases(alias_edges(spark))
    materialize_batch(batch, 0, out, d, am, lineage_dir=lin)
    materialize_batch(batch.limit(7), 1, out, d, am, lineage_dir=lin)
    entry = record_stream_stage(spark, wd, "kg_edges_streamed", out, lin)
    assert entry["done"] and entry["streaming"]
    assert entry["rows"] == spark.read.parquet(out).count()
    assert sum(entry["micro_batches"].values()) == entry["rows"]
    assert set(entry["micro_batches"]) == {"0", "1"}
    manifest = json.load(open(os.path.join(wd, "_MANIFEST.json")))
    assert manifest["stages"]["kg_edges_streamed"] == entry
    # the manifest entry must point at the streamed data so a batch resume
    # READS it rather than silently rebuilding: run() with a build that
    # would blow up must return the streamed snapshot untouched
    from nospa_rdf_data_cube_validator_spark.pipeline import StageRunner

    assert entry["path"] == os.path.abspath(out)

    def boom():
        raise AssertionError("resume must not rebuild a streamed stage")

    resumed = StageRunner(spark, wd).run("kg_edges_streamed", boom)
    assert resumed.count() == entry["rows"]
    # a snapshot the lineage doesn't account for must fail loudly (hard
    # ValueError: -O strips asserts, a mismatch must still refuse)
    batch.limit(3).select(F.lit("x").alias("subj")).withColumn(
        "batch_id", F.lit(9)
    ).write.mode("append").partitionBy("batch_id").parquet(out)
    with pytest.raises(ValueError, match="lineage"):
        record_stream_stage(spark, wd, "kg_edges_streamed", out, lin)


def test_streaming_ic12_dup_check_converges_to_batch(spark, tmp_path):
    """Incremental IC-12: duplicates are flagged as they arrive, and a
    SMALLER obs id arriving in a later micro-batch late-flags the former
    representative — the converged flagged set equals the batch rule
    (all but the minimum obs per (ds, dim_key)); state carries across
    micro-batches (mod-time ordered, one file per trigger)."""
    import time as _time

    from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
        streaming_ic12_dup_check,
    )

    src = str(tmp_path / "obs_in")
    schema = "ds string, obs string, dim_key string"
    spark.createDataFrame(
        [("d1", "obsB", "K"), ("d1", "obsC", "K"), ("d1", "obsX", "L")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # distinct modTime -> deterministic micro-batch order
    # batch 2: a smaller id claims key K (former rep obsB must be
    # late-flagged against the new rep), plus an ordinary dup on L and a
    # redelivery of obsX (the representative itself — NOT a duplicate)
    spark.createDataFrame(
        [("d1", "obsA", "K"), ("d1", "obsY", "L"), ("d1", "obsX", "L")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_ic12_dup_check(stream)
        .writeStream.format("memory")
        .queryName("ic12_dups")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["ds"], r["dim_key"], r["obs"], r["rep"]) for r in spark.table("ic12_dups").collect()}
    flagged = {(ds, k, o) for ds, k, o, _ in rows}
    # converged set == batch semantics: all but min per (ds, dim_key)
    assert flagged == {("d1", "K", "obsB"), ("d1", "K", "obsC"), ("d1", "L", "obsY")}
    assert ("d1", "K", "obsB", "obsA") in rows  # late flag names the new rep
    assert ("d1", "K", "obsC", "obsB") in rows  # batch-1 flag used the rep of its time


def test_streaming_ic12_null_obs_never_enters_state(spark, tmp_path):
    """A null obs row must be dropped, not coerced to the string "None"
    (which could even become the representative and corrupt the converged
    set — r5 ADVICE finding, fixed alongside the r6 vectorized fast path)."""
    from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
        streaming_ic12_dup_check,
    )

    src = str(tmp_path / "obs_null_in")
    schema = "ds string, obs string, dim_key string"
    spark.createDataFrame(
        [("d1", "obsP", "K"), ("d1", None, "K"), ("d1", "obsQ", "K")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_ic12_dup_check(stream)
        .writeStream.format("memory")
        .queryName("ic12_dups_null")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["obs"], r["rep"]) for r in spark.table("ic12_dups_null").collect()}
    assert rows == {("obsQ", "obsP")}  # the null row is neither obs nor rep


def test_dup_step_convergence_property():
    """Hypothesis: for ANY multiset of obs ids in ANY batching/order, the
    incremental kernel's flagged SET equals the batch rule (every distinct
    obs except the global minimum), the final representative is the global
    minimum, and the count sees every arrival. Pure-python kernel — no
    streaming harness needed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nospa_rdf_data_cube_validator_spark.streaming.ingest import _dup_step

    obs_ids = st.text(alphabet="abcd", min_size=1, max_size=3)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.lists(obs_ids, min_size=0, max_size=6), min_size=0, max_size=6)
    )
    def run(batches):
        rep, n_seen = None, 0
        flagged = set()
        for batch in batches:
            rep, n_seen, out = _dup_step(rep, n_seen, batch)
            flagged |= {obs for obs, _ in out}
        all_obs = {o for b in batches for o in b}
        if all_obs:
            assert rep == min(all_obs)
            assert flagged == all_obs - {min(all_obs)}
        else:
            assert rep is None and flagged == set()
        assert n_seen == sum(len(b) for b in batches)

    run()


def test_cli_stream_dups_once(spark, tmp_path):
    """CLI stream-dups --once: watch, flag, checkpoint; a second run over
    the same dir (same checkpoint) processes nothing new and the output
    parquet keeps exactly the converged flagged set."""
    import argparse

    import main as cli

    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    spark.createDataFrame(
        [("d", "o2", "K"), ("d", "o1", "K"), ("d", "o3", "L")],
        "ds string, obs string, dim_key string",
    ).coalesce(1).write.parquet(src)
    args = argparse.Namespace(input=src, output=out, checkpoint=ck, max_files=1, once=True)
    assert cli.cmd_stream_dups(spark, args) == 0
    rows = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert rows == {("d", "K", "o2", "o1")}
    assert cli.cmd_stream_dups(spark, args) == 0  # idempotent resume
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == rows


def test_streaming_ic11_missing_dims(spark, tmp_path):
    """Stateless streaming IC-11: per-arrival missing-dimension flags match
    the batch array_except rule."""
    from nospa_rdf_data_cube_validator_spark.streaming.ingest import (
        streaming_ic11_missing_dims,
    )

    src = str(tmp_path / "obs11")
    schema = "ds string, obs string, dims_present array<string>"
    spark.createDataFrame(
        [("d1", "o1", ["a", "b"]), ("d1", "o2", ["a"]), ("d2", "o3", [])], schema
    ).coalesce(1).write.parquet(src)
    ds_dims = spark.createDataFrame(
        [("d1", ["a", "b"]), ("d2", ["c"])], "ds string, dims array<string>"
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_ic11_missing_dims(stream, ds_dims)
        .writeStream.format("memory")
        .queryName("ic11_missing")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["ds"], r["obs"], r["dim"]) for r in spark.table("ic11_missing").collect()}
    assert got == {("d1", "o2", "b"), ("d2", "o3", "c")}


def test_cli_stream_dups_zero_flagged(spark, tmp_path):
    """A clean input (no duplicate keys) must exit 0 and report 0, not
    crash on the schema-less parquet sink dir."""
    import argparse

    import main as cli

    src, out, ck = str(tmp_path / "src0"), str(tmp_path / "out0"), str(tmp_path / "ck0")
    spark.createDataFrame(
        [("d", "o1", "K"), ("d", "o2", "L")], "ds string, obs string, dim_key string"
    ).coalesce(1).write.parquet(src)
    args = argparse.Namespace(input=src, output=out, checkpoint=ck, max_files=1, once=True)
    assert cli.cmd_stream_dups(spark, args) == 0
