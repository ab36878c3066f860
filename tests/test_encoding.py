"""Dictionary-encoded engine: exactness parity with the string engine.

The encoded store must be a drop-in: same normalization closure, same 21
violation sets (value-identical after decode), with min()-selections
preserved by the order-preserving dictionary."""

import pytest
from pyspark.sql import functions as F

from nospa_rdf_data_cube_validator_spark import terms
from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
from nospa_rdf_data_cube_validator_spark.plans.encoding import (
    build_dictionary,
    encode_store,
)

from . import fixtures as fx


@pytest.fixture(scope="module")
def engines(spark):
    """(string CubeValidator, encoded CubeValidator, encoded store) over the
    golden fixture + every mutation — one normalize per engine."""
    rows = (
        fx.golden_rows()
        + fx.mut_ic17()
        + fx.mut_ic15()
        + fx.mut_ic16()
        + fx.mut_ic18()
    )
    raw = TripleStore(terms.triples_df(spark, rows))
    s_norm = normalize(raw)
    s_norm.df = s_norm.df.localCheckpoint(eager=True)
    enc = encode_store(raw, parts=4)
    e_norm = normalize(enc)
    e_norm.df = e_norm.df.localCheckpoint(eager=True)
    return CubeValidator(s_norm), CubeValidator(e_norm), e_norm


def test_dictionary_is_order_preserving(spark):
    df = terms.triples_df(spark, fx.golden_rows())
    d = build_dictionary(df, parts=4)
    rows = sorted((r["term"], r["id"]) for r in d.collect())
    ids = [i for _, i in rows]
    assert ids == sorted(ids), "ids must be ranked by term string order"
    # the engine contract is ORDER PRESERVATION + uniqueness (so that
    # min(id) == id(min(term)) for every representative pick); density was
    # an implementation detail of the old RDD zipWithIndex path and is not
    # required — the r06 JVM-only assignment is sparse by design
    assert len(set(ids)) == len(ids), "ids must be unique"


def test_encoded_normalization_row_parity(spark, engines):
    sv, ev, e_store = engines
    assert sv.store.df.count() == ev.store.df.count()
    # decode the whole encoded store and compare the triple sets exactly
    dec = e_store.decode(ev.store.df, ["subj", "pred", "obj"]).select(
        "subj", "pred", "obj"
    )
    k = ["subj", "pred", "obj"]
    sdf = sv.store.df.select(*k)
    assert sdf.join(dec, k, "left_anti").count() == 0
    assert dec.join(sdf, k, "left_anti").count() == 0


def test_encoded_all_21_ics_value_parity(engines):
    sv, ev, e_store = engines
    from nospa_rdf_data_cube_validator_spark.operators.validate import IC_KEY_COLUMNS

    s_all, e_all = sv.validate_all(), ev.validate_all()
    for name, cols in IC_KEY_COLUMNS.items():
        s_rows = {tuple(r[c] for c in cols) for r in s_all[name].select(*cols).collect()}
        e_dec = e_store.decode(e_all[name].select(*cols), cols)
        e_rows = {tuple(r[c] for c in cols) for r in e_dec.collect()}
        assert s_rows == e_rows, f"{name}: {s_rows ^ e_rows}"


def test_decode_never_shuffles_the_dictionary(spark, engines):
    """decode()'s physical plan must reach the dictionary only through a
    broadcast: the violation frame's distinct ids broadcast INTO a
    left-semi filter of the dictionary, and the filtered slice broadcasts
    into the decode join. A SortMergeJoin or shuffle Exchange on the
    dictionary side would stream the (100 TB-scale) dictionary — the exact
    regression this pins (Spark ignores a broadcast hint on the PRESERVED
    side of a left-outer join, so the old broadcast(df) formulation
    silently shuffled the dictionary)."""
    _, ev, e_store = engines
    small = ev.store.df.limit(10).select("subj", "pred", "obj")
    plan = (
        e_store.decode(small, ["subj", "pred", "obj"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_encoded_ic12_representative_choice_matches(spark):
    """The IC-12 'all but the MINIMUM obs' pick must survive encoding —
    guaranteed only because the dictionary is order-preserving."""
    rows = fx.golden_rows() + fx.mut_ic12()
    raw = TripleStore(terms.triples_df(spark, rows))
    s_norm = normalize(raw)
    s_norm.df = s_norm.df.localCheckpoint(eager=True)
    e_norm = normalize(encode_store(raw, parts=4))
    e_norm.df = e_norm.df.localCheckpoint(eager=True)
    s = {r["obs"] for r in CubeValidator(s_norm).ic12().collect()}
    e_df = CubeValidator(e_norm).ic12()
    e = {r["obs"] for r in e_norm.decode(e_df, ["obs"]).collect()}
    assert s == e and len(s) > 0


def test_pipeline_encoded_snapshots_and_resume(spark, tmp_path):
    """encoded=True adds term_dict + triples_encoded snapshots; validation
    over ids yields zero violations on the constructed cube; a second run
    resumes from the encoded snapshots (manifest short-circuit)."""
    import os

    from nospa_rdf_data_cube_validator_spark.pipeline import run_pipeline
    from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts

    wd = str(tmp_path / "enc_wd")
    tr = synth_transcripts(spark, n_convs=15, base_turns=5, hot_convs=1, hot_turns=30)
    res = run_pipeline(spark, tr, wd, validate=True, encoded=True)
    for name, df in res["violations"].items():
        assert df.count() == 0, name
    assert res["triples_encoded"].schema["subj"].dataType.typeName() == "long"
    assert os.path.exists(os.path.join(wd, "term_dict"))
    # the decoded edge count matches the string triples snapshot
    dec = res["store"].decode(
        res["triples_encoded"].select("subj", "pred", "obj"), ["subj", "pred", "obj"]
    )
    assert dec.count() == res["triples"].count()
    # resume must short-circuit from the manifest: stage entries (incl.
    # their recorded build seconds) are byte-identical after the second run
    # — deterministic, unlike a wall-clock bound on this shared host
    manifest_path = os.path.join(wd, "_MANIFEST.json")
    before = open(manifest_path).read()
    res2 = run_pipeline(spark, tr, wd, validate=False, encoded=True)
    assert res2["triples_encoded"].count() == res["triples_encoded"].count()
    assert open(manifest_path).read() == before


def test_pipeline_bucketed_encoded_atrest(spark, tmp_path):
    """bucketed=True + encoded=True: the validate store IS the subj-bucketed
    cube_atrest table — per-observation (subj, pred) aggregations plan with
    NO Exchange, violations still all-zero (plan property + correctness),
    and a re-run resumes the table from the session catalog."""
    import json
    import os

    from nospa_rdf_data_cube_validator_spark.pipeline import run_pipeline
    from nospa_rdf_data_cube_validator_spark.sources.transcripts import synth_transcripts

    wd = str(tmp_path / "bkt_wd")
    tr = synth_transcripts(spark, n_convs=15, base_turns=5, hot_convs=1, hot_turns=30)
    res = run_pipeline(spark, tr, wd, validate=True, encoded=True, bucketed=True, buckets=4)
    for name, df in res["violations"].items():
        assert df.count() == 0, name
    res["validator"].unpersist()
    store_df = res["store"].df
    assert store_df.schema["subj"].dataType.typeName() == "long"
    plan = store_df.groupBy("subj", "pred").count()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    manifest = json.load(open(os.path.join(wd, "_MANIFEST.json")))
    assert manifest["stages"]["cube_atrest"]["done"]
    # same-session resume: the manifest (incl. recorded seconds) is untouched
    before = open(os.path.join(wd, "_MANIFEST.json")).read()
    res2 = run_pipeline(spark, tr, wd, validate=True, encoded=True, bucketed=True, buckets=4)
    res2["validator"].unpersist()
    assert open(os.path.join(wd, "_MANIFEST.json")).read() == before
