"""Skew-safety tests for the two-phase (groupBy + join-back) duplicate
detection, replacing the Window.partitionBy(key) min-over form.

The degenerate shape: EVERY row shares one key. A window partition cannot
be split (AQE skew handling applies only to joins/aggregations), so the
window form funnels the whole input through a single task at 100 TB; the
two-phase form ships only per-partition (min, count) partials through the
groupBy shuffle and joins the duplicate groups back with a join AQE can
split or broadcast. Oracles here are by construction: with one shared key,
every row except the global minimum id is a duplicate.
"""

import os
import time

from pyspark.sql import functions as F

from nospa_rdf_data_cube_validator_spark import qb
from nospa_rdf_data_cube_validator_spark.operators.dedup import exact_duplicates
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

N_OBS = 1_000_000
EG = "http://example.org/skew#"


def _degenerate_cube(spark, n: int):
    """One dataset, a DSD declaring ZERO dimensions -> every observation is
    'complete' with the empty dim-value set as its duplicate key (the
    SURVEY §2.4 A2 / ds_dims_arr empty-array branch)."""
    meta = spark.createDataFrame(
        [(EG + "ds", qb.QB_STRUCTURE, EG + "dsd", "iri", None, None)],
        "subj string, pred string, obj string, obj_kind string,"
        " obj_datatype string, obj_lang string",
    )
    obs = spark.range(n).select(
        F.concat(F.lit(EG + "obs/"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("subj"),
        F.lit(qb.QB_DATASET_PROP).alias("pred"),
        F.lit(EG + "ds").alias("obj"),
        F.lit("iri").alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )
    return TripleStore(meta.unionByName(obs))


def test_ic12_degenerate_single_key_two_phase(spark):
    v = CubeValidator(_degenerate_cube(spark, N_OBS))
    dup = v.ic12()
    plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "ic12 must not funnel the hot key through a window partition"
    # map-side PARTIAL aggregation must appear before the key shuffle —
    # 'partial_min' specifically, not just any HashAggregate: losing the
    # partial phase is exactly the skew regression this test pins
    assert "partial_min" in plan, plan
    t0 = time.time()
    got = dup.count()
    elapsed = time.time() - t0
    v.unpersist()
    assert got == N_OBS - 1  # everything but the global min observation
    # the representative must be the min id, i.e. obs 0 is NOT flagged
    assert v.ic12().where(F.col("obs") == EG + "obs/00000000").count() == 0
    v.unpersist()
    # loose wall guard: a single-task straggler at 1M rows on local[4] blows
    # far past this; the two-phase form finishes in a few seconds
    assert elapsed < 120, f"ic12 took {elapsed:.0f}s on the degenerate cube"


def test_strict_mode_ic12_ic17_plans_have_no_window(spark):
    """The r6 two-phase conversion of the STRICT branch (the r5 verdict's
    remaining unsplittable-window path): neither strict ic12 (pairing-key
    flows into the same two-phase base) nor strict ic17 (previously
    Window.partitionBy("ds") / (vec_h, ds, vec)) may funnel a hot key
    through a window partition; ic12 must also keep its map-side partial
    aggregation. Values are pinned by the strict differential suite; this
    test pins the executed PLAN SHAPE on the degenerate cube."""
    v = CubeValidator(_degenerate_cube(spark, 10_000), strict_w3c=True)
    dup = v.ic12()
    plan12 = dup._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan12, "strict ic12 must stay window-free"
    assert "partial_min" in plan12, plan12
    plan17 = v.ic17()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan17, "strict ic17 must not window-partition by ds"
    assert dup.count() == 10_000 - 1  # strict pairing key over zero dims == empty key
    v.unpersist()


def test_exact_duplicates_degenerate_single_fingerprint(spark):
    docs = spark.range(N_OBS).select(
        F.col("id").alias("doc_id"), F.lit("the same boilerplate page").alias("text")
    )
    dup = exact_duplicates(docs)
    plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = dup.agg(
        F.count("*").alias("n"),
        F.min("id").alias("min_id"),
        F.countDistinct("canonical_id").alias("n_canon"),
    ).collect()[0]
    assert rows["n"] == N_OBS - 1
    assert rows["min_id"] == 1  # doc 0 is the representative, never flagged
    assert rows["n_canon"] == 1


def test_exact_duplicates_null_text_group(spark):
    """md5(NULL) is NULL; null-text docs must still form one duplicate
    group (the window form's semantics) — a plain equi-join-back would
    silently drop them."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "real"), (4, "real"), (5, "unique")],
        "doc_id long, text string",
    )
    got = {(r["id"], r["canonical_id"]) for r in exact_duplicates(docs).collect()}
    assert got == {(2, 1), (4, 3)}


def test_ic11_bitmask_wide_dataset_fallback(spark):
    """The r6 bitmask base caps presence tracking at 63 dims per dataset;
    datasets declaring more take the exact anti-join fallback. This pins
    both paths on one cube: a 70-dim dataset (mask NULL -> fallback) and
    a 3-dim dataset (mask path), each with observations missing known
    dims."""
    from nospa_rdf_data_cube_validator_spark.operators.normalize import normalize

    def iri(s, p, o):
        return (s, p, o, "iri", None, None)

    rows = []
    # wide dataset: 70 declared dims
    rows.append(iri(EG + "dsW", qb.QB_STRUCTURE, EG + "dsdW"))
    for i in range(70):
        rows.append(iri(EG + "dsdW", qb.QB_COMPONENT, f"_:wc{i}"))
        rows.append(iri(f"_:wc{i}", qb.QB_DIMENSION, EG + f"wdim{i}"))
    # narrow dataset: 3 declared dims
    rows.append(iri(EG + "dsN", qb.QB_STRUCTURE, EG + "dsdN"))
    for i in range(3):
        rows.append(iri(EG + "dsdN", qb.QB_COMPONENT, f"_:nc{i}"))
        rows.append(iri(f"_:nc{i}", qb.QB_DIMENSION, EG + f"ndim{i}"))
    # obsW has values for wdim0..wdim67 (missing wdim68, wdim69)
    rows.append(iri(EG + "obsW", qb.QB_DATASET_PROP, EG + "dsW"))
    for i in range(68):
        rows.append(iri(EG + "obsW", EG + f"wdim{i}", EG + f"v{i}"))
    # obsN has values for ndim0 only (missing ndim1, ndim2)
    rows.append(iri(EG + "obsN", qb.QB_DATASET_PROP, EG + "dsN"))
    rows.append(iri(EG + "obsN", EG + "ndim0", EG + "v0"))
    # obsOK is complete in dsN
    rows.append(iri(EG + "obsOK", qb.QB_DATASET_PROP, EG + "dsN"))
    for i in range(3):
        rows.append(iri(EG + "obsOK", EG + f"ndim{i}", EG + f"v{i}"))
    store = TripleStore(
        spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, obj_kind string,"
            " obj_datatype string, obj_lang string",
        )
    )
    v = CubeValidator(normalize(store))
    got = {(r["obs"], r["dim"]) for r in v.ic11().collect()}
    want = {
        (EG + "obsW", EG + "wdim68"),
        (EG + "obsW", EG + "wdim69"),
        (EG + "obsN", EG + "ndim1"),
        (EG + "obsN", EG + "ndim2"),
    }
    assert got == want
    # and ic12 completeness still works across both datasets: only obsOK
    # and obsW... obsW is incomplete, obsOK alone in its key group
    assert v.ic12().count() == 0
    v.unpersist()


def test_entry_ic12_duplicates_two_phase_matches_window(spark, tmp_path):
    """The r6 rewrite of the declared ic12_duplicates query (window ->
    two-phase groupBy + null-safe join-back): identical rows to the
    window form on data WITH duplicate groups and NULL keys (the
    testdata has neither, so the oracle hash alone would not catch a
    null-semantics slip), and no Window in the executed plan."""
    import __spark_entry__ as em
    from pyspark.sql import Window

    rows = [(1, 10, 100, 1), (1, 10, 100, 2), (1, 10, 100, 3),
            (2, 20, 200, 5), (2, None, 200, 6), (2, None, 200, 7),
            (None, None, None, 8), (None, None, None, 9), (3, 30, 300, 4)]
    l = spark.createDataFrame(
        rows, "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber int"
    )
    l.write.parquet(str(tmp_path / "lineitem.parquet"))
    w = Window.partitionBy("l_orderkey", "l_partkey", "l_suppkey")
    win = (
        l.withColumn("min_line", F.min("l_linenumber").over(w))
        .withColumn("grp", F.count("*").over(w))
        .where((F.col("grp") > 1) & (F.col("l_linenumber") != F.col("min_line")))
        .select("l_orderkey", "l_linenumber")
    )
    two = em.q_ic12_duplicates(spark, str(tmp_path))
    assert "Window" not in two._jdf.queryExecution().executedPlan().toString()
    a = sorted([tuple(r) for r in win.collect()], key=str)
    b = sorted([tuple(r) for r in two.collect()], key=str)
    assert a == b == [(1, 2), (1, 3), (2, 7), (None, 9)]
