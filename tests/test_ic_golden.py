"""Golden-fixture tests: normalize the transcribed test.ttl cube and check
all 21 ICs. The only expected violation is IC-4 on sdmx-dimension:sex (typed
DimensionProperty by N2, no rdfs:range declared in the standalone file)."""

import pytest

from nospa_rdf_data_cube_validator_spark import qb, terms
from nospa_rdf_data_cube_validator_spark.operators.normalize import (
    normalize,
    normalize_phase1,
)
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore

from . import fixtures as fx


@pytest.fixture(scope="module")
def golden_store(spark):
    store = TripleStore(terms.triples_df(spark, fx.golden_rows()))
    normalized = normalize(store)
    normalized.df = normalized.df.localCheckpoint(eager=True)
    yield normalized


@pytest.fixture(scope="module")
def validator(golden_store):
    return CubeValidator(golden_store)


def _col_set(df, col):
    return {r[col] for r in df.select(col).collect()}


def test_normalization_types_observations(spark, golden_store):
    obs = _col_set(TripleStore(golden_store.df).typed(qb.QB_OBSERVATION), "subj")
    assert len(obs) == 24
    assert fx.obs_uri(1, 1) in obs


def test_normalization_pushes_slice_dims(golden_store):
    # o11 must have gained refPeriod + sex from slice1 (N4/N5) and
    # unitMeasure from the dataset (N3).
    import pyspark.sql.functions as F

    preds = _col_set(
        golden_store.df.where(F.col("subj") == fx.obs_uri(1, 1)).select("pred"), "pred"
    )
    assert fx.REF_PERIOD in preds
    assert fx.SEX in preds
    assert fx.UNIT_MEASURE in preds


def test_normalization_idempotent(spark, golden_store):
    again = normalize(TripleStore(golden_store.df))
    assert again.df.count() == golden_store.df.count()


def test_phase1_component_property_closure(spark):
    store = TripleStore(terms.triples_df(spark, fx.golden_rows()))
    p1 = normalize_phase1(store)
    comp_props = _col_set(p1.p(qb.QB_COMPONENT_PROPERTY), "obj")
    assert {fx.REF_AREA, fx.REF_PERIOD, fx.SEX, fx.LIFE_EXP, fx.UNIT_MEASURE} <= comp_props


@pytest.mark.parametrize("ic", [f"ic{i}" for i in range(1, 22) if i != 4])
def test_golden_cube_passes(validator, ic):
    df = getattr(validator, ic)()
    rows = df.collect()
    assert rows == [], f"{ic} should pass on the golden cube, got {rows}"


def test_golden_cube_ic4_flags_sex(validator):
    assert _col_set(validator.ic4(), "dim") == {fx.SEX}
