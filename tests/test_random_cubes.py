"""Randomized semantic cross-check: many small random cubes (one per
dataset, all unioned into ONE store so a single validator run covers them)
with IC-11/IC-12 results compared against an independent 30-line
pure-Python model of the documented semantics:

- per (obs, dim) the engine picks the MINIMUM value (our deterministic
  stand-in for the reference's HashSet-iteration first-wins,
  ValidatorIC11_12.java:75);
- IC-11 flags (obs, dim) for every declared dim absent on the obs;
- IC-12's duplicate key is the SORTED SET of chosen dim values
  (value-set collapse quirk, ValidatorIC11_12.java:70-80) over COMPLETE
  observations only, flagging all but the minimum obs per (ds, key);
- zero-dim datasets make every complete obs share the empty key.

Catches semantic drift the per-IC mutation fixtures (one seeded violation
each) cannot: crossed values, multi-valued dims, obs in several datasets,
dim values shared across obs, empty declarations.
"""

import random

from nospa_rdf_data_cube_validator_spark import qb
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
from nospa_rdf_data_cube_validator_spark.terms import iri_row, triples_df

EG = "http://example.org/rand#"


def _random_cube(rng: random.Random, tag: str):
    """Rows + model-side description of one random cube."""
    ds = f"{EG}ds{tag}"
    dsd = f"{EG}dsd{tag}"
    n_dims = rng.randint(0, 3)
    dims = [f"{EG}dim{tag}_{i}" for i in range(n_dims)]
    rows = [iri_row(ds, qb.QB_STRUCTURE, dsd)]
    for i, d in enumerate(dims):
        spec = f"{EG}spec{tag}_{i}"
        rows.append(iri_row(dsd, qb.QB_COMPONENT, spec))
        rows.append(iri_row(spec, qb.QB_COMPONENT_PROPERTY, d))
        rows.append(iri_row(d, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY))
    obs_dims: dict[str, dict[str, list[str]]] = {}
    values = [f"{EG}v{j}" for j in range(4)]
    for o in range(rng.randint(2, 8)):
        obs = f"{EG}obs{tag}_{o}"
        rows.append(iri_row(obs, qb.QB_DATASET_PROP, ds))
        per_dim: dict[str, list[str]] = {}
        for d in dims:
            if rng.random() < 0.8:  # 20%: dim missing -> IC-11
                vals = rng.sample(values, rng.randint(1, 2))  # sometimes multi-valued
                per_dim[d] = vals
                for v in vals:
                    rows.append(iri_row(obs, d, v))
        obs_dims[obs] = per_dim
    return ds, dims, obs_dims, rows


def _model(ds, dims, obs_dims):
    """Independent python implementation of the documented IC-11/12 rule."""
    ic11 = set()
    complete = {}
    for obs, per_dim in obs_dims.items():
        missing = [d for d in dims if d not in per_dim]
        for d in missing:
            ic11.add((obs, d))
        if not missing:
            chosen = [min(vals) for vals in per_dim.values()]
            complete[obs] = tuple(sorted(set(chosen)))
    ic12 = set()
    by_key: dict[tuple, list[str]] = {}
    for obs, key in complete.items():
        by_key.setdefault(key, []).append(obs)
    for key, members in by_key.items():
        for obs in members:
            if obs != min(members):
                ic12.add(obs)
    return ic11, ic12


def test_random_cubes_ic11_ic12_match_python_model(spark):
    rng = random.Random(20260817)
    all_rows, exp11, exp12 = [], set(), set()
    for t in range(30):
        ds, dims, obs_dims, rows = _random_cube(rng, str(t))
        all_rows.extend(rows)
        m11, m12 = _model(ds, dims, obs_dims)
        exp11 |= m11
        exp12 |= m12
    v = CubeValidator(TripleStore(triples_df(spark, all_rows)))
    got11 = {(r["obs"], r["dim"]) for r in v.ic11().collect()}
    got12 = {r["obs"] for r in v.ic12().collect()}
    v.unpersist()
    assert got11 == exp11
    assert got12 == exp12
