"""Randomized semantic cross-check: many small random cubes (one per
dataset, all unioned into ONE store so a single validator run covers them)
with IC-11/12/13/14 results compared against an independent pure-Python
model of the documented semantics:

- per (obs, dim) the engine picks the MINIMUM value (our deterministic
  stand-in for the reference's HashSet-iteration first-wins,
  ValidatorIC11_12.java:75);
- IC-11 flags (obs, dim) for every declared dim absent on the obs;
- IC-12's duplicate key is the SORTED SET of chosen dim values
  (value-set collapse quirk, ValidatorIC11_12.java:70-80) over COMPLETE
  observations only, flagging all but the minimum obs per (ds, key);
- zero-dim datasets make every complete obs share the empty key;
- IC-13 expects, per obs, every prop of a spec carrying
  qb:componentRequired true (whatever the prop's kind — dims included);
- IC-14 expects every component prop typed qb:MeasureProperty; for
  measureType cubes the NoSPA quirk expects the UNFILTERED component
  set (ValidatorIC14.java:30-35);
- IC-15/16 split per the reference (NospaValidator.java:339-347): an
  observation in a measureType cube with EXACTLY ONE qb:measureType
  value whose measure is undeclared or valued != 1 times -> IC-15;
  zero or multiple measureType values -> IC-16;
- IC-17 (ValidatorIC17.java:24-96): over observations CARRYING
  qb:measureType, pairwise skip-aware dim-vector equality (a dim where
  either side lacks exactly one value is skipped); violation iff the
  self-inclusive equal-count != #declared measures, reported as
  (obs, n_unequal = |scope| - equal-count).

Catches semantic drift the per-IC mutation fixtures (one seeded violation
each) cannot: crossed values, multi-valued dims, required dims, attrs on
some obs only, measureType interaction.
"""

import random

from nospa_rdf_data_cube_validator_spark import qb
from nospa_rdf_data_cube_validator_spark.operators.validate import CubeValidator
from nospa_rdf_data_cube_validator_spark.plans.algebra import TripleStore
from nospa_rdf_data_cube_validator_spark.terms import iri_row, lit_row, triples_df

EG = "http://example.org/rand#"


def _random_cube(rng: random.Random, tag: str):
    """Rows + model-side description of one random cube."""
    ds = f"{EG}ds{tag}"
    dsd = f"{EG}dsd{tag}"
    rows = [iri_row(ds, qb.QB_STRUCTURE, dsd)]

    dims = [f"{EG}dim{tag}_{i}" for i in range(rng.randint(0, 3))]
    attrs = [f"{EG}att{tag}_{i}" for i in range(rng.randint(0, 2))]
    meas = [f"{EG}mea{tag}_{i}" for i in range(rng.randint(0, 2))]
    measure_type = rng.random() < 0.3

    comp_props = dims + attrs + meas + ([qb.QB_MEASURE_TYPE] if measure_type else [])
    required: set[str] = set()
    for i, p in enumerate(comp_props):
        spec = f"{EG}spec{tag}_{i}"
        rows.append(iri_row(dsd, qb.QB_COMPONENT, spec))
        rows.append(iri_row(spec, qb.QB_COMPONENT_PROPERTY, p))
        if rng.random() < 0.3:
            rows.append(lit_row(spec, qb.QB_COMPONENT_REQUIRED, "true", qb.XSD_BOOLEAN))
            required.add(p)
    concepts = [f"{EG}c{tag}_{j}" for j in range(4)]
    typed_concepts = set()
    for j, c in enumerate(concepts):
        if j != 3:  # one concept stays UNtyped -> fails the skos:Concept test
            rows.append(iri_row(c, qb.RDF_TYPE, qb.SKOS_CONCEPT))
            typed_concepts.add(c)
    dim_cls: dict[str, tuple[str, set]] = {}
    for i, d in enumerate(dims):
        rows.append(iri_row(d, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY))
        if rng.random() < 0.6:
            cl = f"{EG}cl{tag}_{i}"
            rows.append(iri_row(d, qb.QB_CODE_LIST, cl))
            members = rng.sample(concepts, rng.randint(1, 3))
            if rng.random() < 0.5:  # ConceptScheme branch
                rows.append(iri_row(cl, qb.RDF_TYPE, qb.SKOS_CONCEPT_SCHEME))
                for c in members:
                    rows.append(iri_row(c, qb.SKOS_IN_SCHEME, cl))
                closure = set(members)
            else:  # Collection branch: direct members + sometimes a nested hop
                rows.append(iri_row(cl, qb.RDF_TYPE, qb.SKOS_COLLECTION))
                closure = set()
                direct, nested = members[:1], members[1:]
                for c in direct:
                    rows.append(iri_row(cl, qb.SKOS_MEMBER, c))
                    closure.add(c)
                if nested:
                    sub = f"{EG}subcol{tag}_{i}"
                    rows.append(iri_row(cl, qb.SKOS_MEMBER, sub))
                    closure.add(sub)
                    for c in nested:
                        rows.append(iri_row(sub, qb.SKOS_MEMBER, c))
                        closure.add(c)
            dim_cls[d] = (cl, {c for c in closure if c in typed_concepts})
    for a in attrs:
        rows.append(iri_row(a, qb.RDF_TYPE, qb.QB_ATTRIBUTE_PROPERTY))
    for m in meas:
        rows.append(iri_row(m, qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY))

    obs_props: dict[str, dict[str, list[str]]] = {}
    values = [f"{EG}v{j}" for j in range(4)]
    for o in range(rng.randint(2, 8)):
        obs = f"{EG}obs{tag}_{o}"
        rows.append(iri_row(obs, qb.QB_DATASET_PROP, ds))
        per_prop: dict[str, list[str]] = {}
        for p in comp_props:
            if rng.random() < 0.8:  # 20%: prop absent on this obs
                if p == qb.QB_MEASURE_TYPE:
                    # measureType values point at measures (sometimes a
                    # bogus undeclared one) so IC-15's declared/valued
                    # branches and IC-16's cardinality branch all fire
                    pool = meas + [f"{EG}bogus{tag}"]
                    vals = rng.sample(pool, rng.randint(1, min(2, len(pool))))
                elif p in dim_cls:
                    # mix of in-list concepts, out-of-list/untyped concepts
                    # and plain values exercises every IC-19 branch
                    vals = rng.sample(concepts + values, rng.randint(1, 2))
                else:
                    vals = rng.sample(values, rng.randint(1, 2))  # sometimes multi-valued
                per_prop[p] = vals
                for v in vals:
                    rows.append(iri_row(obs, p, v))
        obs_props[obs] = per_prop
    return dict(
        ds=ds, dims=dims, meas=meas, required=required,
        comp_props=comp_props, measure_type=measure_type,
        dim_cls=dim_cls, obs_props=obs_props, rows=rows,
    )


def _model(cube):
    """Independent python implementation of the documented IC-11..17 rules."""
    ic11, ic12, ic13, ic14, ic15, ic16, ic17 = (set() for _ in range(7))
    complete = {}
    for obs, per_prop in cube["obs_props"].items():
        missing_dims = [d for d in cube["dims"] if d not in per_prop]
        for d in missing_dims:
            ic11.add((obs, d))
        if not missing_dims:
            chosen = [min(per_prop[d]) for d in cube["dims"]]
            complete[obs] = tuple(sorted(set(chosen)))
        for p in cube["required"]:
            if p not in per_prop:
                ic13.add((obs, p))
        expected14 = cube["comp_props"] if cube["measure_type"] else cube["meas"]
        for p in expected14:
            if p not in per_prop:
                ic14.add((obs, p))
        if cube["measure_type"]:
            mts = tuple(sorted(set(per_prop.get(qb.QB_MEASURE_TYPE, []))))
            if len(mts) == 1:
                mt = mts[0]
                n_vals = len(set(per_prop.get(mt, [])))
                if mt not in cube["meas"] or n_vals != 1:
                    ic15.add((obs, mts))
            else:
                ic16.add((obs, mts))
    by_key: dict[tuple, list[str]] = {}
    for obs, key in complete.items():
        by_key.setdefault(key, []).append(obs)
    for members in by_key.values():
        ic12.update(o for o in members if o != min(members))
    # IC-17: skip-aware pairwise vector equality over mt-carrying obs
    scope = {
        obs: {
            d: (per_prop[d][0] if len(per_prop.get(d, [])) == 1 else None)
            for d in cube["dims"]
        }
        for obs, per_prop in cube["obs_props"].items()
        if qb.QB_MEASURE_TYPE in per_prop
    }

    def _compat(v1, v2):
        return all(
            v1[d] is None or v2[d] is None or v1[d] == v2[d] for d in cube["dims"]
        )

    n_meas = len(set(cube["meas"]))
    for obs1, v1 in scope.items():
        eq = sum(1 for v2 in scope.values() if _compat(v1, v2))
        if eq != n_meas:
            ic17.add((obs1, len(scope) - eq))
    # IC-19 (value-keyed): distinct (dim, value) pairs under the exactly-
    # one-value guard; a failing value collects ALL of its dim's code lists
    fail_pairs = set()
    for obs, per_prop in cube["obs_props"].items():
        for d, (cl, allowed) in cube["dim_cls"].items():
            vals = per_prop.get(d, [])
            if len(vals) == 1 and vals[0] not in allowed:
                fail_pairs.add((vals[0], cl))
    ic19 = {}
    for value, cl in fail_pairs:
        ic19.setdefault(value, set()).add(cl)
    ic19 = {(v, tuple(sorted(cls))) for v, cls in ic19.items()}
    return ic11, ic12, ic13, ic14, ic15, ic16, ic17, ic19


def test_random_cubes_ic11_to_ic19_match_python_model(spark):
    rng = random.Random(20260817)
    all_rows = []
    exp = [set() for _ in range(8)]
    for t in range(30):
        cube = _random_cube(rng, str(t))
        all_rows.extend(cube["rows"])
        for acc, got in zip(exp, _model(cube)):
            acc |= got
    v = CubeValidator(TripleStore(triples_df(spark, all_rows)))
    got11 = {(r["obs"], r["dim"]) for r in v.ic11().collect()}
    got12 = {r["obs"] for r in v.ic12().collect()}
    got13 = {(r["obs"], r["attr"]) for r in v.ic13().collect()}
    got14 = {(r["obs"], r["measure"]) for r in v.ic14().collect()}
    got15 = {(r["obs"], tuple(r["measure_types"])) for r in v.ic15().collect()}
    got16 = {(r["obs"], tuple(r["measure_types"])) for r in v.ic16().collect()}
    got17 = {(r["obs"], r["n_unequal"]) for r in v.ic17().collect()}
    got19 = {(r["value"], tuple(r["code_lists"])) for r in v.ic19().collect()}
    v.unpersist()
    assert got11 == exp[0]
    assert got12 == {o for o in exp[1]}
    assert got13 == exp[2]
    assert got14 == exp[3]
    assert got15 == exp[4]
    assert got16 == exp[5]
    assert got17 == exp[6]
    # ic19 merges code_lists per value ACROSS cubes; re-merge the per-cube sets
    merged = {}
    for value, cls in exp[7]:
        merged.setdefault(value, set()).update(cls)
    assert got19 == {(v_, tuple(sorted(c))) for v_, c in merged.items()}


def _model_strict(cube):
    """Independent model of the STRICT (official W3C SPARQL) readings that
    differ from NoSPA: IC-12 keys by the full (dim, value) pairing; IC-14
    skips measureType cubes and expects declared measures only; IC-15
    demands a value for EVERY measureType binding; IC-16 flags a binding
    when any OTHER declared measure is valued; IC-17 gives dirty
    observations an equal-count of zero; IC-19 checks EVERY value binding
    (no single-value guard) and outputs failing (obs, dim) pairs."""
    ic12, ic14, ic15, ic16, ic17, ic19 = (set() for _ in range(6))
    complete = {}
    for obs, per_prop in cube["obs_props"].items():
        if all(d in per_prop for d in cube["dims"]):
            complete[obs] = tuple(
                sorted((d, min(per_prop[d])) for d in cube["dims"])
            )
        if not cube["measure_type"]:
            for p in cube["meas"]:
                if p not in per_prop:
                    ic14.add((obs, p))
        if cube["measure_type"]:
            mts = sorted(set(per_prop.get(qb.QB_MEASURE_TYPE, [])))
            for m in mts:
                if not per_prop.get(m):
                    ic15.add((obs, m))
                if any(om in per_prop for om in cube["meas"] if om != m):
                    ic16.add((obs, m))
    by_key = {}
    for obs, key in complete.items():
        by_key.setdefault(key, []).append(obs)
    for members in by_key.values():
        ic12.update(o for o in members if o != min(members))
    scope = {
        obs: tuple(
            per_prop[d][0] if len(per_prop.get(d, [])) == 1 else None
            for d in cube["dims"]
        )
        for obs, per_prop in cube["obs_props"].items()
        if qb.QB_MEASURE_TYPE in per_prop
    }
    n_meas = len(set(cube["meas"]))
    vec_counts = {}
    for v in scope.values():
        vec_counts[v] = vec_counts.get(v, 0) + 1
    for obs, v in scope.items():
        grp = 0 if None in v else vec_counts[v]
        if grp != n_meas:
            ic17.add((obs, len(scope) - grp))
    # strict IC-19: EVERY binding checked (no single-value guard), output
    # the (obs, dim) pairs with some failing binding
    ic19 = set()
    for obs, per_prop in cube["obs_props"].items():
        for d, (cl, allowed) in cube["dim_cls"].items():
            if any(val not in allowed for val in per_prop.get(d, [])):
                ic19.add((obs, d))
    return ic12, ic14, ic15, ic16, ic17, ic19


def test_random_cubes_strict_mode_matches_python_model(spark):
    rng = random.Random(20260818)
    all_rows = []
    exp = [set() for _ in range(6)]
    for t in range(30):
        cube = _random_cube(rng, str(t))
        all_rows.extend(cube["rows"])
        for acc, got in zip(exp, _model_strict(cube)):
            acc |= got
    v = CubeValidator(TripleStore(triples_df(spark, all_rows)), strict_w3c=True)
    got12 = {r["obs"] for r in v.ic12().collect()}
    got14 = {(r["obs"], r["measure"]) for r in v.ic14().collect()}
    got15 = {(r["obs"], r["measure"]) for r in v.ic15().collect()}
    got16 = {(r["obs"], r["measure"]) for r in v.ic16().collect()}
    got17 = {(r["obs"], r["n_unequal"]) for r in v.ic17().collect()}
    got19 = {(r["obs"], r["dim"]) for r in v.ic19().collect()}
    v.unpersist()
    assert got12 == {o for o in exp[0]}
    assert got14 == exp[1]
    assert got15 == exp[2]
    assert got16 == exp[3]
    assert got17 == exp[4]
    assert got19 == exp[5]
