"""The reference golden fixture (/root/reference/test.ttl — the W3C
life-expectancy cube) transcribed to canonical triple rows, plus mutation
builders that seed exactly one violation class each (FIXTURES.md §4).

Note on the golden expectation: run standalone, the fixture leaves
``sdmx-dimension:sex`` typed as a qb:DimensionProperty (normalization N2)
with no rdfs:range declared anywhere in the file, so IC-4 flags it; every
other constraint passes. This matches the reference semantics
(nonsparql/ValidatorIC4.java:22-30), not a bug.
"""

from __future__ import annotations

from nospa_rdf_data_cube_validator_spark import qb
from nospa_rdf_data_cube_validator_spark.terms import bnode_row, iri_row, lit_row

# -- prefixes ----------------------------------------------------------------
EG = "http://example.org/ns#"
EXGEO = "http://example.org/geo#"
DCT = "http://purl.org/dc/terms/"
ORG = "http://www.w3.org/ns/org#"
FOAF = "http://xmlns.com/foaf/0.1/"
SDMX_DIM = "http://purl.org/linked-data/sdmx/2009/dimension#"
SDMX_ATTR = "http://purl.org/linked-data/sdmx/2009/attribute#"
SDMX_MEAS = "http://purl.org/linked-data/sdmx/2009/measure#"
SDMX_CONCEPT = "http://purl.org/linked-data/sdmx/2009/concept#"
SDMX_CODE = "http://purl.org/linked-data/sdmx/2009/code#"
SDMX_SUBJ = "http://purl.org/linked-data/sdmx/2009/subject#"
ADMINGEO = "http://data.ordnancesurvey.co.uk/ontology/admingeo/"
INTERVAL = "http://reference.data.gov.uk/def/intervals/"
RDFS = qb.PREFIX_RDFS
XSD = qb.PREFIX_XSD

DATASET = EG + "dataset-le3"
DSD = EG + "dsd-le3"
SLICE_KEY = EG + "sliceByRegion"
REF_AREA = EG + "refArea"
REF_PERIOD = EG + "refPeriod"
SEX = SDMX_DIM + "sex"
LIFE_EXP = EG + "lifeExpectancy"
UNIT_MEASURE = SDMX_ATTR + "unitMeasure"
RDF_PROPERTY = qb.PREFIX_RDF + "Property"

AREAS = [
    EXGEO + "newport_00pr",
    EXGEO + "cardiff_00pt",
    EXGEO + "monmouthshire_00pp",
    EXGEO + "merthyr_tdfil_00ph",
]
INTERVAL_URI = "http://reference.data.gov.uk/id/gregorian-interval/{}-01-01T00:00:00/P3Y"
SEX_M = SDMX_CODE + "sex-M"
SEX_F = SDMX_CODE + "sex-F"

# slice -> (period year, sex code), observations in test.ttl column order
SLICES = {
    EG + "slice1": (2004, SEX_M),
    EG + "slice2": (2004, SEX_F),
    EG + "slice3": (2005, SEX_M),
    EG + "slice4": (2005, SEX_F),
    EG + "slice5": (2006, SEX_M),
    EG + "slice6": (2006, SEX_F),
}
LIFE_VALUES = {
    1: ["76.7", "78.7", "76.6", "75.5"],
    2: ["80.7", "83.3", "81.3", "79.1"],
    3: ["77.1", "78.6", "76.5", "75.5"],
    4: ["80.9", "83.7", "81.5", "79.4"],
    5: ["77.0", "78.7", "76.6", "74.9"],
    6: ["81.5", "83.4", "81.7", "79.6"],
}


def obs_uri(col: int, row: int) -> str:
    return EG + f"o{col}{row}"


def golden_rows() -> list[tuple]:
    """All triples of /root/reference/test.ttl (pre-normalization)."""
    r: list[tuple] = []
    # dataset (test.ttl:28-42)
    r += [
        iri_row(DATASET, qb.RDF_TYPE, qb.QB_DATASET),
        lit_row(DATASET, DCT + "title", "Life expectancy", lang="en"),
        lit_row(DATASET, RDFS + "label", "Life expectancy", lang="en"),
        lit_row(
            DATASET,
            RDFS + "comment",
            "Life expectancy within Welsh Unitary authorities - extracted from Stats Wales",
            lang="en",
        ),
        lit_row(
            DATASET,
            DCT + "description",
            "Life expectancy within Welsh Unitary authorities - extracted from Stats Wales",
            lang="en",
        ),
        iri_row(DATASET, DCT + "publisher", EG + "organization"),
        lit_row(DATASET, DCT + "issued", "2010-08-11", datatype=XSD + "date"),
        iri_row(DATASET, DCT + "subject", SDMX_SUBJ + "3.2"),
        iri_row(DATASET, DCT + "subject", SDMX_SUBJ + "1.4"),
        iri_row(DATASET, DCT + "subject", EXGEO + "wales"),
        iri_row(DATASET, qb.QB_STRUCTURE, DSD),
        iri_row(DATASET, UNIT_MEASURE, "http://dbpedia.org/resource/Year"),
    ]
    r += [iri_row(DATASET, qb.QB_SLICE_PROP, s) for s in SLICES]
    # organization (test.ttl:44-45)
    r += [
        iri_row(EG + "organization", qb.RDF_TYPE, ORG + "Organization"),
        iri_row(EG + "organization", qb.RDF_TYPE, FOAF + "Agent"),
        lit_row(EG + "organization", RDFS + "label", "Example org", lang="en"),
    ]
    # DSD + component specs (test.ttl:49-66)
    r += [
        iri_row(DSD, qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(DSD, qb.QB_COMPONENT, "_:c1"),
        bnode_row(DSD, qb.QB_COMPONENT, "_:c2"),
        bnode_row(DSD, qb.QB_COMPONENT, "_:c3"),
        bnode_row(DSD, qb.QB_COMPONENT, "_:c4"),
        bnode_row(DSD, qb.QB_COMPONENT, "_:c5"),
        iri_row(DSD, qb.QB_SLICE_KEY_PROP, SLICE_KEY),
        iri_row("_:c1", qb.QB_DIMENSION, REF_AREA),
        lit_row("_:c1", qb.PREFIX_CUBE + "order", "1", datatype=XSD + "integer"),
        iri_row("_:c2", qb.QB_DIMENSION, REF_PERIOD),
        lit_row("_:c2", qb.PREFIX_CUBE + "order", "2", datatype=XSD + "integer"),
        iri_row("_:c2", qb.QB_COMPONENT_ATTACHMENT, qb.QB_SLICE),
        iri_row("_:c3", qb.QB_DIMENSION, SEX),
        lit_row("_:c3", qb.PREFIX_CUBE + "order", "3", datatype=XSD + "integer"),
        iri_row("_:c3", qb.QB_COMPONENT_ATTACHMENT, qb.QB_SLICE),
        iri_row("_:c4", qb.QB_MEASURE, LIFE_EXP),
        iri_row("_:c5", qb.QB_ATTRIBUTE, UNIT_MEASURE),
        lit_row("_:c5", qb.QB_COMPONENT_REQUIRED, "true", datatype=XSD + "boolean"),
        iri_row("_:c5", qb.QB_COMPONENT_ATTACHMENT, qb.QB_DATASET),
    ]
    # slice key (test.ttl:68-72)
    r += [
        iri_row(SLICE_KEY, qb.RDF_TYPE, qb.QB_SLICE_KEY),
        lit_row(SLICE_KEY, RDFS + "label", "slice by region", lang="en"),
        lit_row(
            SLICE_KEY,
            RDFS + "comment",
            "Slice by grouping regions together, fixing sex and time values",
            lang="en",
        ),
        iri_row(SLICE_KEY, qb.QB_COMPONENT_PROPERTY, REF_PERIOD),
        iri_row(SLICE_KEY, qb.QB_COMPONENT_PROPERTY, SEX),
    ]
    # dimension / measure property declarations (test.ttl:76-95)
    r += [
        iri_row(REF_PERIOD, qb.RDF_TYPE, RDF_PROPERTY),
        iri_row(REF_PERIOD, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        lit_row(REF_PERIOD, RDFS + "label", "reference period", lang="en"),
        iri_row(REF_PERIOD, RDFS + "subPropertyOf", SDMX_DIM + "refPeriod"),
        iri_row(REF_PERIOD, qb.RDFS_RANGE, INTERVAL + "Interval"),
        iri_row(REF_PERIOD, qb.PREFIX_CUBE + "concept", SDMX_CONCEPT + "refPeriod"),
        iri_row(REF_AREA, qb.RDF_TYPE, RDF_PROPERTY),
        iri_row(REF_AREA, qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        lit_row(REF_AREA, RDFS + "label", "reference area", lang="en"),
        iri_row(REF_AREA, RDFS + "subPropertyOf", SDMX_DIM + "refArea"),
        iri_row(REF_AREA, qb.RDFS_RANGE, ADMINGEO + "UnitaryAuthority"),
        iri_row(REF_AREA, qb.PREFIX_CUBE + "concept", SDMX_CONCEPT + "refArea"),
        iri_row(LIFE_EXP, qb.RDF_TYPE, RDF_PROPERTY),
        iri_row(LIFE_EXP, qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY),
        lit_row(LIFE_EXP, RDFS + "label", "life expectancy", lang="en"),
        iri_row(LIFE_EXP, RDFS + "subPropertyOf", SDMX_MEAS + "obsValue"),
        iri_row(LIFE_EXP, qb.RDFS_RANGE, XSD + "decimal"),
    ]
    # slices + observations (test.ttl:101-295)
    for col, (slice_uri, (year, sex_code)) in enumerate(SLICES.items(), start=1):
        r += [
            iri_row(slice_uri, qb.RDF_TYPE, qb.QB_SLICE),
            iri_row(slice_uri, qb.QB_SLICE_STRUCTURE, SLICE_KEY),
            iri_row(slice_uri, REF_PERIOD, INTERVAL_URI.format(year)),
            iri_row(slice_uri, SEX, sex_code),
        ]
        for row in range(1, 5):
            obs = obs_uri(col, row)
            r += [
                iri_row(slice_uri, qb.QB_OBSERVATION_PROP, obs),
                iri_row(obs, qb.RDF_TYPE, qb.QB_OBSERVATION),
                iri_row(obs, qb.QB_DATASET_PROP, DATASET),
                iri_row(obs, REF_AREA, AREAS[row - 1]),
                lit_row(obs, LIFE_EXP, LIFE_VALUES[col][row - 1], datatype=XSD + "decimal"),
            ]
    return r


# ---------------------------------------------------------------------------
# Mutation builders. Each returns extra rows seeding one violation class.
# ---------------------------------------------------------------------------

def mut_ic1() -> list[tuple]:
    """Obs with zero datasets + obs with two datasets."""
    return [
        iri_row(EG + "oNoDs", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o11", qb.QB_DATASET_PROP, EG + "ds2"),
    ]


def mut_ic2() -> list[tuple]:
    return [iri_row(EG + "ds2", qb.RDF_TYPE, qb.QB_DATASET)]


def mut_ic3() -> list[tuple]:
    return [
        iri_row(EG + "dsd2", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd2", qb.QB_COMPONENT, "_:m1"),
        iri_row("_:m1", qb.QB_DIMENSION, REF_AREA),
    ]


def mut_ic4() -> list[tuple]:
    return [iri_row(EG + "noRangeDim", qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY)]


def mut_ic5() -> list[tuple]:
    return [
        iri_row(EG + "conceptDim", qb.RDF_TYPE, qb.QB_DIMENSION_PROPERTY),
        iri_row(EG + "conceptDim", qb.RDFS_RANGE, qb.SKOS_CONCEPT),
    ]


def mut_ic6() -> list[tuple]:
    return [lit_row("_:c1", qb.QB_COMPONENT_REQUIRED, "false", datatype=XSD + "boolean")]


def mut_ic7() -> list[tuple]:
    return [iri_row(EG + "orphanKey", qb.RDF_TYPE, qb.QB_SLICE_KEY)]


def mut_ic8() -> list[tuple]:
    return [iri_row(SLICE_KEY, qb.QB_COMPONENT_PROPERTY, EG + "notInDsd")]


def mut_ic9() -> list[tuple]:
    return [iri_row(EG + "slice7", qb.RDF_TYPE, qb.QB_SLICE)]


def mut_ic10() -> list[tuple]:
    return [
        iri_row(EG + "slice8", qb.RDF_TYPE, qb.QB_SLICE),
        iri_row(EG + "slice8", qb.QB_SLICE_STRUCTURE, SLICE_KEY),
        iri_row(EG + "slice8", REF_PERIOD, INTERVAL_URI.format(2007)),
        # sex value missing -> (slice8, sex)
    ]


def mut_ic11() -> list[tuple]:
    """Obs in the dataset with no dimension values at all (not in a slice)."""
    return [
        iri_row(EG + "o71", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o71", qb.QB_DATASET_PROP, DATASET),
        lit_row(EG + "o71", LIFE_EXP, "50.0", datatype=XSD + "decimal"),
    ]


def mut_ic12() -> list[tuple]:
    """o72/o73 duplicate o11's dim values exactly; o74 crosses values across
    dims, which collides under NoSPA's value-*set* key (SURVEY.md §7.0)."""
    rows = []
    for dup in ("o72", "o73"):
        rows += [
            iri_row(EG + dup, qb.RDF_TYPE, qb.QB_OBSERVATION),
            iri_row(EG + dup, qb.QB_DATASET_PROP, DATASET),
            iri_row(EG + "slice1", qb.QB_OBSERVATION_PROP, EG + dup),
            iri_row(EG + dup, REF_AREA, AREAS[0]),
            lit_row(EG + dup, LIFE_EXP, "70.0", datatype=XSD + "decimal"),
        ]
    # crossed values: refArea <-> refPeriod swapped vs o11
    rows += [
        iri_row(EG + "o74", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o74", qb.QB_DATASET_PROP, DATASET),
        iri_row(EG + "o74", REF_AREA, INTERVAL_URI.format(2004)),
        iri_row(EG + "o74", REF_PERIOD, AREAS[0]),
        iri_row(EG + "o74", SEX, SEX_M),
        lit_row(EG + "o74", LIFE_EXP, "71.0", datatype=XSD + "decimal"),
    ]
    return rows


def _second_dataset(required_attr: bool = True) -> list[tuple]:
    rows = [
        iri_row(EG + "ds2", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds2", qb.QB_STRUCTURE, EG + "dsd2"),
        iri_row(EG + "dsd2", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd2", qb.QB_COMPONENT, "_:d1"),
        bnode_row(EG + "dsd2", qb.QB_COMPONENT, "_:d2"),
        iri_row("_:d1", qb.QB_DIMENSION, REF_AREA),
        iri_row("_:d2", qb.QB_MEASURE, LIFE_EXP),
    ]
    if required_attr:
        rows += [
            bnode_row(EG + "dsd2", qb.QB_COMPONENT, "_:d3"),
            iri_row("_:d3", qb.QB_ATTRIBUTE, UNIT_MEASURE),
            lit_row("_:d3", qb.QB_COMPONENT_REQUIRED, "true", datatype=XSD + "boolean"),
        ]
    return rows


def mut_ic13() -> list[tuple]:
    """Second dataset with a required attr that is NOT dataset-attached, and
    an obs lacking the attr value."""
    return _second_dataset(required_attr=True) + [
        iri_row(EG + "o76", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o76", qb.QB_DATASET_PROP, EG + "ds2"),
        iri_row(EG + "o76", REF_AREA, AREAS[0]),
        lit_row(EG + "o76", LIFE_EXP, "1.0", datatype=XSD + "decimal"),
    ]


def mut_ic14() -> list[tuple]:
    """Two-measure (non-measureType) dataset; obs carries only one measure."""
    return [
        iri_row(EG + "ds3", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds3", qb.QB_STRUCTURE, EG + "dsd3"),
        iri_row(EG + "dsd3", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd3", qb.QB_COMPONENT, "_:e1"),
        bnode_row(EG + "dsd3", qb.QB_COMPONENT, "_:e2"),
        bnode_row(EG + "dsd3", qb.QB_COMPONENT, "_:e3"),
        iri_row("_:e1", qb.QB_DIMENSION, REF_AREA),
        iri_row("_:e2", qb.QB_MEASURE, LIFE_EXP),
        iri_row("_:e3", qb.QB_MEASURE, EG + "mortality"),
        iri_row(EG + "o77", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o77", qb.QB_DATASET_PROP, EG + "ds3"),
        iri_row(EG + "o77", REF_AREA, AREAS[0]),
        lit_row(EG + "o77", LIFE_EXP, "2.0", datatype=XSD + "decimal"),
    ]


def measure_type_cube() -> list[tuple]:
    """A measureType cube ds4 with two declared measures and two valid obs."""
    rows = [
        iri_row(EG + "ds4", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds4", qb.QB_STRUCTURE, EG + "dsd4"),
        iri_row(EG + "dsd4", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd4", qb.QB_COMPONENT, "_:f1"),
        bnode_row(EG + "dsd4", qb.QB_COMPONENT, "_:f2"),
        bnode_row(EG + "dsd4", qb.QB_COMPONENT, "_:f3"),
        bnode_row(EG + "dsd4", qb.QB_COMPONENT, "_:f4"),
        iri_row("_:f1", qb.QB_DIMENSION, REF_AREA),
        iri_row("_:f2", qb.QB_DIMENSION, qb.QB_MEASURE_TYPE),
        iri_row("_:f3", qb.QB_MEASURE, LIFE_EXP),
        iri_row("_:f4", qb.QB_MEASURE, EG + "mortality"),
        iri_row(EG + "mortality", qb.RDF_TYPE, qb.QB_MEASURE_PROPERTY),
    ]
    # a complete pair of observations for refArea = AREAS[0]
    rows += [
        iri_row(EG + "o78", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o78", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o78", REF_AREA, AREAS[0]),
        iri_row(EG + "o78", qb.QB_MEASURE_TYPE, LIFE_EXP),
        lit_row(EG + "o78", LIFE_EXP, "70.0", datatype=XSD + "decimal"),
        iri_row(EG + "o79", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o79", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o79", REF_AREA, AREAS[0]),
        iri_row(EG + "o79", qb.QB_MEASURE_TYPE, EG + "mortality"),
        lit_row(EG + "o79", EG + "mortality", "0.5", datatype=XSD + "decimal"),
    ]
    return rows


def mut_ic15() -> list[tuple]:
    """o90: measureType says mortality but only lifeExpectancy has a value."""
    return measure_type_cube() + [
        iri_row(EG + "o90", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o90", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o90", REF_AREA, AREAS[1]),
        iri_row(EG + "o90", qb.QB_MEASURE_TYPE, EG + "mortality"),
        lit_row(EG + "o90", LIFE_EXP, "66.0", datatype=XSD + "decimal"),
    ]


def mut_ic16() -> list[tuple]:
    """o91 carries two qb:measureType values."""
    return measure_type_cube() + [
        iri_row(EG + "o91", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o91", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o91", REF_AREA, AREAS[1]),
        iri_row(EG + "o91", qb.QB_MEASURE_TYPE, LIFE_EXP),
        iri_row(EG + "o91", qb.QB_MEASURE_TYPE, EG + "mortality"),
        lit_row(EG + "o91", LIFE_EXP, "66.0", datatype=XSD + "decimal"),
        lit_row(EG + "o91", EG + "mortality", "0.1", datatype=XSD + "decimal"),
    ]


def mut_ic17() -> list[tuple]:
    """Lone obs for refArea=cardiff in the 2-measure measureType cube:
    its dim-value group has size 1 != 2 declared measures."""
    return measure_type_cube() + [
        iri_row(EG + "o92", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o92", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o92", REF_AREA, AREAS[1]),
        iri_row(EG + "o92", qb.QB_MEASURE_TYPE, LIFE_EXP),
        lit_row(EG + "o92", LIFE_EXP, "66.0", datatype=XSD + "decimal"),
    ]


def mut_ic18() -> list[tuple]:
    """slice1 claims o99 but o99's qb:dataSet is ds2."""
    return [
        iri_row(EG + "slice1", qb.QB_OBSERVATION_PROP, EG + "o99"),
        iri_row(EG + "o99", qb.QB_DATASET_PROP, EG + "ds2"),
    ]


def codelist_cube() -> list[tuple]:
    """ds5: dims with ConceptScheme and Collection code lists (IC-19)."""
    return [
        iri_row(EG + "ds5", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds5", qb.QB_STRUCTURE, EG + "dsd5"),
        iri_row(EG + "dsd5", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd5", qb.QB_COMPONENT, "_:g1"),
        bnode_row(EG + "dsd5", qb.QB_COMPONENT, "_:g2"),
        bnode_row(EG + "dsd5", qb.QB_COMPONENT, "_:g3"),
        iri_row("_:g1", qb.QB_DIMENSION, EG + "city"),
        iri_row("_:g2", qb.QB_DIMENSION, EG + "city2"),
        iri_row("_:g3", qb.QB_MEASURE, LIFE_EXP),
        iri_row(EG + "city", qb.QB_CODE_LIST, EG + "cities"),
        iri_row(EG + "city2", qb.QB_CODE_LIST, EG + "colCities"),
        iri_row(EG + "cities", qb.RDF_TYPE, qb.SKOS_CONCEPT_SCHEME),
        iri_row(EG + "colCities", qb.RDF_TYPE, qb.SKOS_COLLECTION),
        # ConceptScheme membership
        iri_row(EG + "cardiffC", qb.RDF_TYPE, qb.SKOS_CONCEPT),
        iri_row(EG + "cardiffC", qb.SKOS_IN_SCHEME, EG + "cities"),
        # Collection with a 2-deep member chain
        iri_row(EG + "colCities", qb.SKOS_MEMBER, EG + "midCol"),
        iri_row(EG + "midCol", qb.SKOS_MEMBER, EG + "leafC"),
        iri_row(EG + "leafC", qb.RDF_TYPE, qb.SKOS_CONCEPT),
        iri_row(EG + "unknownC", qb.RDF_TYPE, qb.SKOS_CONCEPT),
        iri_row(EG + "outC", qb.RDF_TYPE, qb.SKOS_CONCEPT),
    ]


def mut_ic19() -> list[tuple]:
    return codelist_cube() + [
        # o81 valid on both dims
        iri_row(EG + "o81", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o81", qb.QB_DATASET_PROP, EG + "ds5"),
        iri_row(EG + "o81", EG + "city", EG + "cardiffC"),
        iri_row(EG + "o81", EG + "city2", EG + "leafC"),
        lit_row(EG + "o81", LIFE_EXP, "1.0", datatype=XSD + "decimal"),
        # o82: city value typed Concept but not in scheme; city2 value outside collection
        iri_row(EG + "o82", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o82", qb.QB_DATASET_PROP, EG + "ds5"),
        iri_row(EG + "o82", EG + "city", EG + "unknownC"),
        iri_row(EG + "o82", EG + "city2", EG + "outC"),
        lit_row(EG + "o82", LIFE_EXP, "2.0", datatype=XSD + "decimal"),
    ]


def hierarchy_cube_direct() -> list[tuple]:
    """ds6: dim with a HierarchicalCodeList using a direct pcp (IC-20)."""
    return [
        iri_row(EG + "ds6", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds6", qb.QB_STRUCTURE, EG + "dsd6"),
        iri_row(EG + "dsd6", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd6", qb.QB_COMPONENT, "_:h1"),
        bnode_row(EG + "dsd6", qb.QB_COMPONENT, "_:h2"),
        iri_row("_:h1", qb.QB_DIMENSION, EG + "geo"),
        iri_row("_:h2", qb.QB_MEASURE, LIFE_EXP),
        iri_row(EG + "geo", qb.QB_CODE_LIST, EG + "geoHier"),
        iri_row(EG + "geoHier", qb.RDF_TYPE, qb.QB_HIERARCHICAL_CODE_LIST),
        iri_row(EG + "geoHier", qb.QB_HIERARCHY_ROOT, EG + "rootGeo"),
        iri_row(EG + "geoHier", qb.QB_PARENT_CHILD_PROPERTY, EG + "hasPart"),
        iri_row(EG + "rootGeo", EG + "hasPart", EG + "midGeo"),
        iri_row(EG + "midGeo", EG + "hasPart", EG + "leafGeo"),
    ]


def mut_ic20() -> list[tuple]:
    return hierarchy_cube_direct() + [
        iri_row(EG + "o85", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o85", qb.QB_DATASET_PROP, EG + "ds6"),
        iri_row(EG + "o85", EG + "geo", EG + "leafGeo"),
        lit_row(EG + "o85", LIFE_EXP, "1.0", datatype=XSD + "decimal"),
        iri_row(EG + "o86", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o86", qb.QB_DATASET_PROP, EG + "ds6"),
        iri_row(EG + "o86", EG + "geo", EG + "island"),
        lit_row(EG + "o86", LIFE_EXP, "2.0", datatype=XSD + "decimal"),
    ]


def hierarchy_cube_inverse() -> list[tuple]:
    """ds7: HierarchicalCodeList with an inverse (bnode + owl:inverseOf) pcp."""
    return [
        iri_row(EG + "ds7", qb.RDF_TYPE, qb.QB_DATASET),
        iri_row(EG + "ds7", qb.QB_STRUCTURE, EG + "dsd7"),
        iri_row(EG + "dsd7", qb.RDF_TYPE, qb.QB_DSD),
        bnode_row(EG + "dsd7", qb.QB_COMPONENT, "_:i1"),
        bnode_row(EG + "dsd7", qb.QB_COMPONENT, "_:i2"),
        iri_row("_:i1", qb.QB_DIMENSION, EG + "geo2"),
        iri_row("_:i2", qb.QB_MEASURE, LIFE_EXP),
        iri_row(EG + "geo2", qb.QB_CODE_LIST, EG + "geoHier2"),
        iri_row(EG + "geoHier2", qb.RDF_TYPE, qb.QB_HIERARCHICAL_CODE_LIST),
        iri_row(EG + "geoHier2", qb.QB_HIERARCHY_ROOT, EG + "root2"),
        bnode_row(EG + "geoHier2", qb.QB_PARENT_CHILD_PROPERTY, "_:inv1"),
        iri_row("_:inv1", qb.OWL_INVERSE_OF, EG + "partOf"),
        iri_row(EG + "leaf2", EG + "partOf", EG + "mid2"),
        iri_row(EG + "mid2", EG + "partOf", EG + "root2"),
    ]


def mut_ic21() -> list[tuple]:
    return hierarchy_cube_inverse() + [
        iri_row(EG + "o87", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o87", qb.QB_DATASET_PROP, EG + "ds7"),
        iri_row(EG + "o87", EG + "geo2", EG + "leaf2"),
        lit_row(EG + "o87", LIFE_EXP, "1.0", datatype=XSD + "decimal"),
        iri_row(EG + "o88", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o88", qb.QB_DATASET_PROP, EG + "ds7"),
        iri_row(EG + "o88", EG + "geo2", EG + "island2"),
        lit_row(EG + "o88", LIFE_EXP, "2.0", datatype=XSD + "decimal"),
    ]


def mut_ic17_one_sided() -> list[tuple]:
    """o93 carries qb:measureType but NO refArea value: under the reference's
    one-sided skip (ValidatorIC17.java:87) it compares EQUAL to o78/o79 (the
    dim is skipped whenever either side lacks exactly one value), making the
    equal-set {o78, o79, o93} of size 3 != 2 measures -> all three flagged
    with 0 unequal observations."""
    return measure_type_cube() + [
        iri_row(EG + "o93", qb.RDF_TYPE, qb.QB_OBSERVATION),
        iri_row(EG + "o93", qb.QB_DATASET_PROP, EG + "ds4"),
        iri_row(EG + "o93", qb.QB_MEASURE_TYPE, LIFE_EXP),
        lit_row(EG + "o93", LIFE_EXP, "61.0", datatype=XSD + "decimal"),
    ]
