"""RDF Data Cube / RDF / SKOS / OWL vocabulary constants.

Mirrors the constant table of the reference validator
(/root/reference/src/main/java/cn/yyz/nospa/validator/nonsparql/ValidatorBase.java:295-372)
as plain URI strings used in DataFrame filter predicates.
"""

PREFIX_CUBE = "http://purl.org/linked-data/cube#"
PREFIX_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
PREFIX_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
PREFIX_SKOS = "http://www.w3.org/2004/02/skos/core#"
PREFIX_OWL = "http://www.w3.org/2002/07/owl#"
PREFIX_XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = PREFIX_RDF + "type"

QB_OBSERVATION_PROP = PREFIX_CUBE + "observation"   # qb:observation (slice->obs)
QB_OBSERVATION = PREFIX_CUBE + "Observation"        # class
QB_DATASET_PROP = PREFIX_CUBE + "dataSet"           # qb:dataSet (obs->ds)
QB_DATASET = PREFIX_CUBE + "DataSet"                # class
QB_SLICE_PROP = PREFIX_CUBE + "slice"               # qb:slice (ds->slice)
QB_SLICE = PREFIX_CUBE + "Slice"                    # class
QB_SLICE_KEY_PROP = PREFIX_CUBE + "sliceKey"        # qb:sliceKey (dsd->key)
QB_SLICE_KEY = PREFIX_CUBE + "SliceKey"             # class
QB_SLICE_STRUCTURE = PREFIX_CUBE + "sliceStructure"
QB_COMPONENT = PREFIX_CUBE + "component"
QB_COMPONENT_PROPERTY = PREFIX_CUBE + "componentProperty"
QB_DIMENSION_PROPERTY = PREFIX_CUBE + "DimensionProperty"
QB_DIMENSION = PREFIX_CUBE + "dimension"
QB_MEASURE_PROPERTY = PREFIX_CUBE + "MeasureProperty"
QB_MEASURE = PREFIX_CUBE + "measure"
QB_MEASURE_TYPE = PREFIX_CUBE + "measureType"
QB_ATTRIBUTE_PROPERTY = PREFIX_CUBE + "AttributeProperty"
QB_ATTRIBUTE = PREFIX_CUBE + "attribute"
QB_COMPONENT_ATTACHMENT = PREFIX_CUBE + "componentAttachment"
QB_COMPONENT_REQUIRED = PREFIX_CUBE + "componentRequired"
QB_STRUCTURE = PREFIX_CUBE + "structure"
QB_DSD = PREFIX_CUBE + "DataStructureDefinition"
QB_CODE_LIST = PREFIX_CUBE + "codeList"
QB_HIERARCHICAL_CODE_LIST = PREFIX_CUBE + "HierarchicalCodeList"
QB_HIERARCHY_ROOT = PREFIX_CUBE + "hierarchyRoot"
QB_PARENT_CHILD_PROPERTY = PREFIX_CUBE + "parentChildProperty"

RDFS_RANGE = PREFIX_RDFS + "range"
SKOS_CONCEPT = PREFIX_SKOS + "Concept"
SKOS_CONCEPT_SCHEME = PREFIX_SKOS + "ConceptScheme"
SKOS_IN_SCHEME = PREFIX_SKOS + "inScheme"
SKOS_COLLECTION = PREFIX_SKOS + "Collection"
SKOS_MEMBER = PREFIX_SKOS + "member"
OWL_INVERSE_OF = PREFIX_OWL + "inverseOf"

XSD_BOOLEAN = PREFIX_XSD + "boolean"
XSD_DECIMAL = PREFIX_XSD + "decimal"
XSD_DATE = PREFIX_XSD + "date"
XSD_STRING = PREFIX_XSD + "string"
