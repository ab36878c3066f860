"""PySpark-native RDF Data Cube construction + validation engine.

A from-scratch, DataFrame-first reimplementation of the capabilities of
yyz1989/NoSPA-RDF-Data-Cube-Validator (reference at /root/reference):

- a canonical ``triples`` DataFrame data model (the Jena ``Model``
  equivalent, see ``terms.py`` / SURVEY.md §1),
- normalization N1-N5 (``operators.normalize``),
- the 21 integrity constraints as DataFrame joins / anti-joins /
  aggregations (``operators.validate``),
- RDF sources/sinks (``sources.rdf``) with a distributed N-Triples path,
- a KG-construction front-end over multi-turn transcripts
  (``functions.extraction``, ``functions.linking``, ``pipeline``),
- large-scale training-data operators: dedup, similarity search, text
  analysis, multimodal plumbing (``operators.dedup`` etc.).

Everything is expressed against the DataFrame/SQL API so Catalyst/AQE pick
physical plans; Python touches data only through Arrow-vectorized pandas
UDFs (never per-row Python in hot paths).
"""

__version__ = "0.1.0"
