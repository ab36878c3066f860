from .rdf import read_rdf, read_ntriples, read_turtle, write_ntriples, write_parquet  # noqa: F401
from .transcripts import synth_transcripts, read_transcripts  # noqa: F401
