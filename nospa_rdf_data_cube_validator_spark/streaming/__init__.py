from .ingest import (  # noqa: F401
    stream_transcripts,
    streaming_mention_counts,
    streaming_kg_materialize,
    streaming_turn_order_check,
)
