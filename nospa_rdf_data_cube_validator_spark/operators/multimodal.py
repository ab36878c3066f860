"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (this container ships no image/audio libs): a
clearly-marked deterministic fake stands in behind the same mapInPandas
signature, so the Spark-side contract — schema, Arrow batch shape,
partitioning, UDF boundaries — is real and tested, and swapping in PIL/
torchaudio later changes one function body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("checksum", StringType(), False),
    ]
)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Testdata adapter: wrap document text bytes as opaque binary payloads
    so the multimodal plumbing has real (if fake-media) input."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake for image/audio decode.

    A real deployment replaces this body with PIL.Image.open /
    soundfile.read; the container has neither, so dimensions derive from the
    payload bytes (stable, testable). The function signature and the
    batch-level plumbing around it are the real contract."""
    if payload is None:
        raise NotImplementedError("decode of NULL payload (no media lib in this environment)")
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Partitioning contract: payloads stay where they are — no shuffle; each
    Arrow batch carries (media_id, kind, payload) and emits fixed-width
    features. At 100 TB this is the pattern for GPU/codec stages too: batch
    in, columnar features out, no per-row Python."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB of video frame sampling: emits one row per sampled 'frame'
    (byte-offset stand-ins). Real frame decode is NotImplemented here; the
    explode/partition shape is what matters for the plan."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length(F.col("payload")) / every_n_bytes).cast("int") - 1, F.lit(0)
                    ),
                )
            ).alias("frame_idx"),
        )
    )
