"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Image and audio decode are REAL (library-free): payloads are valid 24bpp
BMP files and 16-bit mono PCM WAV files, and the mapInPandas kernel parses
their headers byte-for-byte (BITMAPINFOHEADER width/height; RIFF chunk
walk for fmt/data -> sample_rate + duration). Only VIDEO frame decode
remains a documented stub — real frame extraction needs codecs this
container does not ship; the explode/partition shape of frame_sample is
the real contract there.
"""

from __future__ import annotations

import struct
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
        StructField("width", IntegerType(), True),  # image only
        StructField("height", IntegerType(), True),  # image only
        StructField("sample_rate", IntegerType(), True),  # audio only
        StructField("duration_ms", IntegerType(), True),  # audio only
        StructField("checksum", StringType(), False),
    ]
)


# ---------------------------------------------------------------------------
# container builders (pure Python, deterministic — used by docs_as_media and
# by tests to pin the decode parsers)
# ---------------------------------------------------------------------------
def build_bmp(width: int, height: int, fill: bytes) -> bytes:
    """A valid 24-bit uncompressed BMP (BITMAPFILEHEADER+BITMAPINFOHEADER,
    rows padded to 4 bytes); pixel bytes cycle through ``fill``."""
    stride = ((width * 3 + 3) // 4) * 4
    data_size = stride * height
    fill = fill or b"\x00"
    reps = data_size // len(fill) + 1
    pixels = (fill * reps)[:data_size]
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        54 + data_size,  # file size
        0,
        0,
        54,  # pixel data offset
        40,  # BITMAPINFOHEADER size
        width,
        height,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        data_size,
        2835,  # 72 DPI
        2835,
        0,
        0,
    )
    return header + pixels


def build_wav(sample_rate: int, n_samples: int, fill: bytes) -> bytes:
    """A valid 16-bit mono PCM WAV (RIFF/WAVE with fmt + data chunks);
    sample bytes cycle through ``fill``."""
    data_size = 2 * n_samples
    byte_rate = sample_rate * 2
    fill = fill or b"\x00"
    reps = data_size // len(fill) + 1
    samples = (fill * reps)[:data_size]
    header = struct.pack(
        "<4sI4s" "4sIHHIIHH" "4sI",
        b"RIFF",
        36 + data_size,
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # PCM
        1,  # mono
        sample_rate,
        byte_rate,
        2,  # block align
        16,  # bits per sample
        b"data",
        data_size,
    )
    return header + samples


# ---------------------------------------------------------------------------
# header parsers (the real decode — no media libraries involved)
# ---------------------------------------------------------------------------
def parse_bmp_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from the BITMAPINFOHEADER at fixed offsets 18/22
    (little-endian int32; height may be negative for top-down files —
    reported as magnitude)."""
    if payload is None or len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    return width, abs(height)


def parse_wav_header(payload: bytes) -> tuple[int, int]:
    """(sample_rate, duration_ms) via a proper RIFF chunk walk: read the
    fmt chunk's sample_rate/byte_rate and the data chunk's size;
    duration_ms = data_size * 1000 // byte_rate (floor)."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    sample_rate = byte_rate = data_size = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        csize = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + csize]
        if cid == b"fmt " and csize >= 16:
            sample_rate = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
        elif cid == b"data":
            data_size = csize
        off += 8 + csize + (csize % 2)  # RIFF chunks are 2-byte aligned
    if sample_rate is None or byte_rate is None or data_size is None or byte_rate == 0:
        raise ValueError("WAV payload missing fmt/data chunk")
    return sample_rate, data_size * 1000 // byte_rate


# ---------------------------------------------------------------------------
# testdata adapter
# ---------------------------------------------------------------------------
def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Testdata adapter: wrap each document as REAL media — doc_id % 3
    picks the kind; image docs become valid BMPs (width/height from id
    arithmetic, pixels from the text bytes), audio docs become valid WAVs
    (sample_rate/length from id/text arithmetic, samples from the text
    bytes), video docs stay opaque byte streams (no free codec). All
    parameters are pure (id, text-length) arithmetic so a SQL oracle can
    predict every decoded feature."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, payloads, mimes = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                raw = (text or "").encode("utf-8")
                m = did % 3
                if m == 0:
                    kinds.append("image")
                    payloads.append(build_bmp(did % 61 + 1, did % 13 + 1, raw))
                    mimes.append("image/bmp")
                elif m == 1:
                    kinds.append("audio")
                    payloads.append(build_wav(8000 * (did % 4 + 1), len(raw) % 500 + 50, raw))
                    mimes.append("audio/wav")
                else:
                    kinds.append("video")
                    payloads.append(raw)
                    mimes.append("application/octet-stream")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": kinds,
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Image/audio features come from REAL header parsing (parse_bmp_header /
    parse_wav_header); video rows carry NULL dims (frame decode needs
    codecs — see frame_sample). Partitioning contract: payloads stay where
    they are — no shuffle; each Arrow batch carries (media_id, kind,
    payload) and emits fixed-width features. At 100 TB this is the pattern
    for GPU/codec stages too: batch in, columnar features out, no per-row
    Python outside the batch loop."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, rates, durs = [], [], [], []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                w = h = sr = dur = None
                if kind == "image":
                    w, h = parse_bmp_header(p)
                elif kind == "audio":
                    sr, dur = parse_wav_header(p)
                widths.append(w)
                heights.append(h)
                rates.append(sr)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB of video frame sampling: emits one row per sampled 'frame'
    (byte-offset stand-ins). Real frame decode is NotImplemented here (no
    codec library in this container); the explode/partition shape is what
    matters for the plan."""
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
