"""Multimodal column plumbing: image/audio/video as typed binary columns.

ALL THREE container decodes are REAL and library-free: payloads are valid
24bpp BMP files, 16-bit mono PCM WAV files, and uncompressed-index AVI
files (RIFF avih header + movi '00db' frame chunks), and the mapInPandas
kernels parse them byte-for-byte (BITMAPINFOHEADER width/height; RIFF
chunk walks for WAV fmt/data -> sample_rate + duration and for AVI
avih/movi -> width/height/frame count/duration + per-frame byte ranges).
Only frame PIXEL decode remains out of scope — that needs video codecs
this container does not ship; frame_sample emits the real (frame_idx,
byte offset, size) index a codec stage would consume.
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


AVI_FPS = 25  # fixed 25fps -> 40,000 us/frame in the avih header
_AVI_FRAME_BYTES = 16  # every '00db' chunk carries 16 payload bytes (even: no pad)


def build_avi(width: int, height: int, n_frames: int, fill: bytes) -> bytes:
    """A minimal valid AVI: RIFF('AVI ') containing LIST(hdrl){avih} and
    LIST(movi){n_frames x '00db' chunks of _AVI_FRAME_BYTES each}; frame
    bytes cycle through ``fill``. Fixed 25fps. Total size is exactly
    100 + 24 * n_frames bytes — header arithmetic a SQL oracle can
    reproduce."""
    fill = fill or b"\x00"
    reps = _AVI_FRAME_BYTES * n_frames // len(fill) + 1
    data = fill * reps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // AVI_FPS,  # dwMicroSecPerFrame
        AVI_FPS * _AVI_FRAME_BYTES,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags
        n_frames,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        _AVI_FRAME_BYTES,  # dwSuggestedBufferSize
        width,
        height,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    frames = b"".join(
        b"00db"
        + struct.pack("<I", _AVI_FRAME_BYTES)
        + data[i * _AVI_FRAME_BYTES : (i + 1) * _AVI_FRAME_BYTES]
        for i in range(n_frames)
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(frames)) + b"movi" + frames
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


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


def parse_avi_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) from the avih main header
    (RIFF walk to LIST/hdrl -> avih; duration = frames x us-per-frame)."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        csize = int.from_bytes(payload[off + 4 : off + 8], "little")
        if cid == b"LIST" and payload[off + 8 : off + 12] == b"hdrl":
            inner = off + 12
            end = off + 8 + csize
            while inner + 8 <= end:
                sid = payload[inner : inner + 4]
                ssize = int.from_bytes(payload[inner + 4 : inner + 8], "little")
                if sid == b"avih" and ssize >= 40:
                    d = payload[inner + 8 : inner + 8 + ssize]
                    mspf = int.from_bytes(d[0:4], "little")
                    n_frames = int.from_bytes(d[16:20], "little")
                    width = int.from_bytes(d[32:36], "little")
                    height = int.from_bytes(d[36:40], "little")
                    return width, height, n_frames, n_frames * mspf // 1000
                inner += 8 + ssize + (ssize % 2)
        off += 8 + csize + (csize % 2)
    raise ValueError("AVI payload missing avih header")


def parse_avi_frames(payload: bytes) -> list[tuple[int, int, int]]:
    """(frame_idx, byte_offset, size) for every '00db'/'00dc' chunk inside
    LIST/movi — the real frame index a codec stage would seek into."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[tuple[int, int, int]] = []
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        csize = int.from_bytes(payload[off + 4 : off + 8], "little")
        if cid == b"LIST" and payload[off + 8 : off + 12] == b"movi":
            inner = off + 12
            end = off + 8 + csize
            while inner + 8 <= end:
                sid = payload[inner : inner + 4]
                ssize = int.from_bytes(payload[inner + 4 : inner + 8], "little")
                if sid in (b"00db", b"00dc"):
                    frames.append((len(frames), inner + 8, ssize))
                inner += 8 + ssize + (ssize % 2)
        off += 8 + csize + (csize % 2)
    return frames


# ---------------------------------------------------------------------------
# testdata adapter
# ---------------------------------------------------------------------------
def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Testdata adapter: wrap each document as REAL media — doc_id % 3
    picks the kind; image docs become valid BMPs (width/height from id
    arithmetic, pixels from the text bytes), audio docs become valid WAVs
    (sample_rate/length from id/text arithmetic, samples from the text
    bytes), video docs become valid AVIs (dims from id arithmetic, frame
    count from text length, frame bytes from the text). All parameters
    are pure (id, text-length) arithmetic so a SQL oracle can predict
    every decoded feature."""

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
                    payloads.append(
                        build_avi(did % 320 + 16, did % 240 + 16, len(raw) % 48 + 2, raw)
                    )
                    mimes.append("video/x-msvideo")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": kinds,
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    from ..session import spread

    # parallelism floor: a single-partition doc scan would build every
    # payload on one Python worker (guide §2.5); no-op at scale
    return spread(docs.select(id_col, text_col)).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Every feature comes from REAL header parsing (parse_bmp_header /
    parse_wav_header / parse_avi_header): image -> width/height, audio ->
    sample_rate/duration_ms, video -> width/height/duration_ms.
    Partitioning contract: payloads stay where they are — no shuffle; each
    Arrow batch carries (media_id, kind, payload) and emits fixed-width
    features. At 100 TB this is the pattern for GPU/codec stages too:
    batch in, columnar features out, no per-row Python outside the batch
    loop."""
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
                else:
                    w, h, _nf, dur = parse_avi_header(p)
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


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("byte_offset", IntegerType(), False),
        StructField("n_bytes", IntegerType(), False),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame index: walks each AVI's movi chunk list and emits
    (frame_idx, byte_offset, n_bytes) for every ``every_n``-th frame —
    exactly the seek table a downstream codec/GPU stage consumes. Frame
    PIXEL decode is the one remaining stub (needs codecs this container
    does not ship); the byte ranges here are the real contract it would
    plug into. Same no-shuffle mapInPandas batch shape as
    extract_features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, sizes = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for idx, off, size in parse_avi_frames(p)[::every_n]:
                    ids.append(mid)
                    idxs.append(idx)
                    offs.append(off)
                    sizes.append(size)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "byte_offset": pd.array(offs, dtype="int32"),
                    "n_bytes": pd.array(sizes, dtype="int32"),
                }
            )

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        gen, schema=FRAMES_SCHEMA
    )
