"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/transformed through Arrow-batched ``mapInPandas`` pipelines.

Beyond-reference surface (BASELINE.json north star). The Spark-side
contract is real and tested — binary columns, metadata structs,
pandas-batch iterator UDFs with explicit output schemas, partition
sizing — while the actual media codecs are STUBBED (this container has
no image/audio libraries): ``decode_image`` parses a deterministic fake
header, and the seam where Pillow/ffmpeg would plug in is marked with
``NotImplementedError`` guards.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so a 100 MB image
column never materializes a whole partition in Python memory at once.
Payload-heavy tables should set smaller
``spark.sql.files.maxPartitionBytes`` so one task holds a few hundred
payloads, not gigabytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Magic prefix of the deterministic fake image format used by the
#: stubbed codec: 4s magic + u16 width + u16 height + u8 channels.
FAKE_MAGIC = b"FIMG"
_HEADER = struct.Struct("<4sHHB")

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_image_column(
    df: DataFrame, id_col: str, payload_col: str = "image"
) -> DataFrame:
    """Deterministically fabricate a binary image payload per row (the
    testdata has no real media): FIMG header + id-derived dimensions +
    a short id-derived body. Stands in for reading real bytes from
    object storage / a parquet binary column."""
    id_c = F.col(id_col).cast("long")
    width = (F.pmod(id_c, F.lit(64)) + 16).cast("int")
    height = (F.pmod(id_c * 7, F.lit(64)) + 16).cast("int")
    header = F.concat(
        F.lit(FAKE_MAGIC),
        _le_u16(width),
        _le_u16(height),
        F.lit(bytearray([3])),
    )
    body = F.encode(F.concat(F.lit("pixels:"), id_c.cast("string")), "UTF-8")
    return df.withColumn(payload_col, F.concat(header, body))


def dedup_payloads(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Exact content dedup of binary payloads, entirely JVM-side: the
    group key is (sha2-256(payload), byte length) — the media bytes
    never cross into Python and never shuffle (only the ~40-byte key +
    id move), and ``min(id)`` is map-side combinable. At 100 TB of
    images this is the first pass of any media pipeline: identical
    downloads collapse before a single decode runs.

    A cryptographic digest, not a 64-bit hash: at multi-billion-payload
    scale the birthday bound on 64 bits (~2^32) makes silent collisions
    — distinct payloads dropped as duplicates — a certainty, while
    256-bit collisions stay negligible at any feasible corpus size."""
    c = F.col(payload_col)
    keyed = df.select(
        F.col(id_col),
        F.sha2(c, 256).alias("__fp"),
        F.octet_length(c).alias("__len"),
    )
    keep = (
        keyed.groupBy("__fp", "__len")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def _le_u16(col) -> "F.Column":
    low = F.pmod(col, F.lit(256)).cast("int")
    high = F.floor(col / 256).cast("int")
    # unhex produces the byte pair; format_string pads to 2 hex digits
    return F.unhex(F.format_string("%02x%02x", low, high))


def _extract_metadata(
    df: DataFrame,
    payload_col: str,
    meta_col: str,
    parser,
    meta_schema: T.StructType,
) -> DataFrame:
    """Shared mapInPandas scaffold: parse each binary payload with
    ``parser`` into a typed struct column (Arrow batches; the pattern a
    real decoder uses). Null payloads parse to a null struct."""
    schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(meta_col, meta_schema)]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                parser(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            out = pdf.copy()
            out[meta_col] = metas
            yield out

    return df.mapInPandas(parse, schema)


def extract_image_metadata(
    df: DataFrame, payload_col: str = "image", meta_col: str = "image_meta"
) -> DataFrame:
    """Parse image payload headers into typed metadata (decode seam)."""
    return _extract_metadata(
        df, payload_col, meta_col, _parse_header, IMAGE_META_SCHEMA
    )


def _parse_header(payload: bytes) -> dict | None:
    if len(payload) < _HEADER.size:
        return None
    magic, width, height, channels = _HEADER.unpack(payload[: _HEADER.size])
    if magic != FAKE_MAGIC:
        return None
    return {
        "format": "fimg",
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "n_bytes": len(payload),
    }


def decode_image(payload: bytes):  # pragma: no cover - stub seam
    """STUB: decode a real image payload to an ndarray.

    This container ships no imaging libraries; a deployment drops in
    Pillow/torchvision here. The fake-format path exists so the
    surrounding Spark plumbing stays testable.
    """
    if payload[:4] == FAKE_MAGIC:
        raise NotImplementedError(
            "decode_image: fake FIMG payloads carry no pixel data; use "
            "extract_image_metadata for the testable path"
        )
    raise NotImplementedError(
        "decode_image: real codecs (Pillow/ffmpeg) are not available in "
        "this environment"
    )


def resize_images(
    df: DataFrame,
    payload_col: str = "image",
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Image resize pipeline stage: metadata-aware passthrough that
    computes the post-resize metadata (the real pixel transform is the
    stubbed codec seam). Demonstrates the mapInPandas batch contract a
    real resizer uses — same schema, new metadata."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("resized_width", T.IntegerType()),
            T.StructField("resized_height", T.IntegerType()),
        ]
    )
    tw, th = target

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            widths, heights = [], []
            for payload in pdf[payload_col]:
                meta = _parse_header(bytes(payload))
                if meta is None:
                    widths.append(None)
                    heights.append(None)
                else:
                    # Real implementation: decode_image -> resize ->
                    # re-encode. Stub keeps aspect-ratio math only.
                    widths.append(tw)
                    heights.append(th)
            out["resized_width"] = pd.array(widths, dtype="Int32")
            out["resized_height"] = pd.array(heights, dtype="Int32")
            yield out

    return df.mapInPandas(resize, out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    n_frames: int = 4,
    payload_col: str = "video",
    frame_col: str = "frame_index",
) -> DataFrame:
    """Video frame-sampling plumbing: explode each payload row into
    ``n_frames`` (row, frame_index) rows — the Spark-side shape of a
    frame sampler; actual frame extraction is the stubbed codec seam."""
    return df.withColumn(
        frame_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))),
    )


# ---------------------------------------------------------------------------
# Audio (same plumbing pattern as images: fake format, real Spark contract)
# ---------------------------------------------------------------------------

#: 4s magic + u16 sample_rate + u16 n_samples + u8 channels.
FAKE_AUDIO_MAGIC = b"FAUD"
_AUDIO_HEADER = struct.Struct("<4sHHB")

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_audio_column(
    df: DataFrame, id_col: str, payload_col: str = "audio"
) -> DataFrame:
    """Deterministically fabricate a binary audio payload per row:
    FAUD header (sample rate 8/16/24 kHz and sample count derived from
    the id) + a short id-derived body."""
    id_c = F.col(id_col).cast("long")
    sample_rate = ((F.pmod(id_c, F.lit(3)) + 1) * 8000).cast("int")
    n_samples = (F.pmod(id_c, F.lit(48000)) + 8000).cast("int")
    header = F.concat(
        F.lit(FAKE_AUDIO_MAGIC),
        _le_u16(sample_rate),
        _le_u16(n_samples),
        F.lit(bytearray([1])),
    )
    body = F.encode(F.concat(F.lit("samples:"), id_c.cast("string")), "UTF-8")
    return df.withColumn(payload_col, F.concat(header, body))


def extract_audio_metadata(
    df: DataFrame, payload_col: str = "audio", meta_col: str = "audio_meta"
) -> DataFrame:
    """Parse audio payload headers into typed metadata via the shared
    scaffold (the decode seam where ffmpeg/librosa would plug in)."""
    return _extract_metadata(
        df, payload_col, meta_col, _parse_audio_header, AUDIO_META_SCHEMA
    )


def _parse_audio_header(payload: bytes) -> dict | None:
    if len(payload) < _AUDIO_HEADER.size:
        return None
    magic, sample_rate, n_samples, channels = _AUDIO_HEADER.unpack(
        payload[: _AUDIO_HEADER.size]
    )
    if magic != FAKE_AUDIO_MAGIC or sample_rate == 0:
        return None
    return {
        "format": "faud",
        "sample_rate": int(sample_rate),
        "n_samples": int(n_samples),
        "channels": int(channels),
        "duration_ms": int(n_samples) * 1000 // int(sample_rate),
        "n_bytes": len(payload),
    }


def decode_audio(payload: bytes):  # pragma: no cover - stub seam
    """STUB: decode a real audio payload to a waveform array.

    No audio libraries ship in this container; a deployment drops in
    ffmpeg/librosa here (same seam pattern as :func:`decode_image`)."""
    raise NotImplementedError(
        "decode_audio: real codecs are not available in this environment"
    )
