"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas over mapInPandas.

The Spark-side plumbing is real — schemas, partition-preserving
mapInPandas, batch shapes, deterministic checksums. The codec layer has
two real stdlib decoders (PNG IHDR+CRC parse, WAV via `wave`) with PIL
as an optional upgrade when importable (this container ships none), and
a deterministic fake decoder (`fake=True`) that derives metadata from
the payload bytes alone — the oracle-gated path, since the driver's
documents table carries text stand-in payloads, not encoded media.
Video decode stays NotImplementedError in real mode (no stdlib codec);
swapping in torchvision/av later only touches _decode_video_real.

Scale notes: media rows are large; the pipeline never shuffles them —
mapInPandas is a narrow transformation, so feature extraction runs
where the scan ran, and only the (tiny) feature rows move afterwards.
Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch,
which must be set low (e.g. 64) when payloads are MBs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

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
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("source", StringType(), True),
                    StructField("declared_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("byte_len", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def media_frame_from_documents(docs: DataFrame) -> DataFrame:
    """documents → a MEDIA_SCHEMA frame with deterministic fake payloads
    (the utf-8 bytes of the text stand in for encoded media)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_image_real(payload: bytes) -> dict[str, Any]:
    """Real image decode: PIL when importable, else stdlib PNG parse.

    The PNG path reads width/height from the IHDR chunk and verifies its
    CRC32 — a malformed payload raises ValueError rather than returning
    garbage metadata.
    """
    try:
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as img:
            return {"width": img.width, "height": img.height, "n_frames": None}
    except ImportError:
        pass
    import struct
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("unsupported image format (PNG required without PIL)")
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        raise ValueError("truncated PNG: no IHDR chunk")
    ihdr = payload[16:29]  # 13-byte IHDR body
    crc_expected = struct.unpack(">I", payload[29:33])[0]
    if zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF != crc_expected:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack(">II", ihdr[:8])
    return {"width": int(width), "height": int(height), "n_frames": None}


def _decode_audio_real(payload: bytes) -> dict[str, Any]:
    """Real audio decode: stdlib `wave` (RIFF/WAVE PCM)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        return {"width": None, "height": None, "n_frames": int(wf.getnframes())}


def _decode_video_real(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "real video decode requires a codec library (none in stdlib); "
        "pass fake=True for the deterministic stub decoder"
    )


def _real_decode(mime: str, payload: bytes) -> dict[str, Any]:
    if mime.startswith("image/"):
        return _decode_image_real(payload)
    if mime.startswith("audio/"):
        return _decode_audio_real(payload)
    return _decode_video_real(payload)


def _fake_decode(mime: str, payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in: metadata derived purely from the bytes, so
    oracles and tests can recompute it."""
    n = len(payload)
    if mime.startswith("image/"):
        return {"width": n % 640 + 1, "height": n % 480 + 1, "n_frames": None}
    if mime.startswith("audio/"):
        return {"width": None, "height": None, "n_frames": n % 16000 + 1}
    return {"width": n % 1920 + 1, "height": n % 1080 + 1, "n_frames": n % 24 + 1}


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: checksum + decoded metadata.

    Arrow-batched; one output row per input row; narrow (no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                payload = bytes(payload)
                decoded = (
                    _fake_decode(mime, payload) if fake else _real_decode(mime, payload)
                )
                rows.append(
                    {
                        "media_id": int(media_id),
                        "mime": mime,
                        "byte_len": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                        "width": decoded["width"],
                        "height": decoded["height"],
                        "n_frames": decoded["n_frames"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            ).astype(
                {
                    "media_id": "int64",
                    "byte_len": "int64",
                    "width": "Int32",
                    "height": "Int32",
                    "n_frames": "Int32",
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' offset.

    Real video decode would replace the offset arithmetic with codec
    frame indices; the explode/partitioning shape is identical.
    """
    video = media.where(F.col("mime").startswith("video/"))
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col("payload")) - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return video.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
