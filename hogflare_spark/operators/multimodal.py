"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas over mapInPandas.

The Spark-side plumbing is real — schemas, partition-preserving
mapInPandas, batch shapes, deterministic checksums. The codec layer has
two real stdlib decoders (PNG IHDR+CRC parse, WAV via `wave`) with PIL
as an optional upgrade when importable (this container ships none), and
a deterministic fake decoder (`fake=True`) that derives metadata from
the payload bytes alone — the oracle-gated path, since the driver's
documents table carries text stand-in payloads, not encoded media.
Video metadata decode is a real stdlib ISO-BMFF box walk (moov/trak/
tkhd width+height, stsz frame count — no codec needed for metadata);
pixel-level decode would swap a codec library into _decode_video_real.

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


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for ISO-BMFF boxes in [start, end).

    Handles 64-bit largesize (size==1) and to-end-of-file (size==0) boxes;
    a box that overruns its container raises ValueError instead of
    yielding garbage offsets.
    """
    import struct

    off = start
    while off + 8 <= end:
        size, typ = struct.unpack(">I4s", buf[off : off + 8])
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack(">Q", buf[off + 8 : off + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError("malformed MP4 box bounds")
        yield typ, off + hdr, off + size
        off += size


def _find_box(buf: bytes, start: int, end: int, path: list[bytes]):
    """Descend a path of box types; return (body_start, end) or None."""
    for typ, a, b in _iter_boxes(buf, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return a, b
            return _find_box(buf, a, b, path[1:])
    return None


def _decode_video_real(payload: bytes) -> dict[str, Any]:
    """Real MP4 metadata decode: stdlib ISO-BMFF box walk, no codec.

    Width/height come from the video track's `tkhd` box (16.16 fixed
    point, offset depends on the fullbox version) and the frame count
    from its `stsz` sample table — pure container metadata, which is all
    the feature pipeline needs. Tracks whose `hdlr` handler is not
    `vide` (audio, hint, metadata tracks) are skipped.
    """
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("unsupported video format (MP4/ISO-BMFF required)")
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    if moov is None:
        raise ValueError("MP4: no moov box")
    for typ, a, b in _iter_boxes(payload, *moov):
        if typ != b"trak":
            continue
        hdlr = _find_box(payload, a, b, [b"mdia", b"hdlr"])
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find_box(payload, a, b, [b"tkhd"])
        if tkhd is None:
            raise ValueError("MP4 video trak: no tkhd box")
        version = payload[tkhd[0]]
        # fullbox(4) + times/ids (v0: 20, v1: 32) + reserved/layer/
        # volume (16) + matrix (36) → width, height as 16.16 fixed
        wh_off = tkhd[0] + 4 + (32 if version == 1 else 20) + 16 + 36
        if wh_off + 8 > tkhd[1]:
            raise ValueError("MP4 tkhd too short for width/height")
        w_fixed, h_fixed = struct.unpack(">II", payload[wh_off : wh_off + 8])
        n_frames = None
        stsz = _find_box(payload, a, b, [b"mdia", b"minf", b"stbl", b"stsz"])
        if stsz is not None and stsz[0] + 12 <= stsz[1]:
            n_frames = struct.unpack(">I", payload[stsz[0] + 8 : stsz[0] + 12])[0]
        return {
            "width": int(w_fixed >> 16),
            "height": int(h_fixed >> 16),
            "n_frames": int(n_frames) if n_frames is not None else None,
        }
    raise ValueError("MP4: no video track")


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
