"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas over mapInPandas.

The Spark-side plumbing is real — schemas, partition-preserving
mapInPandas, batch shapes, deterministic checksums. The codec layer is
stubbed: this container ships no image/audio libraries, so `decode_*`
raises NotImplementedError unless the caller opts into the deterministic
fake decoder (`fake=True`), which derives plausible metadata from the
payload bytes alone. Swapping in PIL/torchaudio later only touches
_decode_image_real/_decode_audio_real.

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


def _decode_image_real(payload: bytes) -> dict[str, Any]:
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "real image decode requires pillow, which is not installed; "
            "pass fake=True for the deterministic stub decoder"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")  # pragma: no cover


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
                    _fake_decode(mime, payload) if fake else _decode_image_real(payload)
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
