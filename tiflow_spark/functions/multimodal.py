"""Multimodal column plumbing: opaque binary media + typed metadata.

The contract for image/audio/video at scale: the media payload is an opaque
``binary`` column (or an object-store URI for large blobs) travelling beside
typed metadata columns; all decode/feature work runs in Arrow-batched
``mapInPandas`` so each Python worker sees columnar byte batches, never
per-row objects.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image``/``decode_audio`` are explicit stubs: the Spark-side plumbing
(schema, batching, partition flow) is real and tested; the codec call raises
``NotImplementedError`` unless a deterministic fake is requested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, first_byte int, sha16 string, frame_count int"


def decode_image(data: bytes) -> object:
    """STUB — real impl: PIL.Image.open(io.BytesIO(data)). Not in container."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(data: bytes) -> object:
    """STUB — real impl: soundfile/torchaudio decode. Not in container."""
    raise NotImplementedError("audio codec not available in this environment")


def binary_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Model a media table: (doc_id, media binary). In production the binary
    column is read straight from parquet/Iceberg BINARY storage."""
    return docs.select("doc_id", F.col(payload_col).cast("binary").alias("media"))


def extract_media_meta(media_df: DataFrame, frame_stride: int = 40) -> DataFrame:
    """Arrow-batched metadata/feature extraction over opaque binary media.

    Deterministic stand-in for the codec stage: byte length, first byte
    (magic-number sniff stand-in), content digest, and a frame-sample count
    (len // stride — what a fixed-stride video frame sampler would select).
    Each batch is a pandas DataFrame of byte strings — the exact shape a real
    decoder (decode_image/decode_audio) consumes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": media.map(len).astype("int64"),
                    "first_byte": media.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "sha16": media.map(lambda b: hashlib.sha256(b).hexdigest()[:16]),
                    "frame_count": media.map(lambda b: len(b) // frame_stride).astype("int32"),
                }
            )

    return media_df.mapInPandas(extract, META_SCHEMA)
