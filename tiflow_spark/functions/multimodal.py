"""Multimodal column plumbing: opaque binary media + typed metadata.

The contract for image/audio/video at scale: the media payload is an opaque
``binary`` column (or an object-store URI for large blobs) travelling beside
typed metadata columns; all decode/feature work runs in Arrow-batched
``mapInPandas`` so each Python worker sees columnar byte batches, never
per-row objects.

Header/metadata decode (format sniff, image dimensions, audio sample
rate/duration) is REAL — pure-stdlib ``struct`` parsers over the container
formats' public layouts (BMP BITMAPINFOHEADER, PNG IHDR, RIFF/WAVE fmt +
data chunks) — no imaging library needed. Full pixel/sample decode
(``decode_image``/``decode_audio``) remains an explicit stub: the codec
libraries (PIL/ffmpeg/torchaudio) are not in this container; the Spark-side
plumbing (schema, batching, partition flow) around them is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, first_byte int, sha16 string, frame_count int"


def decode_image(data: bytes) -> object:
    """STUB — real impl: PIL.Image.open(io.BytesIO(data)). Not in container.
    Header-only decode (dimensions, format) is implemented — see
    ``decode_media_header``."""
    raise NotImplementedError("image pixel codec not available in this environment")


def decode_audio(data: bytes) -> object:
    """STUB — real impl: soundfile/torchaudio decode. Not in container.
    Header-only decode (sample rate, channels, duration) is implemented —
    see ``decode_media_header``."""
    raise NotImplementedError("audio sample codec not available in this environment")


# ---------------------------------------------------------------- synthesis
def make_bmp(width: int, height: int) -> bytes:
    """Minimal valid BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bpp, no
    pixel payload (biSizeImage=0 is legal for BI_RGB)."""
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40, 0, 0, 14 + 40)
    return header + info


def make_png(width: int, height: int) -> bytes:
    """Minimal PNG: signature + IHDR chunk (with correct CRC) + IEND."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    out = b"\x89PNG\r\n\x1a\n"
    out += struct.pack(">I", len(ihdr)) + chunk + struct.pack(">I", zlib.crc32(chunk))
    iend = b"IEND"
    out += struct.pack(">I", 0) + iend + struct.pack(">I", zlib.crc32(iend))
    return out


def make_wav(sample_rate: int, n_samples: int, channels: int = 1) -> bytes:
    """Minimal valid 16-bit PCM WAV with a zeroed data chunk."""
    data_len = n_samples * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2,
        channels * 2, 16,
    )
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len)
    return (
        b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    )


# ------------------------------------------------------------------ decode
def decode_media_header(data: bytes) -> dict:
    """Sniff the container format by magic number and parse its public
    header layout — pure ``struct``, no media library.

    Returns {"fmt", "width", "height", "sample_rate", "n_samples"}; fields
    not applicable to the format are -1 ("fmt" is 'bmp'/'png'/'wav'/
    'unknown'). Mirrors the reference's mounter role for opaque payloads
    (decode-at-ingest, cdc/entry/mounter.go:515-551): bytes in, typed
    columns out.
    """
    out = {"fmt": "unknown", "width": -1, "height": -1,
           "sample_rate": -1, "n_samples": -1}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        out.update(fmt="bmp", width=w, height=abs(h))
    elif data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        if data[12:16] == b"IHDR":
            w, h = struct.unpack_from(">II", data, 16)
            out.update(fmt="png", width=w, height=h)
    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos, channels, rate, bits = 12, 1, -1, 16
        data_size = -1
        while pos + 8 <= len(data):
            cid, clen = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
            if cid == b"fmt " and pos + 8 + 16 <= len(data):
                _tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", data, pos + 8
                )
            elif cid == b"data":
                data_size = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        n = data_size // max(channels * (bits // 8), 1) if data_size >= 0 else -1
        out.update(fmt="wav", sample_rate=rate, n_samples=n)
    return out


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


DECODED_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "sample_rate int, n_samples int"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: each doc_id becomes a VALID container
    file (bmp/png/wav round-robin) whose header parameters are pure
    arithmetic on doc_id — so an independent engine can predict what the
    decoder must recover without parsing bytes itself. Arrow-batched; the
    writer (struct.pack) and the reader (decode_media_header,
    struct.unpack) share no code path beyond the public format layout."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            blobs = []
            for i in ids:
                i = int(i)
                kind = i % 3
                if kind == 0:
                    blobs.append(make_bmp(16 + i % 64, 8 + i % 32))
                elif kind == 1:
                    blobs.append(make_wav(8000 + (i % 5) * 2000, 100 + i % 900))
                else:
                    blobs.append(make_png(16 + i % 64, 8 + i % 32))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, media binary")


def decode_media_meta(media_df: DataFrame) -> DataFrame:
    """Arrow-batched header decode over opaque binary media: format sniff +
    per-format typed metadata (image dims / audio rate+samples), -1 for
    fields the format lacks. The real-decoder analogue of
    ``extract_media_meta``'s stand-in."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_media_header(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": [m["fmt"] for m in metas],
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "sample_rate": pd.Series(
                        [m["sample_rate"] for m in metas], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [m["n_samples"] for m in metas], dtype="int32"
                    ),
                }
            )

    return media_df.mapInPandas(decode, DECODED_SCHEMA)
