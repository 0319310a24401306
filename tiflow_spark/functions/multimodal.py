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
def make_bmp(width: int, height: int, color: tuple | None = None) -> bytes:
    """Minimal valid BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bpp.
    Without ``color`` the pixel payload is omitted (biSizeImage=0 is legal
    for BI_RGB); with ``color`` = (r, g, b) a real bottom-up, 4-byte-padded
    BGR pixel array is appended — the bfSize/bfOffBits fields are exact, so
    container walkers (``split_video``) can frame on them."""
    row_size = (width * 3 + 3) // 4 * 4
    img_size = row_size * height if color is not None else 0
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    )
    if color is None:
        return header + info
    r, g, b = color
    row = (bytes((b, g, r)) * width) + b"\x00" * (row_size - width * 3)
    return header + info + row * height


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


def decode_bmp(data: bytes):
    """REAL pixel decode for 24-bpp uncompressed BMP — pure stdlib + numpy
    over the public BITMAPINFOHEADER layout (the one container whose pixel
    codec needs no imaging library). Returns an (h, w, 3) uint8 RGB array.
    Other formats/compressions stay behind the declared ``decode_image``
    stub."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP container")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bpp BI_RGB pixel decode is built in")
    row_size = (w * 3 + 3) // 4 * 4
    rows = abs(h)
    arr = np.frombuffer(data, np.uint8, count=row_size * rows, offset=off)
    pix = arr.reshape(rows, row_size)[:, : w * 3].reshape(rows, w, 3)[..., ::-1]
    return pix[::-1] if h > 0 else pix  # positive height = bottom-up rows


def encode_bmp(pix) -> bytes:
    """Inverse of ``decode_bmp``: (h, w, 3) uint8 RGB → 24-bpp BMP bytes."""
    import numpy as np

    h, w = pix.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    return header + info + padded.tobytes()


def resize_nearest(pix, out_w: int, out_h: int):
    """Nearest-neighbor resize via integer index maps — the numpy analogue
    of the sampler a GPU/PIL pipeline would run; exact on constant regions
    (what the arithmetic oracle exploits)."""
    import numpy as np

    h, w = pix.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pix[ys][:, xs]


def split_video(data: bytes) -> list[bytes]:
    """Frame the 'video' container: concatenated BMP frames, walked by each
    frame's own bfSize header field (real container walking — a corrupt
    size desyncs loudly rather than yielding plausible garbage)."""
    frames, pos = [], 0
    while pos < len(data):
        if data[pos : pos + 2] != b"BM" or pos + 6 > len(data):
            raise ValueError(f"video desync at byte {pos}")
        size = struct.unpack_from("<I", data, pos + 2)[0]
        if size < 54 or pos + size > len(data):
            raise ValueError(f"video desync at byte {pos}: truncated frame")
        frames.append(data[pos : pos + size])
        pos += size
    return frames


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


def synthesize_pixel_media(docs: DataFrame) -> DataFrame:
    """Constant-color 24-bpp BMPs with REAL pixel payloads, every parameter
    pure doc_id arithmetic: width = 8 + id%16, height = 4 + id%8, color =
    (id%256, id*7%256, id*13%256) — so the oracle can predict not just the
    header fields but the pixel statistics of any resample."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            blobs = [
                make_bmp(
                    8 + int(i) % 16,
                    4 + int(i) % 8,
                    (int(i) % 256, int(i) * 7 % 256, int(i) * 13 % 256),
                )
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, media binary")


RESIZED_SCHEMA = (
    "doc_id long, in_w int, in_h int, out_w int, out_h int, "
    "mean_r int, mean_g int, mean_b int, out_bytes long"
)


def resize_media(media_df: DataFrame, scale: float = 0.5) -> DataFrame:
    """Arrow-batched decode → nearest-neighbor resize → re-encode over
    opaque BMP blobs (the one pixel codec that needs no imaging library;
    PIL-backed formats stay behind the ``decode_image`` stub). Emits the
    resized container's byte length and per-channel means so an arithmetic
    oracle pins the WHOLE pixel loop: out_bytes = 54 + padded_row(out_w) *
    out_h only comes out right if decode, resample, and re-encode all did.
    Narrow passthrough of doc_id; one Python stage, no shuffle."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "in_w", "in_h", "out_w",
                                    "out_h", "mean_r", "mean_g", "mean_b",
                                    "out_bytes")}
            for i, blob in zip(pdf["doc_id"], pdf["media"]):
                pix = decode_bmp(bytes(blob))
                h, w = pix.shape[:2]
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                out = resize_nearest(pix, ow, oh)
                enc = encode_bmp(out)
                means = out.reshape(-1, 3).mean(axis=0)
                rows["doc_id"].append(int(i))
                rows["in_w"].append(w)
                rows["in_h"].append(h)
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["mean_r"].append(int(np.round(means[0])))
                rows["mean_g"].append(int(np.round(means[1])))
                rows["mean_b"].append(int(np.round(means[2])))
                rows["out_bytes"].append(len(enc))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    **{k: pd.Series(rows[k], dtype="int32")
                       for k in ("in_w", "in_h", "out_w", "out_h",
                                 "mean_r", "mean_g", "mean_b")},
                    "out_bytes": pd.Series(rows["out_bytes"], dtype="int64"),
                }
            )

    return media_df.mapInPandas(work, RESIZED_SCHEMA)


def synthesize_video(docs: DataFrame) -> DataFrame:
    """'Video' fixture: 1 + id%5 concatenated constant-color BMP frames
    (w = 8 + id%8, h = 4 + id%4; frame f's color = ((id+f)%256,
    (id*3+f)%256, (id*5+f)%256)) — frame boundaries only recoverable by
    walking each frame's bfSize field."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            blobs = []
            for i in ids:
                i = int(i)
                w, h = 8 + i % 8, 4 + i % 4
                blobs.append(
                    b"".join(
                        make_bmp(
                            w, h,
                            ((i + f) % 256, (i * 3 + f) % 256, (i * 5 + f) % 256),
                        )
                        for f in range(1 + i % 5)
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(synth, "doc_id long, media binary")


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "mean_r int, mean_g int, mean_b int"
)


def frame_sample(media_df: DataFrame, stride: int = 2) -> DataFrame:
    """Fixed-stride frame sampler over concatenated-BMP 'videos': walk the
    container (``split_video``), decode every ``stride``-th frame, emit one
    row per SAMPLED frame with its pixel means — the mapInPandas shape a
    real ffmpeg-backed sampler would have (batch of blobs in, exploded
    frame rows out; the fan-out happens inside the Arrow batch, never as a
    Spark-side explode of raw bytes)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "width", "height",
                                   "mean_r", "mean_g", "mean_b")}
            for i, blob in zip(pdf["doc_id"], pdf["media"]):
                for f_idx, frame in enumerate(split_video(bytes(blob))):
                    if f_idx % stride:
                        continue
                    pix = decode_bmp(frame)
                    means = pix.reshape(-1, 3).mean(axis=0)
                    out["doc_id"].append(int(i))
                    out["frame_idx"].append(f_idx)
                    out["height"].append(pix.shape[0])
                    out["width"].append(pix.shape[1])
                    out["mean_r"].append(int(np.round(means[0])))
                    out["mean_g"].append(int(np.round(means[1])))
                    out["mean_b"].append(int(np.round(means[2])))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    **{k: pd.Series(out[k], dtype="int32")
                       for k in ("frame_idx", "width", "height",
                                 "mean_r", "mean_g", "mean_b")},
                }
            )

    return media_df.mapInPandas(work, FRAME_SCHEMA)


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
