"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing — schema, partition-preserving ``mapInPandas``
over Arrow batches, UDF signatures, batch shaping — is real and tested,
and so is the image decode for the two formats a pure-stdlib decoder can
handle: **PNG** (zlib + all five scanline filters, 8-bit gray/RGB/RGBA)
and **uncompressed BMP** (BI_RGB 8/24/32bpp). Anything else (JPEG, audio,
video) needs codec libraries not present in this container and is flagged
per-row with ``feature_ok = 0`` — a 100 TB pipeline flags undecodable rows
instead of killing the job. ``fake=True`` keeps the byte-statistics
stand-in used by the plumbing tests.

At 100 TB: media bytes dominate row size, so the design rules are
(1) never shuffle the binary column — extract features first, then drop it;
(2) ``mapInPandas`` with bounded ``spark.sql.execution.arrow.maxRecordsPerBatch``
keeps per-batch memory flat; (3) store media in its own table keyed by
content hash and join features, not bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),  # -1 when unknown/not applicable
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("feature_ok", LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 scanlines, one IDAT) —
    deterministic synthetic inputs for the decoder tests/queries."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes (8-bit gray)")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (types 0-4) → raw sample bytes."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out += line
        prev = line
    return out


def decode_png(blob: bytes) -> tuple[int, int, float]:
    """Decode an 8-bit gray/gray+alpha/RGB/RGBA non-interlaced PNG →
    (width, height, mean sample value). stdlib only (struct + zlib)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, channels = 8, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth} color={color})")
            channels = _PNG_CHANNELS[color]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    samples = _png_unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    return width, height, (sum(samples) / len(samples) if samples else 0.0)


def decode_bmp(blob: bytes) -> tuple[int, int, float]:
    """Decode an uncompressed (BI_RGB) 8/24/32bpp BMP → (width, height,
    mean sample value); row padding excluded from the mean."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    width, height_raw = struct.unpack("<ii", blob[18:26])
    (bpp,) = struct.unpack("<H", blob[28:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={compression})")
    height = abs(height_raw)
    bytes_per_px = bpp // 8
    stride = ((width * bytes_per_px + 3) // 4) * 4
    total, n = 0, 0
    for y in range(height):
        row = blob[data_off + y * stride : data_off + y * stride + width * bytes_per_px]
        total += sum(row)
        n += len(row)
    return width, height, (total / n if n else 0.0)


def decode_image_batch(content: "pd.Series", fake: bool = False) -> "pd.DataFrame":
    """Decode a batch of image bytes → (n_bytes, content_hash, width,
    height, mean_px, feature_ok).

    Real mode decodes PNG (stdlib zlib) and uncompressed BMP; rows in any
    other format come back with ``feature_ok=0`` and -1 dimensions — the
    flag-don't-fail contract for undecodable media at scale. ``fake=True``
    runs the byte-statistics stand-in (same output shape, no format
    requirement) used to exercise the distributed plumbing.
    """
    sizes, hashes, widths, heights, means, oks = [], [], [], [], [], []
    for blob in content:
        b = bytes(blob) if blob is not None else b""
        sizes.append(len(b))
        hashes.append(hashlib.md5(b).hexdigest())
        if fake:
            widths.append(-1)
            heights.append(-1)
            means.append(sum(b) / len(b) if b else 0.0)
            oks.append(1 if b else 0)
            continue
        try:
            if b[:8] == _PNG_SIG:
                w, h, m = decode_png(b)
            elif b[:2] == b"BM":
                w, h, m = decode_bmp(b)
            else:
                raise ValueError("unknown image format")
            widths.append(w)
            heights.append(h)
            means.append(m)
            oks.append(1)
        except Exception:
            widths.append(-1)
            heights.append(-1)
            means.append(0.0)
            oks.append(0)
    return pd.DataFrame(
        {
            "n_bytes": sizes,
            "content_hash": hashes,
            "width": widths,
            "height": heights,
            "mean_px": means,
            "feature_ok": oks,
        }
    )


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over media rows via ``mapInPandas`` — Arrow
    batches in, Arrow batches out; the binary column is dropped on output
    so nothing downstream shuffles bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["content"], fake=fake)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                }
            )
            yield pd.concat([out, feats], axis=1)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture (text bytes as
    the opaque payload) — deterministic inputs for plumbing tests."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(-1).cast("long").alias("width"),
        F.lit(-1).cast("long").alias("height"),
        F.lit(-1).cast("long").alias("duration_ms"),
    )


def synthesize_png_media(docs: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Synthesize a real 8-bit grayscale PNG per document — pixel i of
    doc d is ``(d*7 + i*13) % 256``, so the decoded mean is independently
    computable in plain SQL (the DuckDB oracle closes the loop on the REAL
    decoder, not just the plumbing). PNG bytes are built in the same
    Arrow-batched ``mapInPandas`` pass that a production encode/resize
    stage would use."""
    n_px = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                encode_png(
                    width, height, bytes((int(d) * 7 + i * 13) % 256 for i in range(n_px))
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": blobs,
                    "mime": "image/png",
                    "width": -1,
                    "height": -1,
                    "duration_ms": -1,
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)
