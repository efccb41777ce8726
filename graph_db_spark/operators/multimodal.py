"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing — schema, partition-preserving ``mapInPandas``
over Arrow batches, UDF signatures, batch shaping — is real and tested.
The actual media decode is STUBBED: the container has no image/audio
libraries, so ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (derived from the
bytes themselves) exercises the full pipeline shape.

At 100 TB: media bytes dominate row size, so the design rules are
(1) never shuffle the binary column — extract features first, then drop it;
(2) ``mapInPandas`` with bounded ``spark.sql.execution.arrow.maxRecordsPerBatch``
keeps per-batch memory flat; (3) store media in its own table keyed by
content hash and join features, not bytes.
"""

from __future__ import annotations

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
        StructField("mean_byte", DoubleType()),
        StructField("feature_ok", LongType()),
    ]
)


def decode_image_batch(content: "pd.Series", fake: bool = False) -> "pd.DataFrame":
    """Decode a batch of image bytes → (mean_byte, feature_ok).

    REAL decode requires an image library not present in this container —
    raises ``NotImplementedError``. ``fake=True`` runs a deterministic
    stand-in (byte-level statistics) with the same output shape, so the
    distributed plumbing is fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not available here; "
            "pass fake=True for the deterministic stand-in"
        )
    import hashlib

    means, oks, hashes, sizes = [], [], [], []
    for blob in content:
        b = bytes(blob) if blob is not None else b""
        sizes.append(len(b))
        hashes.append(hashlib.md5(b).hexdigest())
        means.append(sum(b) / len(b) if b else 0.0)
        oks.append(1 if b else 0)
    return pd.DataFrame(
        {"n_bytes": sizes, "content_hash": hashes, "mean_byte": means, "feature_ok": oks}
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
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
