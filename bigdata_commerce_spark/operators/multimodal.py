"""Multimodal column plumbing: opaque binary media + typed metadata.

Design for 100 TB media pipelines: media travel as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so bytes
never round-trip through Python row-at-a-time. The actual codec calls
(PIL/ffmpeg/torchaudio) are NOT available in this container, so the
decode kernel is stubbed: ``decode=deterministic`` produces a seeded
fake feature vector from the content hash (plumbing fully exercised,
batch shapes real), ``decode=real`` raises NotImplementedError where
the codec call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, n_bytes long, content_sha string, features array<float>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media so the
    binary-column plumbing is testable without image/audio fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(digest: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    FEATURE_DIM floats in [0,1) derived from the content hash."""
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(df: DataFrame, decode: str = "deterministic") -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    ``decode="real"`` marks where the codec (image decode, resize,
    frame sampling) plugs in; unavailable in this environment.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) not available in this environment; "
                    "plug the real decode here"
                )
            digests = pdf["content"].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").digest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": digests.map(lambda d: d.hex()[:16]),
                    "features": digests.map(_fake_features),
                }
            )

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)
