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


RESIZE_SCHEMA = "media_id long, width int, height int, resized_sha string"

FRAMES_SCHEMA = "media_id long, frame_no int, offset_ms long, frame_sha string"


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, decode: str = "deterministic"
) -> DataFrame:
    """Arrow-batched media resize. The real kernel (PIL/libvips
    decode -> resample -> re-encode) plugs in at ``decode="real"``;
    the deterministic stub emits sha256(content || ':resize:WxH') so
    the plumbing — schema, batch shape, partition-parallel execution —
    is exercised and oracle-checkable without codecs.

    One narrow pass, no shuffle; at 100 TB this is the map stage of a
    media-preprocessing pipeline and parallelism = input splits.
    """
    tag = f":resize:{width}x{height}".encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "media codecs (PIL/libvips) not available in this environment; "
                    "plug decode->resample->encode here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(
                            (bytes(b) if b is not None else b"") + tag
                        ).hexdigest()[:16]
                    ),
                }
            )

    return df.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int = 4, decode: str = "deterministic"
) -> DataFrame:
    """Arrow-batched frame sampling: each media row fans out to
    ``n_frames`` evenly spaced frame rows. The real kernel (ffmpeg
    seek + decode at each offset) plugs in at ``decode="real"``; the
    stub derives offsets from ``meta.duration_ms`` (content length as
    a stand-in when duration is null, as for the text adapter) and a
    deterministic frame fingerprint sha256(content || ':frame:' || i).

    The fan-out happens INSIDE the kernel (one input batch -> one
    n_frames-times-longer output batch), so there's no explode shuffle
    and output partitioning follows input splits — the right shape for
    a 100 TB video corpus where frames dwarf the source rows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "media codecs (ffmpeg) not available in this environment; "
                    "plug seek+decode here"
                )
            out: dict[str, list] = {
                "media_id": [],
                "frame_no": [],
                "offset_ms": [],
                "frame_sha": [],
            }
            durations = [
                m["duration_ms"] if m is not None and m.get("duration_ms") is not None
                else (len(c) if c is not None else 0)
                for m, c in zip(pdf["meta"], pdf["content"])
            ]
            for mid, content, dur in zip(pdf["media_id"], pdf["content"], durations):
                raw = bytes(content) if content is not None else b""
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["offset_ms"].append(int(dur) * i // n_frames)
                    out["frame_sha"].append(
                        hashlib.sha256(raw + f":frame:{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=FRAMES_SCHEMA)
