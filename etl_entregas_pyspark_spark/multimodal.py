"""Multimodal column support (north-star surface, BASELINE.json): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extraction / frame-sampling as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernel is STUBBED:
``_decode_stub`` derives deterministic pseudo-metadata from the payload
bytes (documented, testable), and ``decode_media`` accepts any
``(bytes) -> dict`` kernel so a real decoder (PIL/ffmpeg/librosa) drops in
without touching the Spark plumbing. Everything Spark-side — schema,
batching, partition sizing — is real and tested.

Scale design:
- payloads stay in executors end-to-end (no driver collect); Arrow moves
  them Python↔JVM in columnar batches;
- ``repartition`` before the decode stage sizes partitions by payload
  bytes, not row count (decode is the expensive step);
- metadata lands in a flat struct column so downstream filtering/grouping
  is ordinary Catalyst (decode once, query many).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
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
        StructField("source_uri", StringType()),
    ]
)

DECODED_META_FIELDS = [
    StructField("byte_len", LongType()),
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
]

DecodeKernel = Callable[[bytes], dict[str, Any]]


def _decode_stub(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: real decode libs are absent in this
    container (STUB — swap for PIL/ffmpeg in production). Pseudo-dimensions
    are derived from the content hash so tests get stable, content-dependent
    values with the exact schema a real decoder would fill."""
    digest = hashlib.sha256(payload).hexdigest()
    seed = int(digest[:8], 16)
    return {
        "byte_len": len(payload),
        "sha256": digest,
        "width": 64 + seed % 1024,
        "height": 64 + (seed >> 10) % 1024,
        "n_frames": 1 + (seed >> 20) % 64,
    }


def decode_media(
    df: DataFrame,
    kernel: DecodeKernel = _decode_stub,
    content_col: str = "content",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Append decoded metadata columns via an Arrow-batched mapInPandas
    stage. Output schema = input columns (minus payload) + metadata — the
    payload is dropped post-decode so downstream stages shuffle only
    metadata, never the blobs."""
    import pandas as pd

    passthrough = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(passthrough + DECODED_META_FIELDS)
    meta_names = [f.name for f in DECODED_META_FIELDS]
    pass_names = [f.name for f in passthrough]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = [kernel(bytes(p)) for p in pdf[content_col]]
            out = pdf[pass_names].copy()
            for name in meta_names:
                out[name] = [m[name] for m in meta]
            yield out

    if batch_partitions:
        df = df.repartition(batch_partitions)
    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Explode each video row into sampled frame indices (0, n, 2n, …) —
    pure Catalyst (sequence+explode), no Python."""
    idx = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_nth))
    return df.withColumn("frame_index", F.explode(idx))


def media_stats(df: DataFrame) -> DataFrame:
    """Corpus profile over decoded metadata (plain Catalyst aggregation)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum("byte_len").alias("total_bytes"),
        F.countDistinct("sha256").alias("n_unique_payloads"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )


RESIZED_FIELDS = [
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
]


def _resize_stub(
    payload: bytes, w: int, h: int, max_dim: int
) -> tuple[bytes, int, int]:
    """Deterministic fake resize: real codecs are absent in this container
    (STUB — swap for PIL thumbnail/ffmpeg scale in production). Emulates
    the real cost/shape contract: output bytes shrink proportionally to
    the dimension cap, derived dims are clamped, and the operation is
    idempotent (resizing an already-small payload is identity)."""
    scale = max_dim / max(w, h)
    if scale >= 1.0:
        return payload, w, h
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    n_bytes = max(1, int(len(payload) * (nw * nh) / (w * h)))
    return payload[:n_bytes], nw, nh


def resize_media(
    df: DataFrame,
    max_dim: int = 256,
    content_col: str = "content",
) -> DataFrame:
    """Binary-in/binary-out Arrow-batched transform: cap the longer edge at
    ``max_dim``, shrinking the payload. Unlike decode_media the blob
    SURVIVES the stage (this is a write-path op — thumbnailing before
    sink), so partition sizing by payload bytes matters twice.

    Consumes ``width``/``height`` columns when present (a resize stage
    normally follows decode, which already measured the frame); falls back
    to the decode kernel otherwise. Replaces, not duplicates, prior
    content/width/height columns, so the stage is closed under
    composition — resize ∘ resize is well-formed and idempotent."""
    import pandas as pd

    have_dims = {"width", "height"} <= set(df.columns)
    replaced = {content_col, "width", "height"}
    passthrough = [f for f in df.schema.fields if f.name not in replaced]
    out_schema = StructType(passthrough + RESIZED_FIELDS)
    pass_names = [f.name for f in passthrough]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[content_col]]
            if have_dims:
                dims = list(zip(pdf["width"], pdf["height"]))
            else:
                dims = [
                    (m["width"], m["height"])
                    for m in (_decode_stub(p) for p in payloads)
                ]
            resized = [
                _resize_stub(p, int(w), int(h), max_dim)
                for p, (w, h) in zip(payloads, dims)
            ]
            out = pdf[pass_names].copy()
            out["content"] = [r[0] for r in resized]
            out["width"] = [r[1] for r in resized]
            out["height"] = [r[2] for r in resized]
            yield out

    return df.mapInPandas(run, schema=out_schema)


N_FEATURE_DIMS = 8


def _feature_stub(payload: bytes) -> list[int]:
    """Deterministic fake feature extractor (STUB — swap for a CLIP/wav2vec
    forward pass in production): 8 integer dims from successive sha256
    chunks. Integers (not floats) so any downstream score is exact and
    cross-engine reproducible."""
    digest = hashlib.sha256(payload).hexdigest()
    return [int(digest[8 * i : 8 * i + 8], 16) % 1000 for i in range(N_FEATURE_DIMS)]


def extract_features(
    df: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """Append an ``embedding array<bigint>`` column via Arrow-batched
    mapInPandas — the media twin of the text-embedding surface
    (similarity.py consumes the same array shape). Payload dropped
    post-extraction: downstream ANN shuffles 64 bytes/row, not blobs."""
    import pandas as pd

    passthrough = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(passthrough + [StructField("embedding", ArrayType(LongType()))])
    pass_names = [f.name for f in passthrough]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pass_names].copy()
            out["embedding"] = [_feature_stub(bytes(p)) for p in pdf[content_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def _phash_stub(payload: bytes) -> int:
    """Deterministic fake perceptual hash (STUB — swap for a DCT pHash /
    chromaprint in production): the first 60 bits of sha256 as a
    non-negative bigint. A real pHash is locality-sensitive in pixel
    space; the stub is content-sensitive only, so near-dup pairs collapse
    to exact-payload duplicates — the banded Hamming-join machinery
    downstream is identical either way, and 60 bits keeps the value
    signed-positive on every engine."""
    return int(hashlib.sha256(payload).hexdigest()[:15], 16)


def perceptual_hash(
    df: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """Append a ``phash bigint`` column via Arrow-batched mapInPandas and
    DROP the payload — near-dup detection downstream shuffles 8 bytes per
    item regardless of media size (the decode_media asymmetry applied to
    fingerprinting)."""
    import pandas as pd

    passthrough = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(passthrough + [StructField("phash", LongType())])
    pass_names = [f.name for f in passthrough]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[pass_names].copy()
            out["phash"] = [_phash_stub(bytes(p)) for p in pdf[content_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)
