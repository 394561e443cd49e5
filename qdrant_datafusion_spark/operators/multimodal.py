"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The container has no image/audio codecs, so the decode kernels are
deterministic STUBS (clearly marked) — but everything Spark-side is real
and tested: schemas, Arrow batch shapes, `mapInPandas` signatures,
partition-size control for large blobs.  Swapping a stub for a real
decoder (PIL/ffmpeg) changes only the function body, no plumbing.

Schema convention:

    media struct<bytes: binary, mime: string, width: int, height: int,
                 duration_ms: int>

- ``attach_media``        — wrap a binary column + metadata into the struct
- ``media_stats``         — native byte/metadata statistics (no decode)
- ``decode_image_features``  — mapInPandas: bytes → fixed-dim feature vector
                               (STUB: seeded hash-features; real impl = PIL +
                               model forward)
- ``sample_video_frames`` — mapInPandas: bytes → N frame descriptors
                             (STUB: synthesized offsets; real impl = ffmpeg)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "struct<bytes: binary, mime: string, width: int, height: int, duration_ms: int>"
)


def attach_media(
    df: DataFrame,
    bytes_col: str,
    mime: str,
    width_col: str | None = None,
    height_col: str | None = None,
    out_col: str = "media",
) -> DataFrame:
    """Pack a binary column + metadata into the media struct."""
    return df.withColumn(
        out_col,
        F.struct(
            F.col(bytes_col).alias("bytes"),
            F.lit(mime).alias("mime"),
            (F.col(width_col) if width_col else F.lit(None).cast("int")).alias("width"),
            (F.col(height_col) if height_col else F.lit(None).cast("int")).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Byte-level statistics without decoding — runs native."""
    b = F.col(f"{media_col}.bytes")
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length(b)).alias("total_bytes"),
        F.max(F.octet_length(b)).cast("long").alias("max_bytes"),
        F.countDistinct(F.col(f"{media_col}.mime")).alias("n_mime_types"),
    )


def _stub_image_features(data: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from a content hash.

    Real implementation: ``PIL.Image.open(io.BytesIO(data))`` → resize →
    normalize → model forward.  NotImplemented here because the container
    ships no codecs; the stub keeps the pipeline testable and deterministic.
    """
    seed = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    dim: int = 64,
    batch_size_hint: int = 256,
) -> DataFrame:
    """bytes → feature vector via ``mapInPandas`` (Arrow-batched).

    Output: (id, features array<float>, n_bytes).  The real decoder slots
    into ``_stub_image_features``; the Arrow batch shape, schema, and
    per-partition iteration are production-real.
    """
    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        f"features array<float>, n_bytes long"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, sizes = [], [], []
            for _, row in pdf.iterrows():
                media = row[media_col]
                data = bytes(media["bytes"]) if media is not None else b""
                ids.append(row[id_col])
                feats.append([float(x) for x in _stub_image_features(data, dim)])
                sizes.append(len(data))
            yield pd.DataFrame({id_col: ids, "features": feats, "n_bytes": sizes})

    return df.select(id_col, media_col).mapInPandas(decode, schema=schema)


def sample_video_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    n_frames: int = 4,
) -> DataFrame:
    """bytes → N frame descriptors (frame_idx, offset_ms, frame_hash) via
    ``mapInPandas``.  STUB frame extraction (real impl: ffmpeg seek +
    decode); the exploded output shape is what a real sampler produces."""
    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "frame_idx int, offset_ms long, frame_hash string"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "offset_ms": [], "frame_hash": []}
            for _, row in pdf.iterrows():
                media = row[media_col]
                data = bytes(media["bytes"]) if media is not None else b""
                duration = media["duration_ms"] if media is not None else None
                duration = int(duration) if duration else 1000 * max(len(data), 1)
                for i in range(n_frames):
                    offset = (duration * i) // n_frames
                    h = hashlib.md5(data + i.to_bytes(4, "big")).hexdigest()
                    out[id_col].append(row[id_col])
                    out["frame_idx"].append(i)
                    out["offset_ms"].append(offset)
                    out["frame_hash"].append(h)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(sample, schema=schema)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """bytes → resized bytes + updated metadata via ``mapInPandas``.

    STUB resize (deterministic: md5-seeded bytes of width*height/64 length
    standing in for the re-encoded image; real impl = PIL
    ``Image.resize().save()``) — the struct rebuild, Arrow batch shape,
    and metadata rewrite are production-real.  Output keeps the
    ``media`` struct schema with width/height replaced, so resized
    columns compose with every other media operator.
    """
    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "media struct<bytes: binary, mime: string, width: int, height: int, "
        "duration_ms: int>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, medias = [], []
            for _, row in pdf.iterrows():
                media = row[media_col]
                if media is None:
                    ids.append(row[id_col])
                    medias.append(None)
                    continue
                data = bytes(media["bytes"]) if media["bytes"] is not None else b""
                # STUB: real impl decodes, resizes to (width, height), and
                # re-encodes; the deterministic fake preserves testability
                seed = hashlib.md5(data + f"{width}x{height}".encode()).digest()
                fake = (seed * ((width * height // 64) // len(seed) + 1))[
                    : max(width * height // 64, 1)
                ]
                ids.append(row[id_col])
                medias.append(
                    {
                        "bytes": fake,
                        "mime": media["mime"],
                        "width": width,
                        "height": height,
                        "duration_ms": media["duration_ms"],
                    }
                )
            yield pd.DataFrame({id_col: ids, "media": medias})

    return df.select(id_col, media_col).mapInPandas(resize, schema=schema)
