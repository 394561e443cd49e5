"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

Image and audio kernels are REAL: PNG decodes via the pure-stdlib codec
in :mod:`.imaging` (zlib inflate + per-row unfilter per the W3C spec; PIL
is preferred when importable, covering JPEG etc.), WAV metadata parses
via the stdlib ``wave`` module.  Bytes that no available decoder accepts
fall back to a deterministic content-hash stub (clearly marked below), so
pipelines over mixed/foreign blobs stay total and testable.  Video frame
extraction is REAL for YUV4MPEG2 streams (pure-stdlib demux in
:mod:`.imaging`); compressed containers (mp4/webm) still take the
labeled stub path — their codecs genuinely require ffmpeg.

Schema convention:

    media struct<bytes: binary, mime: string, width: int, height: int,
                 duration_ms: int>

- ``attach_media``        — wrap a binary column + metadata into the struct
- ``media_stats``         — native byte/metadata statistics (no decode)
- ``decode_image_features``  — mapInPandas: bytes → fixed-dim feature vector
                               (REAL pixel features for PNG/PIL-decodable
                               bytes; hash stub otherwise)
- ``resize_images``       — mapInPandas: real decode → nearest-neighbor
                             resize → PNG re-encode for decodable bytes
- ``decode_audio_meta``   — mapInPandas: REAL WAV header parse
- ``sample_video_frames`` — mapInPandas: bytes → N frame descriptors
                             (REAL Y4M demux: true frame indices, header
                             frame-rate offsets, luma-plane hashes; stub
                             for compressed containers)
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
    """FALLBACK for bytes no available decoder accepts: deterministic
    pseudo-features from a content hash.  Decodable images never reach
    this path — they get real pixel features (:func:`imaging.image_features`).
    """
    seed = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _image_features(data: bytes, dim: int) -> np.ndarray:
    """Real-decode-first feature kernel: PIL / pure-PNG decode → grayscale
    grid features; hash-stub fallback only when the bytes aren't an image
    any available codec handles."""
    from qdrant_datafusion_spark.operators import imaging

    px = imaging.try_decode_image(data)
    if px is not None:
        return imaging.image_features(px, dim)
    return _stub_image_features(data, dim)


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    dim: int = 64,
    batch_size_hint: int = 256,
) -> DataFrame:
    """bytes → feature vector via ``mapInPandas`` (Arrow-batched).

    Output: (id, features array<float>, n_bytes).  Decodable images
    (PNG always; anything PIL handles where PIL exists) produce REAL
    pixel features — grayscale → g×g nearest-resize grid → normalized
    flatten (:func:`imaging.image_features`); undecodable bytes fall back
    to the content-hash stub so mixed corpora stay total.
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
                feats.append([float(x) for x in _image_features(data, dim)])
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
    ``mapInPandas``.

    REAL demux for YUV4MPEG2 payloads (the uncompressed interchange
    format any ffmpeg pipeline emits): :func:`imaging.y4m_probe` walks
    the stream's FRAME markers, ``n_frames`` frames are sampled evenly
    across the true frame count, ``frame_idx`` is the *video* frame
    index, ``offset_ms`` comes from the header's real frame rate, and
    ``frame_hash`` is the md5 of the frame's decoded luma plane.  Bytes
    in compressed containers (mp4/webm — codecs genuinely require
    ffmpeg) take the labeled deterministic STUB path: synthetic offsets
    over ``duration_ms`` and content-hash descriptors, same shape.
    """
    from qdrant_datafusion_spark.operators import imaging

    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "frame_idx int, offset_ms long, frame_hash string"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "offset_ms": [], "frame_hash": []}

            def emit(rid, idx, off, h):
                out[id_col].append(rid)
                out["frame_idx"].append(idx)
                out["offset_ms"].append(off)
                out["frame_hash"].append(h)

            for _, row in pdf.iterrows():
                media = row[media_col]
                data = bytes(media["bytes"]) if media is not None else b""
                meta = imaging.y4m_probe(data)
                if meta and meta["n_frames"] > 0:
                    total = meta["n_frames"]
                    ms_per_frame = 1000 * meta["fps_den"] / meta["fps_num"]
                    for i in range(n_frames):
                        fidx = (total * i) // n_frames
                        luma = imaging.y4m_frame_luma(data, meta, fidx)
                        emit(
                            row[id_col],
                            fidx,
                            int(fidx * ms_per_frame),
                            hashlib.md5(luma.tobytes()).hexdigest(),
                        )
                    continue
                # STUB path: undecodable container — synthetic descriptors
                duration = media["duration_ms"] if media is not None else None
                duration = int(duration) if duration else 1000 * max(len(data), 1)
                for i in range(n_frames):
                    offset = (duration * i) // n_frames
                    h = hashlib.md5(data + i.to_bytes(4, "big")).hexdigest()
                    emit(row[id_col], i, offset, h)
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

    Decodable images get a REAL resize: decode (PIL / pure-PNG codec) →
    nearest-neighbor index gather → PNG re-encode, with mime rewritten to
    ``image/png``.  Undecodable bytes fall back to a deterministic
    md5-seeded placeholder (marked below) so mixed corpora stay total.
    Output keeps the ``media`` struct schema with width/height replaced,
    so resized columns compose with every other media operator.
    """
    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "media struct<bytes: binary, mime: string, width: int, height: int, "
        "duration_ms: int>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from qdrant_datafusion_spark.operators import imaging

        for pdf in batches:
            ids, medias = [], []
            for _, row in pdf.iterrows():
                media = row[media_col]
                if media is None:
                    ids.append(row[id_col])
                    medias.append(None)
                    continue
                data = bytes(media["bytes"]) if media["bytes"] is not None else b""
                px = imaging.try_decode_image(data)
                if px is not None:
                    out = imaging.encode_png(imaging.resize_nearest(px, width, height))
                    mime = "image/png"
                else:
                    # FALLBACK for undecodable bytes: deterministic
                    # md5-seeded placeholder of width*height/64 length
                    seed = hashlib.md5(data + f"{width}x{height}".encode()).digest()
                    out = (seed * ((width * height // 64) // len(seed) + 1))[
                        : max(width * height // 64, 1)
                    ]
                    mime = media["mime"]
                ids.append(row[id_col])
                medias.append(
                    {
                        "bytes": out,
                        "mime": mime,
                        "width": width,
                        "height": height,
                        "duration_ms": media["duration_ms"],
                    }
                )
            yield pd.DataFrame({id_col: ids, "media": medias})

    return df.select(id_col, media_col).mapInPandas(resize, schema=schema)


def decode_audio_meta(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
) -> DataFrame:
    """REAL audio metadata via ``mapInPandas``: RIFF WAVE header parse
    (stdlib ``wave`` — PCM WAV needs no codec).

    Output: (id, channels int, sample_rate int, audio_ms long, n_bytes
    long); non-WAV bytes yield NULL metadata with the true byte count, so
    the operator is total over mixed corpora.  Distribution comes from
    Spark partitioning of the binary column; per-row work is a bounded
    header read."""
    id_field = df.select(id_col).schema.fields[0]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "channels int, sample_rate int, audio_ms long, n_bytes long"
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from qdrant_datafusion_spark.operators import imaging

        for pdf in batches:
            out = {
                id_col: [], "channels": [], "sample_rate": [],
                "audio_ms": [], "n_bytes": [],
            }
            for _, row in pdf.iterrows():
                media = row[media_col]
                data = (
                    bytes(media["bytes"])
                    if media is not None and media["bytes"] is not None
                    else b""
                )
                meta = imaging.decode_wav_meta(data)
                out[id_col].append(row[id_col])
                out["channels"].append(meta[0] if meta else None)
                out["sample_rate"].append(meta[1] if meta else None)
                out["audio_ms"].append(meta[2] if meta else None)
                out["n_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(probe, schema=schema)
