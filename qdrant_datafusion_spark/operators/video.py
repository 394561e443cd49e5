"""Video fingerprint dedup — temporal luma-envelope hash over Y4M.

Completes the multimodal dedup trio (image: ``operators/phash.py``,
audio: ``operators/audio.py``): opaque video blobs become a DEDUP
target.  Part of the beyond-reference multimodal surface (SURVEY.md
§2.12); the reference engine has no video operators.

Fingerprint: demux via the pure-stdlib Y4M parser
(``operators/imaging.py:y4m_probe`` — the uncompressed interchange
format every ffmpeg pipeline can emit; compressed containers need the
codec boundary documented in ``operators/multimodal.py``), then one bit
per consecutive-frame comparison of the EXACT integer luma sum
``s_f = Σ Y(y, x)`` over 65 frames → 64 bits packed MSB-first into a
signed two's-complement bigint.  The sign of a luma-sum *difference* is
invariant under uniform brightness scaling, and the whole pipeline is
integer arithmetic — bit-identical in any engine, so the gate's oracle
recomputes the code from a closed-form pixel formula with BIGINT sums.

Pairing reuses :func:`operators.phash.hamming_code_dups` verbatim; only
the hash pass touches video bytes (one Arrow-batched pandas UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from qdrant_datafusion_spark.operators.imaging import y4m_frame_luma, y4m_probe
from qdrant_datafusion_spark.operators.phash import hamming_code_dups

__all__ = [
    "video_temporal_hash64",
    "video_hash_codes",
    "video_temporal_dups",
]

#: 64 comparison bits need 65 frames; shorter clips zero-pad (0 > 0 is
#: False — deterministic)
_N_FRAMES = 65


def video_temporal_hash64(data: bytes) -> int | None:
    """64-bit temporal envelope hash of a Y4M clip: bit f =
    (luma_sum(f+1) > luma_sum(f)), MSB-first, signed two's-complement
    int64.  None if the bytes aren't parseable Y4M."""
    meta = y4m_probe(data)
    if meta is None or meta["n_frames"] == 0:
        return None
    n = min(_N_FRAMES, meta["n_frames"])
    sums = [
        int(y4m_frame_luma(data, meta, f).astype(np.int64).sum())
        for f in range(n)
    ]
    sums += [0] * (_N_FRAMES - n)
    code = 0
    for f in range(_N_FRAMES - 1):
        code = (code << 1) | int(sums[f + 1] > sums[f])
    if code >= 1 << 63:
        code -= 1 << 64
    return code


def video_hash_codes(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """(id, code) temporal hashes for a binary Y4M column — one
    Arrow-batched pass; NULL/unparseable media yields NULL (dropped)."""

    @pandas_udf("long")
    def _vh(media: pd.Series) -> pd.Series:
        out: list[int | None] = []
        for data in media:
            out.append(
                None if data is None else video_temporal_hash64(bytes(data))
            )
        return pd.Series(out, dtype="Int64")

    return df.select(
        F.col(id_col).alias("id"), _vh(F.col(media_col)).alias("code")
    ).where(F.col("code").isNotNull())


def video_temporal_dups(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    max_hamming: int = 4,
    blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Video near-dup pairs (id_a, id_b, hamming) by temporal-envelope
    Hamming distance ≤ ``max_hamming`` — demux + hash in one Arrow pass,
    then the banded 8-byte-code join."""
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    return hamming_code_dups(
        video_hash_codes(df, media_col, id_col),
        max_hamming=max_hamming,
        blocks=blocks,
        max_bucket_size=max_bucket_size,
    )
