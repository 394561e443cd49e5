"""Perceptual-hash image dedup — dHash codes + Hamming block-join pairs.

Closes the multimodal loop: images (opaque binary columns) become a DEDUP
target, not just metadata — the image twin of SimHash text dedup
(``operators/dedup.py``).  Part of the beyond-reference LLM-pipeline
surface (SURVEY.md §2.12); the reference engine (qdrant-datafusion) has
no image operators at all.

Pipeline: PNG bytes → real decode (``operators/imaging.py``'s pure-stdlib
codec, PIL when importable) → difference hash (dHash, Krawetz 2013):
grayscale, nearest-resize to 9×8, one bit per horizontal gradient
``p(y,x) > p(y,x+1)`` → 64-bit code packed MSB-first into a signed bigint
(two's complement, same convention as ``quantize.binary_quantize``).
Near-dup pairs then come from the SAME block-permutation search as
SimHash: split the code into ``max_hamming + 1`` blocks — a pair within
Hamming distance ``max_hamming`` must agree exactly on at least one block
(pigeonhole) — equi-join on (block id, block value), verify with
``bit_count(a XOR b)`` inside the join stage.

Scale: the only shuffle touching image bytes is the dHash pass itself
(Arrow-batched pandas UDF, one pass); pairing runs on 8-byte codes.  The
candidate join is banded, never all-pairs; skewed buckets (e.g. millions
of solid-color thumbnails) are capped exactly like SimHash — run exact
byte-level dedup first and audit caps with the hot-bucket pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from qdrant_datafusion_spark.operators.imaging import (
    resize_nearest,
    to_gray,
    try_decode_image,
)

__all__ = [
    "dhash64",
    "dhash_codes",
    "hamming_code_dups",
    "phash_image_dups",
]

DHASH_BITS = 64


def dhash64(pixels: np.ndarray) -> int:
    """Difference hash of a decoded image: 64 horizontal-gradient bits
    (row-major, MSB-first) as a signed two's-complement int64.

    Strict ``>`` comparison on integer-valued uint8 luma is exact in
    float32, so the code is a deterministic pure function of pixels."""
    gray = to_gray(np.asarray(pixels))
    grid = resize_nearest(gray[:, :, None], 9, 8)[:, :, 0]
    bits = (grid[:, :-1] > grid[:, 1:]).reshape(-1)
    code = 0
    for b in bits:
        code = (code << 1) | int(b)
    if code >= 1 << 63:
        code -= 1 << 64
    return code


def dhash_codes(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """(id, code) dHash codes for a binary image column — one
    Arrow-batched pass over the bytes; undecodable/NULL media yields a
    NULL code (dropped from pairing)."""

    @pandas_udf("long")
    def _dh(media: pd.Series) -> pd.Series:
        out: list[int | None] = []
        for data in media:
            if data is None:
                out.append(None)
                continue
            px = try_decode_image(bytes(data))
            out.append(None if px is None else dhash64(px))
        return pd.Series(out, dtype="Int64")

    return df.select(
        F.col(id_col).alias("id"), _dh(F.col(media_col)).alias("code")
    ).where(F.col("code").isNotNull())


def _code_buckets(
    codes: DataFrame, max_hamming: int, blocks: int | None
) -> DataFrame:
    """(id, code, bid, bval): one row per (image, code block).  Uneven
    block widths when nbits % nblocks != 0 — pigeonhole completeness
    (dedup.py:simhash_dups) is width-agnostic.  shiftrightunsigned keeps
    the sign bit a plain data bit."""
    nblocks = blocks or (max_hamming + 1)
    if not 1 <= nblocks <= DHASH_BITS:
        raise ValueError("blocks must be in [1, 64]")
    base, rem = divmod(DHASH_BITS, nblocks)
    widths = [base + 1] * rem + [base] * (nblocks - rem)
    offsets = [sum(widths[:i]) for i in range(nblocks)]
    def _bval(i: int):
        shifted = F.shiftrightunsigned(F.col("code"), offsets[i])
        if widths[i] >= DHASH_BITS:  # nblocks == 1: full code, no mask
            return shifted
        return shifted.bitwiseAND(
            F.lit((1 << widths[i]) - 1).cast("bigint")
        )

    block_structs = [
        F.struct(F.lit(i).alias("bid"), _bval(i).alias("bval"))
        for i in range(nblocks)
    ]
    return codes.select(
        "id", "code", F.explode(F.array(*block_structs)).alias("b")
    ).select("id", "code", F.col("b.bid").alias("bid"), F.col("b.bval").alias("bval"))


def hamming_code_dups(
    codes: DataFrame,
    max_hamming: int = 4,
    blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) over precomputed (id, code)
    64-bit signatures — block-permutation candidate join, XOR-popcount
    verify inside the join stage (only true near-dups reach the
    dedup shuffle)."""
    exploded = _code_buckets(codes, max_hamming, blocks)
    if max_bucket_size is not None:
        # same skew guard as SimHash: drop buckets over the cap (audit
        # with a groupBy on (bid, bval) when capping in production)
        w = exploded.groupBy("bid", "bval").agg(F.count("*").alias("_bn"))
        exploded = exploded.join(
            F.broadcast(w.where(F.col("_bn") <= max_bucket_size)),
            ["bid", "bval"],
        ).drop("_bn")
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("code").alias("code_a"), "bid", "bval"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("code").alias("code_b"), "bid", "bval"
    )
    hamming = F.bit_count(F.col("code_a").bitwiseXOR(F.col("code_b")))
    return (
        a.join(b, ["bid", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def phash_image_dups(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    max_hamming: int = 4,
    blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-dup pairs by dHash Hamming distance ≤ ``max_hamming``:
    decode + hash in one Arrow pass, then the banded code join."""
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    return hamming_code_dups(
        dhash_codes(df, media_col, id_col),
        max_hamming=max_hamming,
        blocks=blocks,
        max_bucket_size=max_bucket_size,
    )
