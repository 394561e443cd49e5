"""Audio fingerprint dedup — integer energy-envelope hash over PCM WAV.

The audio twin of perceptual-hash image dedup (``operators/phash.py``):
opaque audio blobs (binary columns) become a DEDUP target.  Part of the
beyond-reference multimodal surface (SURVEY.md §2.12); the reference
engine has no audio operators.

Fingerprint: decode PCM via the stdlib ``wave`` module (no codec needed),
take 65 frames of ``frame_len`` samples, per-frame energy
``e_f = Σ x²`` (EXACT int64 arithmetic on int16 samples — no floats
anywhere), one bit per consecutive-frame energy comparison
``e_{f+1} > e_f`` → 64 bits packed MSB-first into a signed
two's-complement bigint (the ``quantize.binary_quantize`` convention).
The sign of an energy *difference* is invariant under uniform gain
scaling, so re-levelled copies of a clip hash identically — the property
that makes an envelope hash a dedup key rather than a checksum.

Pairing reuses :func:`operators.phash.hamming_code_dups` verbatim: the
block-permutation candidate join + XOR-popcount verify.  Only the hash
pass touches audio bytes (one Arrow-batched pandas UDF); pairing runs on
8-byte codes.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from qdrant_datafusion_spark.operators.phash import hamming_code_dups

__all__ = [
    "encode_wav",
    "decode_wav_samples",
    "energy_hash64",
    "audio_hash_codes",
    "audio_energy_dups",
]

#: 64 comparison bits need 65 frames
_N_FRAMES = 65


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (stdlib ``wave``) — output
    round-trips through :func:`decode_wav_samples` and any player."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_samples(data: bytes) -> np.ndarray | None:
    """PCM samples of channel 0 as int16, or None if not parseable WAV.
    (8-bit files widen to int16; >16-bit files are rejected — parsing
    24-bit packing is out of scope for the envelope hash.)"""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            nch, width = wf.getnchannels(), wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2")
        elif width == 1:  # unsigned 8-bit convention
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        else:
            return None
        return np.ascontiguousarray(x[::nch]) if nch > 1 else x
    except Exception:
        return None


def energy_hash64(samples: np.ndarray, frame_len: int = 64) -> int:
    """64-bit energy-envelope hash: bit f = (e_{f+1} > e_f), MSB-first,
    signed two's-complement int64.  All-integer; short clips are
    zero-padded (0 > 0 is False — deterministic)."""
    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")
    need = _N_FRAMES * frame_len
    x = np.asarray(samples, dtype=np.int64)[:need]
    if len(x) < need:
        x = np.pad(x, (0, need - len(x)))
    e = (x * x).reshape(_N_FRAMES, frame_len).sum(axis=1)
    code = 0
    for f in range(_N_FRAMES - 1):
        code = (code << 1) | int(e[f + 1] > e[f])
    if code >= 1 << 63:
        code -= 1 << 64
    return code


def audio_hash_codes(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    frame_len: int = 64,
) -> DataFrame:
    """(id, code) envelope hashes for a binary WAV column — one
    Arrow-batched pass; NULL/unparseable media yields NULL (dropped)."""
    if frame_len < 1:
        # fail fast on the driver — otherwise the energy_hash64 raise
        # only surfaces wrapped inside an executor-side Spark task failure
        raise ValueError("frame_len must be >= 1")

    @pandas_udf("long")
    def _ah(media: pd.Series) -> pd.Series:
        out: list[int | None] = []
        for data in media:
            if data is None:
                out.append(None)
                continue
            x = decode_wav_samples(bytes(data))
            out.append(None if x is None else energy_hash64(x, frame_len))
        return pd.Series(out, dtype="Int64")

    return df.select(
        F.col(id_col).alias("id"), _ah(F.col(media_col)).alias("code")
    ).where(F.col("code").isNotNull())


def audio_energy_dups(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    max_hamming: int = 4,
    frame_len: int = 64,
    blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Audio near-dup pairs (id_a, id_b, hamming) by envelope-hash
    Hamming distance ≤ ``max_hamming`` — decode + hash in one Arrow
    pass, then the banded 8-byte-code join."""
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")
    return hamming_code_dups(
        audio_hash_codes(df, media_col, id_col, frame_len),
        max_hamming=max_hamming,
        blocks=blocks,
        max_bucket_size=max_bucket_size,
    )
