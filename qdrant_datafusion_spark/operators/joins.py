"""Skew-safe join utilities.

A shuffle join hashes both sides on the key: one hot key (a viral
document id, a null-ish default, a boilerplate hash bucket) lands its
entire row population on ONE reduce task, and that task's runtime IS the
stage's runtime.  AQE's skew-join split handles the sort-merge case when
statistics surface it; ``salted_join`` is the explicit, deterministic
form for when you know the join is skewed — the standard fact⨝dim
pattern:

- the BIG (skewed) side gets a salt in ``[0, num_salts)`` derived from a
  row-identity column (NOT the join key — same-key rows must spread
  across salts, which is the whole point),
- the SMALL side is replicated ``num_salts`` times (one explode — the
  small side is small by assumption),
- the join runs on ``(key, salt)``, so a hot key's rows fan out over
  ``num_salts`` reduce tasks instead of one.

Row-for-row identical to the unsalted join (the salt only refines the
partitioning, every (key, salt) pair still meets its replicated match) —
property-tested against the plain join in tests/test_operators.py.

The LSH dedup paths guard skew differently (hot-bucket caps,
operators/dedup.py:151) because there the skew is *quadratic* (self-join);
salting fixes *linear* skew — the many-to-one lookup shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]

_SALT = "_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    row_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``large`` side with a ``small`` side on ``on``,
    spreading each hot key over ``num_salts`` reduce tasks.

    ``row_col`` is a column of ``large`` that varies WITHIN a key group
    (a row id, an event id) — the salt is ``xxhash64(row_col) %
    num_salts``, deterministic so retried tasks re-derive the same salt.
    ``how`` supports the shapes where salting is sound: ``inner`` and
    ``left`` (the salted left side keeps exactly its unsalted match
    multiplicity because every key's matches are present under every
    salt).

    Scale knob: ``num_salts`` multiplies the small side's shuffled/
    broadcast volume and caps hot-key parallelism.  Size it to the
    worst key: a key with 1B rows and num_salts=64 still leaves 16M-row
    tasks — measure, don't default.  When the small side fits a
    broadcast, prefer ``F.broadcast`` (no shuffle, no skew) — salting
    matters when BOTH sides are too big to broadcast and the big side
    is skewed.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if row_col in keys:
        # salt = hash(join key) is constant within each key group, so the
        # hot key still lands on one reduce task — the exact misuse the
        # docstring warns about.  Fail loudly instead of silently no-op.
        raise ValueError(
            f"row_col {row_col!r} must vary within a key group; it is one "
            f"of the join keys {keys!r}, which makes the salt constant "
            "per key and defeats the salting entirely"
        )
    if _SALT in large.columns or _SALT in small.columns:
        raise ValueError(f"{_SALT!r} column already present")
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(row_col)), F.lit(num_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_large.join(replicated_small, [*keys, _SALT], how).drop(_SALT)
