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

__all__ = ["salted_join", "bloom_semi_join", "range_bucket_join"]

_SALT = "_salt"

# driver-side bitmap cutoff shared with pipeline.decontaminate_bloom —
# ≤ 2 MB round-trips once; above it the bitmap stays distributed
_DRIVER_BITMAP_MAX_BITS = 1 << 24


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "semi",
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Semi/anti join of a huge ``fact`` against ``dim``'s keys with a
    Bloom-filter RUNTIME PREFILTER — the exact result of
    ``fact.join(dim_keys, on, "left_semi"/"left_anti")``, reached
    without ever shuffling the unmatched bulk of the fact side.

    Why this exists at 100 TB: the classic selective fact⨝dim query
    prunes 99% of the fact AT THE JOIN — after the full fact table has
    already been shuffled.  Broadcasting the dim keys fixes that only
    while they fit (100M keys × 8 B = 800 MB broadcast: dead).  The
    Bloom bitmap is a FIXED ``m_bits/8`` bytes (128 KB at the default)
    regardless of dim cardinality, and a Bloom filter has NO false
    negatives, so prefilter + exact-verify of the tiny surviving stream
    reproduces the exact join — Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` applies the same idea
    when statistics surface it; this is the explicit, deterministic
    form with the verify step built in.

    Pipeline:

    1. distinct dim keys hash to 64 bits; each sets ``num_hashes`` bit
       positions; the bitmap is a ``bit_or`` aggregate over 64-bit words
       (≤ ``m_bits/64`` rows).  ≤ 2 MB bitmaps round-trip the driver
       once; larger ones stay distributed via ``localCheckpoint``.
    2. every fact row probes the bitmap through ``num_hashes``
       broadcast joins on the word index — map-side, ZERO shuffle of
       the fact; a row survives only if ALL its bits are set.
    3. ``semi``: survivors (true matches + Bloom false-positive
       residue) are exact-verified with a plain semi join — the
       candidate stream is post-Bloom small, so AQE picks a cheap
       strategy and only matches pay a shuffle.  ``anti``: rows failing
       any bit test are DEFINITE non-matches and short-circuit out
       map-side; only the survivors pay the exact anti join.

    Key columns must agree in name and type on both sides (the 64-bit
    probe hash must match bit-for-bit).  FP sizing as in
    ``decontaminate_bloom``: FP ≈ (1−e^(−kn/m))^k — at n=100k keys,
    m=2^20, k=3 → ~0.2%; scale ``m_bits`` ≈ 10–16 bits per dim key.
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"bloom_semi_join supports semi/anti, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    key_hash = F.xxhash64(*[F.col(k) for k in keys])
    # the distinct key set feeds BOTH the bitmap build and the exact
    # verify join; a lazy localCheckpoint materializes it executor-side
    # exactly once (first use) and truncates lineage, so the dim table
    # is scanned once per call, not twice — released with this frame,
    # no session-lifetime cache (the decontaminate_bloom argument)
    dim_keys = dim.select(*keys).distinct().localCheckpoint(eager=False)

    def pos(c, i: int):
        return F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits))

    bitmap_df = (
        dim_keys.select(key_hash.alias("_kh"))
        .select(
            F.explode(
                F.array(*[pos(F.col("_kh"), i) for i in range(num_hashes)])
            ).alias("_pos")
        )
        .select(
            F.floor(F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )
    if m_bits <= _DRIVER_BITMAP_MAX_BITS:
        rows = bitmap_df.collect()
        bitmap = fact.sparkSession.createDataFrame(
            [(int(r["word_idx"]), int(r["word"])) for r in rows]
            or [(0, 0)],
            "word_idx long, word long",
        )
    else:
        bitmap = bitmap_df.localCheckpoint(eager=True)

    cand = fact.withColumn("_kh", key_hash)
    for i in range(num_hashes):
        cand = cand.withColumn(f"_k{i}", pos(F.col("_kh"), i))
    survive = None
    for i in range(num_hashes):
        w = bitmap.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")
        )
        cand = cand.join(
            F.broadcast(w),
            F.floor(F.col(f"_k{i}") / 64).cast("long") == F.col(f"_wi{i}"),
            "left",
        )
        mask = F.expr(f"shiftleft(1L, cast(pmod(_k{i}, 64) as int))")
        hit = F.col(f"_w{i}").isNotNull() & (
            F.col(f"_w{i}").bitwiseAND(mask) != 0
        )
        survive = hit if survive is None else survive & hit

    fact_cols = fact.columns
    survivors = cand.filter(survive).select(*fact_cols)
    if how == "semi":
        return survivors.join(dim_keys, keys, "left_semi")
    definite_miss = cand.filter(~survive).select(*fact_cols)
    return definite_miss.unionByName(
        survivors.join(dim_keys, keys, "left_anti")
    )


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


def range_bucket_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Inner-join ``fact`` rows to every ``dim`` interval containing
    ``value_col`` (inclusive on both ends) — as an EQUI-join.

    Spark has no range-join optimization: ``fact JOIN dim ON v BETWEEN
    lo AND hi`` plans as BroadcastNestedLoopJoin, which evaluates every
    (row, interval) pair — O(|fact|·|dim|) work per partition, the
    classic silent scale-killer for IP→geo, price→band, ts→window
    lookups.  The bucket trick converts it: each dim interval is
    exploded to every width-``w`` bucket it touches, each fact row maps
    to the ONE bucket containing its value, and the join runs on the
    bucket id with the exact BETWEEN as a cheap post-filter.  A fact row
    meets a given interval in exactly one bucket (its own), so no
    dedup is needed — output is row-for-row the nested-loop answer
    (property-tested against the naive join).

    ``bucket_width``: defaults to the dim's mean interval span (one
    1-row aggregate — bounded driver state), giving ~2 bucket copies
    per interval.  Smaller w = fewer false candidates per bucket but
    more dim copies (copies ≈ span/w + 1); the residual filter keeps
    every choice CORRECT, w only tunes cost.  ``broadcast_dim`` pins a
    broadcast hash join (the usual case — a band/geo dim is small even
    exploded); pass False to let AQE choose (shuffle join on the
    bucket id) when the dim is itself huge.
    """
    if bucket_width is None:
        row = dim.agg(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")
        ).first()
        bucket_width = float(row["w"] or 0.0)
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    b = "_rbj_bucket"
    if b in fact.columns or b in dim.columns:
        raise ValueError(f"{b!r} column already present")
    w = F.lit(float(bucket_width))
    d = dim.withColumn(
        b,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_dim:
        d = F.broadcast(d)
    f = fact.withColumn(b, F.floor(F.col(value_col) / w).cast("long"))
    return (
        f.join(d, b)
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop(b)
    )
