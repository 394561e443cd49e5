"""Count-min sketch frequency estimation + hot-key skew diagnostics.

Beyond-reference pipeline surface (the reference engine has no sketch
support): the two operators a shuffle-heavy 100 TB pipeline needs
*before* it shuffles — "which keys are heavy?" answered from a
bounded-size sketch, and "which join keys will skew my shuffle?"
answered exactly.  The existing skew-salted join (``operators/joins.py``)
consumes exactly the hot-key list ``skew_hot_keys`` produces.

Cross-engine exactness: every bucket index is derived from
``md5('cms{d}:' || key)`` (first 8 hex chars → BIGINT, mod width) — the
same double-hash family the MinHash/LSH operators use — so the sketch,
the estimates, and the heavy-hitter set are bit-identical on Spark,
DuckDB, and Python.  All arithmetic is BIGINT (thresholds are integer
cross-multiplications, ratios are fixed-point micros via truncating
division); no float appears anywhere.

Scale shape (100 TB story):

- **cms_build** is ONE shuffle whose volume is bounded by construction:
  rows explode to ``depth`` (d, bucket) pairs, and the groupBy's
  map-side combine collapses each partition to at most depth×width
  partial rows before the exchange — the shuffle carries
  O(partitions × depth × width), NOT O(rows), and the sketch itself is
  ≤ depth×width rows no matter the input size.  That is the entire
  point of the sketch: a frequency summary whose size is independent of
  the data.
- **cms_estimate** never rescans the stream: candidates hash to their
  (d, bucket) coordinates and broadcast-join the ≤ depth×width-row
  sketch (always broadcastable), then a min over the depth lanes per
  key — linear in candidates, zero passes over the original data.
  CMS guarantees est ≥ true count, so filtering candidates by an
  estimated threshold has NO false negatives.
- **skew_hot_keys** is the exact diagnostic: one map-side-combined
  groupBy over the key (the same shuffle the join under diagnosis would
  do, but carrying one row per distinct key), one broadcast single-row
  stats join.  Run it on a sample or the sketch path when even that
  pass is too much.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_auto_width",
    "cms_build",
    "cms_estimate",
    "cms_heavy_hitters",
    "cms_join_size",
    "skew_hot_keys",
]


def cms_auto_width(n_keys: int, load: float = 0.25, floor: int = 64) -> int:
    """Sketch width for a target bucket load (keys per bucket): the
    next power of two ≥ ``n_keys / load``.  A FIXED width silently
    saturates as the key space grows — measured at the 100× probe, a
    4096-bucket sketch over 150k keys put ~36 keys in every bucket and
    flagged ALL of them heavy (pure false positives); width ∝ keys
    keeps the collision mass per key constant, the same knob as
    ``dedup.auto_bucket_planes``.  The sketch stays bounded and
    broadcastable: width 2²⁰ × depth 4 is still only ~4M cells."""
    want = max(floor, int(n_keys / load))
    w = floor
    while w < want:
        w <<= 1
    return w


def _bucket(key_str: Column, d: int, width: int) -> Column:
    """Depth-``d`` bucket of a key: md5('cms{d}:'||key)[:8] as int, mod
    width.  8 hex chars < 2^32 so the BIGINT is non-negative and ``%``
    agrees across Spark / DuckDB / Python."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), key_str)), 1, 8),
            16,
            10,
        ).cast("bigint")
        % width
    )


def _coords(key_str: Column, depth: int, width: int) -> Column:
    """Array of (d, b) structs — the key's one coordinate per depth."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _bucket(key_str, d, width).alias("b"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (d, b, cnt) with one row per touched cell,
    ≤ depth×width rows total.  NULL keys are excluded (they carry no
    join/groupBy cost downstream)."""
    k = F.col(key_col).cast("string")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(_coords(k, depth, width)).alias("_e"))
        .select("_e.d", "_e.b")
        .groupBy("d", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys_df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int,
    width: int,
    out_col: str = "est",
) -> DataFrame:
    """Point-query the sketch for every (distinct) key in ``keys_df``:
    returns (key, est) where est = min over depths of the key's cell
    count — 0 for keys the sketched stream never saw (left join).
    The sketch side is broadcast: it is ≤ depth×width rows by
    construction."""
    k = F.col(key_col).cast("string")
    ex = (
        keys_df.select(F.col(key_col), F.explode(_coords(k, depth, width)).alias("_e"))
        .select(key_col, "_e.d", "_e.b")
    )
    return (
        ex.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    num: int = 2,
    den: int = 1,
) -> DataFrame:
    """Keys whose *estimated* count exceeds ``num/den`` × the mean
    per-key count, from one data pass (the sketch build) plus one
    distinct over keys.  Because CMS only overestimates, every true
    heavy hitter is in the output (no false negatives); collisions can
    add false positives, shrinking with width.

    The stream total is read back off the sketch itself (sum of the
    d=0 row counts — each depth lane sums to the stream length), so no
    second pass over the data; the distinct-key count is one extra
    1-row aggregate on the candidate set.  Threshold comparison is the
    integer cross-multiplication ``est · n_keys · den > num · total``.
    """
    sketch = cms_build(df, key_col, depth, width)
    cand = df.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    est = cms_estimate(cand, key_col, sketch, depth, width)
    total = sketch.where(F.col("d") == 0).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("_total")
    )
    nk = cand.agg(F.count("*").cast("bigint").alias("_nk"))
    return (
        est.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(nk))
        .where(F.col("est") * F.col("_nk") * den > num * F.col("_total"))
        .select(key_col, F.col("est").cast("bigint").alias("est"))
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, out_col: str = "est_pairs"
) -> DataFrame:
    """Estimate an equi-join's output cardinality from the two sides'
    sketches alone — the classic CMS inner product: per depth lane,
    Σ_buckets cntA·cntB, then min over lanes.  Overestimate-only, like
    point queries, so the estimate is a safe upper bound for shuffle
    planning (reducer sizing, broadcast-vs-SMJ choice, salt decisions)
    WITHOUT scanning either table again: both operands are
    ≤ depth×width-row summaries.  The whole computation is one
    broadcast-to-broadcast join of two tiny tables — driver-free,
    milliseconds at any data scale.  Sketches must share (depth, width,
    and the hash family — automatic for cms_build outputs)."""
    j = sketch_a.alias("a").join(
        F.broadcast(sketch_b.alias("b")),
        (F.col("a.d") == F.col("b.d")) & (F.col("a.b") == F.col("b.b")),
    )
    per_lane = j.groupBy(F.col("a.d").alias("d")).agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("_dot")
    )
    return per_lane.agg(
        F.coalesce(F.min("_dot"), F.lit(0)).cast("bigint").alias(out_col)
    )


def skew_hot_keys(
    df: DataFrame, key_col: str, num: int = 2, den: int = 1
) -> DataFrame:
    """Exact hot-key detection for shuffle-skew diagnosis: keys whose
    count exceeds ``num/den`` × the mean per-key count, with the skew
    ratio as fixed-point micros (``cnt · n_keys · 1e6  div  total`` —
    truncating integer division, identical to DuckDB's ``//``).

    Output feeds ``operators.joins.salted_join``'s hot-key list: the
    standard two-step "diagnose skew, then salt exactly the keys that
    need it" pattern.  One keyed groupBy (map-side combined) + one
    broadcast of a single stats row.
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    stats = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("_total"),
        F.count("*").cast("bigint").alias("_nk"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .where(F.col("cnt") * F.col("_nk") * den > num * F.col("_total"))
        .select(
            key_col,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("cnt * _nk * 1000000 div _total").alias("ratio_micro"),
        )
    )
