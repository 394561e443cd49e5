"""Z-order (Morton) data layout for multi-dimensional file skipping.

Beyond-reference pipeline surface (the reference engine has no layout
control): at 100 TB the cheapest query is the one that never reads the
file, and parquet min/max footer stats prune files only when the data
LAYOUT puts similar rows together.  A single-column sort clusters one
dimension perfectly and leaves every other dimension scattered; the
Z-order curve interleaves the bits of several dimensions so every file
covers a small HYPER-RECTANGLE — predicates on ANY subset of the
clustered dimensions skip most files (the Delta/Iceberg ``ZORDER BY``
mechanism, built here from plain expressions).

Scale shape (100 TB story):

- **z_value** is a pure projection — a static chain of ``bits × dims``
  shift/mask/or terms, whole-stage-codegen'd, zero shuffle, zero Python.
- **the production layout path** is ``repartitionByRange(n_files, z)``
  (+ ``sortWithinPartitions(z)``) feeding the parquet writer: one range
  shuffle, after which every written file's min/max footer covers a
  compact z-range ⇒ a compact bbox per dimension.  No global sort, no
  single-partition funnel.
- **layout_files** (used by the gates) is the deterministic small-scale
  analogue of that range partitioner: ``ntile(n)`` over the layout
  order — cross-engine reproducible where repartitionByRange's sampled
  boundaries are not.  The downstream math (per-file min/max, box
  overlap) is IDENTICAL to what the scan planner does with parquet
  footers, so the measured "files touched" is the real pruning benefit.
- **file_minmax / files_touched** model the footer-stats prune: per-file
  bbox via one tiny groupBy (n_files rows), then a box-intersection
  filter.  All arithmetic is BIGINT — bit-identical across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "compaction_plan",
    "file_minmax",
    "files_touched",
    "hilbert_key",
    "hilbert_value",
    "layout_files",
    "z_value",
    "zorder_key",
    "zorder_layout",
]


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (non-negative ints, clamped into
    ``[0, 2^bits)``): bit ``i`` of dimension ``d`` lands at position
    ``i·D + d``.  A static, codegen-friendly expression — no UDF, no
    shuffle; result fits a BIGINT for ``bits × D ≤ 63``."""
    ndims = len(cols)
    if bits * ndims > 63:
        raise ValueError(f"bits*dims = {bits * ndims} exceeds BIGINT")
    terms: list[Column] = []
    for d, c in enumerate(cols):
        clamped = F.least(
            F.greatest(c.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1)
        )
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(clamped, i).bitwiseAND(F.lit(1)), i * ndims + d
                )
            )
    # disjoint bit positions: sum == bitwise OR
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "z"
) -> DataFrame:
    """Add the NORMALIZED Morton key: each dimension is min-max scaled
    into ``[0, 2^bits)`` from its observed range before interleaving —
    the Delta/Iceberg ``ZORDER BY`` recipe (theirs buckets by range
    partition id; min-max scaling is its deterministic, windowless
    twin).  Without this, dimensions of unequal entropy degenerate the
    curve into a single-column sort: raw interleave of 11-bit user ids
    with a 5-bit day span leaves six unpaired high bits that dominate
    the order (measured: raw z touched MORE files than an x-sort at
    sf0.1; scaled touched ~2× fewer).

    One 1-row min/max aggregate broadcast (no window, no shuffle of the
    data itself), then the pure-projection interleave.  Constant
    dimensions scale to 0 and drop out of the curve — exactly right.
    All arithmetic on the non-negative domain, so truncating division
    is floor on every engine."""
    mm = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("bigint")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("bigint")).alias(f"_hi_{c}"),
            )
        ]
    )
    top = (1 << bits) - 1
    scaled = [
        F.when(
            F.col(f"_hi_{c}") > F.col(f"_lo_{c}"),
            F.expr(f"(({c} - _lo_{c}) * {top}) div (_hi_{c} - _lo_{c})"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn(out_col, z_value(scaled, bits))
        .drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    )


def hilbert_value(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert index of two NON-NEGATIVE in-range ints (each in
    ``[0, 2^bits)``) — the classic per-bit rotate/reflect walk (the
    ``xy2d`` loop): for s = 2^(bits-1)..1, read quadrant bits (rx, ry),
    add ``s²·quad`` (quad = 0,1,3,2 for the four corners — the Gray-code
    corner order that makes consecutive indices adjacent cells), then
    reflect/transpose the lower bits into the quadrant's frame.

    Unlike Morton, every step of the Hilbert walk moves to an ADJACENT
    cell — no diagonal jumps — so equal-count file cuts along the curve
    have strictly tighter bounding boxes.  The data-dependent per-bit
    state (x and y are rewritten each step) rules out z_value's static
    shift/mask chain; instead the whole walk is ONE ``aggregate`` fold
    over the bit positions — a single runtime-looped expression: no UDF,
    no Python boundary, no exponential expression-tree unrolling, still
    whole-stage-codegen'd by Catalyst.
    """
    if 2 * bits > 63:
        raise ValueError(f"2*bits = {2 * bits} exceeds BIGINT")
    one = F.lit(1).cast("bigint")
    n = 1 << bits  # reflection is across the FULL grid (n-1-x), the
    # canonical rot() — it keeps x and y in [0, n) at every step, which
    # is what lets the SQL oracle use //-and-% bit tests (no negative
    # two's-complement corners on any engine)

    def step(a: Column, s: Column) -> Column:
        rx = F.when(a["x"].bitwiseAND(s) != 0, one).otherwise(F.lit(0).cast("bigint"))
        ry = F.when(a["y"].bitwiseAND(s) != 0, one).otherwise(F.lit(0).cast("bigint"))
        quad = (
            F.when((rx == 1) & (ry == 1), F.lit(2))
            .when(rx == 1, F.lit(3))
            .when(ry == 1, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        flip = (ry == 0) & (rx == 1)
        fx = F.when(flip, F.lit(n - 1) - a["x"]).otherwise(a["x"])
        fy = F.when(flip, F.lit(n - 1) - a["y"]).otherwise(a["y"])
        return F.struct(
            F.when(ry == 0, fy).otherwise(a["x"]).alias("x"),
            F.when(ry == 0, fx).otherwise(a["y"]).alias("y"),
            (a["d"] + s * s * quad).alias("d"),
        )

    init = F.struct(
        x.cast("bigint").alias("x"),
        y.cast("bigint").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
    )
    # fold over the descending quadrant sizes s = 2^(bits-1) .. 1
    sizes = F.array(
        *[F.lit(1 << i).cast("bigint") for i in range(bits - 1, -1, -1)]
    )
    return F.aggregate(sizes, init, step, lambda a: a["d"])


def hilbert_key(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "h"
) -> DataFrame:
    """Add the NORMALIZED 2-D Hilbert key: the same min-max scaling as
    :func:`zorder_key` (one broadcast 1-row aggregate, no data shuffle),
    then the :func:`hilbert_value` walk.  Drop-in alternative clustering
    key for :func:`zorder_layout`-style writes; the pruning gate measures
    it head-to-head against Morton on the same file cuts."""
    if len(cols) != 2:
        raise ValueError("hilbert_key is 2-D: pass exactly two columns")
    mm = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("bigint")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("bigint")).alias(f"_hi_{c}"),
            )
        ]
    )
    top = (1 << bits) - 1
    scaled = [
        F.when(
            F.col(f"_hi_{c}") > F.col(f"_lo_{c}"),
            F.expr(f"(({c} - _lo_{c}) * {top}) div (_hi_{c} - _lo_{c})"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        for c in cols
    ]
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn(out_col, hilbert_value(scaled[0], scaled[1], bits))
        .drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 8, n_files: int = 64
) -> DataFrame:
    """The production write path: add the normalized z key, range-
    partition on it, sort within partitions — ready for a parquet write
    whose file footers carry compact per-dimension min/max.  One range
    shuffle."""
    with_z = zorder_key(df, cols, bits, out_col="_z")
    return with_z.repartitionByRange(n_files, "_z").sortWithinPartitions("_z")


def layout_files(
    df: DataFrame, order_by: list[Column], n_files: int, out_col: str = "file_id"
) -> DataFrame:
    """Assign rows to ``n_files`` equal-count "files" in layout order —
    the deterministic (cross-engine ntile) analogue of
    ``repartitionByRange`` used by the measurement gates.  ``order_by``
    must be a total order (append a unique id) for reproducibility."""
    return df.withColumn(
        out_col, F.ntile(n_files).over(Window.orderBy(*order_by))
    )


def file_minmax(
    df: DataFrame, file_col: str, dims: list[str]
) -> DataFrame:
    """Per-file bounding box over ``dims`` + row count — the parquet
    footer min/max analogue; output is ``n_files`` rows."""
    aggs = [F.count("*").alias("n_rows")]
    for c in dims:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(file_col).agg(*aggs)


def files_touched(
    minmax: DataFrame, box: dict[str, tuple[Column, Column]]
) -> Column:
    """Predicate for the footer-stats prune: a file must be read iff its
    bbox intersects the query box (``min ≤ hi AND max ≥ lo`` per
    dimension) — apply as ``minmax.where(files_touched(...))``."""
    conds = [
        (F.col(f"min_{c}") <= hi) & (F.col(f"max_{c}") >= lo)
        for c, (lo, hi) in box.items()
    ]
    return reduce(lambda a, b: a & b, conds)


def compaction_plan(
    df: DataFrame,
    key_col: str,
    bytes_col: Column | str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner: assign size-skewed write units to
    output bins of ``~target_bytes`` (the planning half of a Delta/
    Iceberg ``OPTIMIZE`` / AQE partition-coalescing pass — decide which
    small units rewrite together BEFORE moving any data).

    Packing rule: order units deterministically by ``key_col``, then
    ``bin = floor(exclusive_prefix_sum(bytes) / target_bytes)`` — the
    streaming first-fit that Spark's own ShufflePartitionsUtil uses for
    coalescing: every bin except possibly the last holds >= target
    bytes only if a single unit overflows it; no bin mixes non-adjacent
    keys, so the plan is reproducible and mergeable across runs.

    Returns one row per unit: ``(key, n_rows, bytes, bin)``.

    Contract: ``key_col`` must be non-NULL — engines disagree on NULL
    sort placement (Spark asc puts NULLs first, DuckDB last), which
    would shift every prefix sum after the NULL unit.  Filter or
    coalesce keys first (same contract as the CDC order column; see
    validate_constraints ``not_null`` to audit it).

    Scale: ONE aggregation reduces the data to a manifest (one row per
    unit — metadata-sized, orders of magnitude under the data), and the
    prefix sum runs on the manifest alone; the single-partition window
    is over #units rows, never data rows (same argument as the
    broadcast offsets of `pipeline.global_shuffle`).  The data itself
    is never shuffled — executing the plan is a later
    ``repartition(bin)`` write.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    b = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    manifest = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(b).cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return manifest.select(
        key_col,
        "n_rows",
        "bytes",
        # integer `div`, not `/` + floor: byte prefix sums overflow the
        # 2^53 double mantissa long before they overflow a long
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        .cast("long")
        .alias("_cum"),
    ).select(
        key_col,
        "n_rows",
        "bytes",
        F.expr(f"_cum div {int(target_bytes)}").cast("long").alias("bin"),
    )
