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
    "file_minmax",
    "files_touched",
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
