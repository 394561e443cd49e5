"""Declarative data-quality constraint validation (Deequ / dbt-test shape).

A 100 TB ingest run is gated on contracts: key completeness, key
uniqueness, value ranges, accepted vocabularies, format patterns,
foreign-key closure.  The naive audit runs one query per check — k scans
of the table.  This operator compiles EVERY scalar check into a single
aggregation pass (conditional counts + distinct counts in one
map-side-combined agg: one scan, one tiny shuffle), and each referential
check into one anti-join count (the only check that inherently needs the
other table).  Output is one row per check — the audit of a 100 TB table
is a handful of rows.

Check semantics (Deequ's): `not_null` counts NULLs; every other scalar
check counts only NON-NULL violators (a NULL neither satisfies nor
violates a range/pattern/vocabulary — completeness is its own check);
`unique` counts duplicate rows among fully-non-NULL keys
(count(non-null) − count(distinct)).  Engine-portable by construction:
counts are exact integers.

No reference analogue — beyond-reference pipeline surface, sibling of
`pipeline.profile_columns` (the profiler measures, the validator
judges).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_constraints", "discover_fds", "k_anonymity_audit"]

def validate_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str] | str] = (),
    ranges: Mapping[str, tuple] = {},
    accepted: Mapping[str, Sequence] = {},
    patterns: Mapping[str, str] = {},
    referential: Sequence[tuple] = (),
) -> DataFrame:
    """Run every declared constraint; return one row per check:
    ``(check, column, n_violations, n_rows, passed)``.

    - ``not_null``: columns that must be complete.
    - ``unique``: key column (or column list) that must identify rows.
    - ``ranges``: ``{col: (lo, hi)}`` inclusive bounds.
    - ``accepted``: ``{col: [allowed values]}`` vocabulary.
    - ``patterns``: ``{col: regex}`` — must fully match (anchored by the
      caller's regex; `rlike` semantics, i.e. *contains* unless the
      pattern anchors itself).
    - ``referential``: ``(col_tuple, ref_df, ref_col_tuple)`` triples —
      every non-NULL key must exist in ``ref_df`` (foreign-key
      closure); checked with ONE left-anti join per triple, the
      candidate stream already filtered to non-NULL keys so the join
      shuffles only real probes (or broadcasts when the ref is small).

    Scale: all scalar checks share ONE aggregation over ONE scan —
    adding a check adds a conditional-count expression, not a pass.
    `count(DISTINCT)` for multiple `unique` specs expands the agg
    (Spark rewrites multi-distinct via expand); keep `unique` specs to
    the real keys, not every column.
    """
    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    rows: list[tuple[str, str]] = []  # (check, column) per agg slot

    def _viol(name: str, check: str, column: str, cond: Column) -> None:
        agg_exprs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        )
        rows.append((check, column))

    slot = 0
    for c in not_null:
        _viol(f"_v{slot}", "not_null", c, F.col(c).isNull())
        slot += 1
    for c, (lo, hi) in ranges.items():
        _viol(
            f"_v{slot}",
            "range",
            c,
            F.col(c).isNotNull()
            & ~((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))),
        )
        slot += 1
    for c, vals in accepted.items():
        _viol(
            f"_v{slot}",
            "accepted_values",
            c,
            F.col(c).isNotNull() & ~F.col(c).isin(list(vals)),
        )
        slot += 1
    for c, rx in patterns.items():
        _viol(
            f"_v{slot}",
            "pattern",
            c,
            F.col(c).isNotNull() & ~F.col(c).rlike(rx),
        )
        slot += 1

    uniq_specs = [[u] if isinstance(u, str) else list(u) for u in unique]
    for cols in uniq_specs:
        nn = None
        for c in cols:
            p = F.col(c).isNotNull()
            nn = p if nn is None else (nn & p)
        agg_exprs.append(
            (
                F.count(F.when(nn, F.lit(1)))
                - F.count_distinct(*[F.col(c) for c in cols])
            )
            .cast("long")
            .alias(f"_v{slot}")
        )
        rows.append(("unique", ",".join(cols)))
        slot += 1

    if not rows:  # referential-only call: start from an empty audit
        out = df.sparkSession.createDataFrame(
            [],
            "check string, column string, n_violations long, "
            "n_rows long, passed boolean",
        )
        for spec in referential:
            out = out.unionByName(_referential_row(df, spec))
        return out

    one = df.agg(*agg_exprs)
    struct_rows = F.array(
        *[
            F.struct(
                F.lit(check).alias("check"),
                F.lit(column).alias("column"),
                F.col(f"_v{i}").alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, (check, column) in enumerate(rows)
        ]
    )
    out = one.select(F.explode(struct_rows).alias("r")).select("r.*")

    for spec in referential:
        out = out.unionByName(_referential_row(df, spec))
    return out


def _referential_row(df: DataFrame, spec: tuple) -> DataFrame:
    """One (check,...) audit row for a foreign-key-closure spec
    ``(cols, ref_df, ref_cols)`` — a left-anti count over the non-NULL
    probes only."""
    cols, ref_df, ref_cols = spec
    cols = [cols] if isinstance(cols, str) else list(cols)
    ref_cols = [ref_cols] if isinstance(ref_cols, str) else list(ref_cols)
    probe = df.select(
        *[F.col(c).alias(rc) for c, rc in zip(cols, ref_cols)]
    )
    nn = None
    for rc in ref_cols:
        p = F.col(rc).isNotNull()
        nn = p if nn is None else (nn & p)
    miss = (
        probe.filter(nn)
        .join(ref_df.select(*ref_cols), ref_cols, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("_m"))
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return miss.crossJoin(total).select(
        F.lit("referential").alias("check"),
        F.lit(",".join(cols)).alias("column"),
        F.col("_m").alias("n_violations"),
        F.col("_n").alias("n_rows"),
        (F.col("_m") == 0).alias("passed"),
    )


def discover_fds(
    df: DataFrame,
    candidates: Sequence[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit: for each candidate ``A -> B``, does
    every ``A``-group hold exactly one ``B`` value?  The profiling step
    that finds join keys, denormalized copies, and contract candidates
    in an unfamiliar 100 TB table (the check half of FD discovery —
    callers enumerate candidates, typically all pairs of low-distinct
    columns from :func:`~..pipeline.profile_columns`).

    Returns one row per candidate: ``(determinant, dependent, n_groups,
    n_violating, holds)`` where ``n_violating`` counts determinant
    groups with >1 distinct non-NULL dependent value (NULL dependents
    don't violate — mirror of the validator's NULL convention).

    Scale: candidates sharing a determinant share ONE groupBy — the
    audit costs one shuffle per DISTINCT determinant, each reduced
    map-side to one row per group, then folded to a single summary row;
    adding a dependent to an existing determinant adds an expression,
    not a pass.
    """
    cand = [(str(a), str(b)) for a, b in candidates]
    if not cand:
        raise ValueError("no FD candidates given")
    by_det: dict[str, list[str]] = {}
    for a, b in cand:
        by_det.setdefault(a, []).append(b)

    out = None
    for det, deps in by_det.items():
        grouped = df.groupBy(det).agg(
            *[
                F.countDistinct(dep).alias(f"_d{i}")
                for i, dep in enumerate(deps)
            ]
        )
        summary = grouped.agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            *[
                F.sum((F.col(f"_d{i}") > 1).cast("long")).alias(f"_v{i}")
                for i in range(len(deps))
            ],
        )
        rows = summary.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(det).alias("determinant"),
                            F.lit(dep).alias("dependent"),
                            F.col("_n").alias("n_groups"),
                            F.col(f"_v{i}").alias("n_violating"),
                            (F.col(f"_v{i}") == 0).alias("holds"),
                        )
                        for i, dep in enumerate(deps)
                    ]
                )
            ).alias("r")
        ).select("r.*")
        out = rows if out is None else out.unionByName(rows)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier groups.

    Every row whose quasi-identifier combination is shared by fewer
    than ``k`` rows is re-identifiable (fails k-anonymity); a group
    whose sensitive attribute takes fewer than ``l`` distinct values
    leaks it even when large (fails l-diversity).  This is the release
    gate a training-data pipeline runs before publishing per-group
    slices of user-derived data.

    Returns one row per quasi-identifier group: ``(quasi..., n_rows,
    n_sensitive, k_anonymous, l_diverse)``.  Scale: ONE groupBy on the
    quasi columns (map-side combined count + distinct-count); output is
    group-cardinality-sized, not data-sized.
    """
    qcols = [str(c) for c in quasi_cols]
    if not qcols:
        raise ValueError("need at least one quasi-identifier column")
    return df.groupBy(*qcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(sensitive_col).cast("long").alias("n_sensitive"),
    ).select(
        *qcols,
        "n_rows",
        "n_sensitive",
        (F.col("n_rows") >= k).alias("k_anonymous"),
        (F.col("n_sensitive") >= l).alias("l_diverse"),
    )
