"""Temporal join operators Spark lacks natively: as-of and interval joins.

``as_of_join`` — for every left row, the single closest right row at or
before (backward) / at or after (forward) its timestamp within the same
key: the standard event-enrichment join (each purchase gets the latest
preceding click; each quote gets the prevailing rate).  Spark has no
ASOF JOIN; the naive rewrite (range join + row_number) shuffles the
*pair* space.  This implementation is the scale-safe union trick:

    tag left/right → unionByName → one shuffle on the key →
    in-partition sort by (time, side, seq) → last(ignorenulls) carry →
    keep left rows

Cost is ONE hash shuffle of |L|+|R| rows and one in-partition sort —
the same shape as a groupBy, no pair blow-up, AQE-skew-splittable.  The
carried columns ride the same shuffle, so there is no second join to
re-attach them.

``interval_join`` — rows joined on key equality + time containment
(point-in-interval).  Expressed as an equi-join ON the key with the
range as a post-join filter, so Catalyst plans a hash join on the key
(NOT a nested-loop over pairs); per-key interval counts are what bound
the worst case.

Both carry deterministic tie rules (documented per function) so results
are oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["as_of_join", "interval_join", "funnel_stages", "resample_interpolate", "robust_anomalies"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    seq_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Enrich each left row with the nearest right row's ``value_cols``.

    ``direction='backward'`` matches the latest right row with
    ``r.on <= l.on`` (inclusive); ``'forward'`` the earliest with
    ``r.on >= l.on``.  ``tolerance`` (same units as ``on``) nulls the
    match when ``|l.on - r.on| > tolerance``.  Ties — several right rows
    at the exact matched timestamp — resolve to the largest ``seq_col``
    for backward and the smallest for forward (pass e.g. an event id;
    required for deterministic output when timestamps can collide).

    Output: all left columns plus ``on+suffix`` (the matched timestamp,
    null when no match) and each value column as ``col+suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols or [])
    carried = [on] + value_cols

    sel_right = [F.col(c) for c in by_cols]
    sel_right += [F.col(c).alias(f"__r_{c}") for c in carried]
    seq_type = right.schema[seq_col].dataType.simpleString() if seq_col else "int"
    sel_right.append(
        (F.col(seq_col) if seq_col else F.lit(0)).cast(seq_type).alias("__seq")
    )
    r = right.select(*sel_right).withColumn("__side", F.lit(0))
    # the left side carries nulls in the right slots; last(ignorenulls)
    # skips them, so left rows never leak values into later left rows
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__seq", F.lit(0).cast(seq_type)
    )
    for c in carried:
        rt = right.schema[c].dataType.simpleString()
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(rt))

    u = l.unionByName(r, allowMissingColumns=True)
    # right rows carry their time only in __r_<on> (the bare <on> column is
    # null after the union) — order on the side-appropriate event time
    u = u.withColumn("__t", F.coalesce(F.col(f"__r_{on}"), F.col(on)))

    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__seq").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(), F.col("__seq").desc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(f"__m_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))

    out = u.filter(F.col("__side") == 1)
    matched_on = F.col(f"__m_{on}")
    if tolerance is not None:
        gap = (
            F.col(on) - matched_on if direction == "backward" else matched_on - F.col(on)
        )
        valid = matched_on.isNotNull() & (gap <= tolerance)
    else:
        valid = matched_on.isNotNull()
    proj = [F.col(c) for c in left.columns]
    for c in carried:
        proj.append(F.when(valid, F.col(f"__m_{c}")).alias(f"{c}{suffix}"))
    return out.select(*proj)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows on key equality + containment
    (``start <= point < end``, half-open — adjacent intervals never
    double-match a boundary point).

    The equi-key keeps this a hash join (one shuffle each side); the
    containment predicate filters inside the join.  At 100 TB the bound
    is max points×intervals *per key*, not the global cross product.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    # explicit aliases: both sides often derive from one lineage (events →
    # points + windows), where bare column refs turn self-join conditions
    # trivially true
    p, i = points.alias("__pts"), intervals.alias("__ivl")
    cond: Column | None = None
    for c in by_cols:
        eq = F.col(f"__pts.{c}") == F.col(f"__ivl.{c}")
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (F.col(f"__pts.{on}") >= F.col(f"__ivl.{start_col}"))
        & (F.col(f"__pts.{on}") < F.col(f"__ivl.{end_col}"))
    )
    joined = p.join(i, cond, how)
    # drop the duplicate key columns from the interval side
    proj = [F.col(f"__pts.{c}") for c in points.columns]
    proj += [F.col(f"__ivl.{c}") for c in intervals.columns if c not in by_cols]
    return joined.select(*proj)


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: Column | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Ordered-funnel analysis: how many users progress through
    ``stages`` in strict timestamp order (stage *i+1*'s event must be
    STRICTLY after the user's earliest qualifying stage-*i* event, and —
    with ``max_gap`` — within that gap of it).

    The per-user state is the earliest qualifying timestamp of the
    current stage; each stage is ONE keyed equi-join against that state
    plus a groupBy — never a window over a user's whole history, so a
    100 TB event log pays S keyed shuffles of the (shrinking) qualifying
    stream and nothing pairwise.  Stage states are lazily
    ``localCheckpoint``-ed (``materialize``) so counting stage *i* does
    not recompute stages 1..i-1 — the standard lineage-truncation move
    for iterative DataFrame chains.

    Returns one row per stage: ``(stage_idx, stage, users)`` with
    ``stage_idx`` 1-based; ratios are left to the caller (they need the
    caller's rounding policy).

    ``max_gap``: a Column interval (e.g. ``F.expr("INTERVAL 7 DAYS")``)
    bounding ``t_next - t_prev``; ``None`` = unbounded.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    cur: DataFrame | None = None
    per_stage: list[DataFrame] = []
    for idx, st in enumerate(stages):
        ev = events.where(F.col(type_col) == st).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        if cur is None:
            nxt = ev.groupBy("_u").agg(F.min("_t").alias("_t"))
        else:
            j = ev.join(
                cur.select("_u", F.col("_t").alias("_pt")), "_u"
            ).where(F.col("_t") > F.col("_pt"))
            if max_gap is not None:
                j = j.where(F.col("_t") <= F.col("_pt") + max_gap)
            nxt = j.groupBy("_u").agg(F.min("_t").alias("_t"))
        if materialize:
            nxt = nxt.localCheckpoint(eager=False)
        cur = nxt
        per_stage.append(
            cur.agg(F.count("*").cast("long").alias("users")).select(
                F.lit(idx + 1).cast("int").alias("stage_idx"),
                F.lit(st).alias("stage"),
                "users",
            )
        )
    out = per_stage[0]
    for s in per_stage[1:]:
        out = out.unionByName(s)
    return out


def resample_interpolate(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    value_col: str = "v",
    step: int = 86_400,
    seq_col: str | None = None,
) -> DataFrame:
    """Gap-fill a per-key time series onto a regular grid with linear
    interpolation — the resample step of time-series feature pipelines
    (Pandas' ``resample().interpolate()``, TimescaleDB's
    ``time_bucket_gapfill`` + ``interpolate``), which Spark has no
    native operator for.

    INTEGER contract: ``ts_col`` is an integer instant (any epoch unit),
    ``value_col`` an integer measure (quantize floats to fixed-point
    first), ``step > 0`` the grid pitch in the same unit.  The
    interpolated value is ``v_prev + (v_next−v_prev)·(t−t_prev) div
    (t_next−t_prev)`` — one truncating BIGINT division, bit-identical on
    Spark / DuckDB / Python (both engines truncate toward zero for any
    sign).  Grid points coinciding with an observation return it
    exactly.  Duplicate (key, ts) observations resolve to the largest
    ``seq_col`` (or largest value when ``seq_col`` is None) — a
    deterministic latest-write-wins.

    The grid spans ``[ceil(min_ts/step), floor(max_ts/step)]·step`` per
    key, so every grid point has both neighbors: no nulls, no
    extrapolation policy to pick.

    Scale shape: the union trick of :func:`as_of_join` — observations
    and generated grid rows union, then the two neighbor carries are
    ``last(ignorenulls)`` windows over the SAME key partitioning in
    opposite sort directions (one exchange, two in-partition sorts).
    Duplicate resolution costs nothing: the tie column is folded into
    the sort order so each carry lands on the latest-write row — no
    separate dedup shuffle on (key, ts).  The per-key bounds aggregate
    is the only other exchange, and it carries two BIGINTs per key.
    No pair joins, no per-key collect; grid volume is span/step rows
    per key — the caller's knob.
    """
    if step <= 0:
        raise ValueError("step must be positive")
    tie = F.col(seq_col) if seq_col else F.col(value_col)
    obs = df.where(
        F.col(by).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(by),
        F.col(ts_col).cast("bigint").alias("_t"),
        F.col(value_col).cast("bigint").alias("_v"),
        tie.alias("_tie"),  # any orderable type: only sorted, never cast
    )
    # ceil/floor grid bounds via sign-safe floor division
    bounds = obs.groupBy(by).agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx")
    )
    start = F.expr(
        f"((_mn + {step - 1}) - pmod(_mn + {step - 1}, {step})) div {step}"
    ) * step
    stop = F.expr(f"(_mx - pmod(_mx, {step})) div {step}") * step
    grid = (
        bounds.select(F.col(by), start.alias("_lo"), stop.alias("_hi"))
        .where(F.col("_lo") <= F.col("_hi"))
        .select(
            by,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step).cast("bigint"))
            ).alias("_t"),
        )
        .select(
            by, "_t",
            F.lit(None).cast("bigint").alias("_v"),
            F.lit(1).alias("_tag"),
        )
    )
    u = obs.withColumn("_tag", F.lit(0)).unionByName(
        grid, allowMissingColumns=True  # grid rows: _tie null, typed by obs
    )
    # ascending carry: at a grid row, the last non-null value seen is the
    # nearest obs at t <= grid t; ties at one instant order tie-ASC so the
    # carry lands on the LARGEST tie (latest write) without a dedup pass.
    wp = (
        Window.partitionBy(by)
        .orderBy(F.asc("_t"), F.asc("_tag"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # descending carry: same trick from the other side — the last value
    # in (t DESC, tag DESC, tie ASC) order is the nearest obs at
    # t > grid t (same-instant obs sort AFTER the grid row here, so the
    # forward neighbor is strictly later; exactness at observations is
    # already guaranteed by the ascending carry's t_prev == t).
    wn = (
        Window.partitionBy(by)
        .orderBy(F.desc("_t"), F.desc("_tag"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_t = F.when(F.col("_tag") == 0, F.col("_t"))
    carried = (
        u.withColumn("_pv", F.last("_v", ignorenulls=True).over(wp))
        .withColumn("_pt", F.last(obs_t, ignorenulls=True).over(wp))
        .withColumn("_nv", F.last("_v", ignorenulls=True).over(wn))
        .withColumn("_nt", F.last(obs_t, ignorenulls=True).over(wn))
    )
    interp = F.when(
        F.col("_nt") > F.col("_pt"),
        F.col("_pv")
        + F.expr("((_nv - _pv) * (_t - _pt)) div (_nt - _pt)"),
    ).otherwise(F.col("_pv"))
    return (
        carried.where(F.col("_tag") == 1)
        .select(
            F.col(by),
            F.col("_t").alias(ts_col),
            interp.cast("bigint").alias(value_col),
        )
    )


def robust_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    k_num: int = 3,
    k_den: int = 2,
) -> DataFrame:
    """Per-key robust outlier flagging by median/MAD — the monitoring
    primitive that survives the outliers it hunts (mean/stddev do not):
    a row is anomalous when ``|x − median| > (k_num/k_den) · MAD``.

    Deterministic and engine-portable by construction: medians are
    LOWER medians (the value at rank ceil(n/2) of the per-key sort —
    a selected element, never an interpolated average, so integer
    inputs stay integers and Spark/DuckDB agree bit-for-bit), and the
    threshold compare is cross-multiplied (``k_den·dev > k_num·MAD``)
    so no division happens anywhere.  ``MAD = 0`` (over half the key's
    values identical) degrades to "flag any deviation", the standard
    convention.  ``tiebreak_col`` makes the rank orders total; equal
    values at the median rank make the selected value — and therefore
    the output — independent of the tiebreak.

    Returns the input rows plus ``(n, med, dev, mad, is_anomaly)``.

    Scale shape: ONE hash exchange on ``key_col`` feeding three window
    passes (rank-by-value, rank-by-deviation, the conditional-max
    median/MAD selections) that re-sort IN PLACE within the same
    partitions — Exchange reuse means a 100 TB run pays one shuffle
    and per-partition sorts, never a global sort and never a
    per-key collect.  A skewed key costs one partition's sort.
    """
    w = Window.partitionBy(key_col)
    w_v = w.orderBy(F.col(value_col).asc(), F.col(tiebreak_col).asc())
    n = F.count("*").over(w)
    med_rank = (n + 1) - (n + 1) % 2  # 2*ceil(n/2): avoids int division
    rn = F.row_number().over(w_v)
    with_med = (
        df.withColumn("n", n.cast("long"))
        .withColumn("_rn", rn)
        .withColumn(
            "med",
            F.max(
                F.when(F.col("_rn") * 2 == med_rank, F.col(value_col))
            ).over(w),
        )
    )
    dev = F.abs(F.col(value_col) - F.col("med"))
    w_d = w.orderBy(dev.asc(), F.col(tiebreak_col).asc())
    rn2 = F.row_number().over(w_d)
    out = (
        with_med.withColumn("dev", dev)
        .withColumn("_rn2", rn2)
        .withColumn(
            "mad",
            F.max(
                F.when(F.col("_rn2") * 2 == med_rank, F.col("dev"))
            ).over(w),
        )
        .withColumn(
            "is_anomaly",
            F.col("dev") * F.lit(k_den) > F.col("mad") * F.lit(k_num),
        )
    )
    return out.drop("_rn", "_rn2")
