"""Change-data-capture operators: changelog → queryable state.

A 100 TB corpus is never rebuilt from scratch — it is *maintained*: a
stream of keyed upserts/deletes (CDC from an OLTP source, crawler
re-fetches, label corrections) has to be folded into (a) the current
snapshot — from scratch (`cdc_latest_snapshot`) or incrementally against
an existing snapshot (`apply_changes`, the MERGE INTO shape) — and
(b) a full validity-interval history (SCD Type 2), and two snapshots
have to be diffable to audit what a pipeline run changed.
These are the MERGE-INTO / dimension-history primitives of
Delta/Iceberg/Hudi, expressed engine-agnostically over plain DataFrames.

Scale shape shared by all three operators: exactly ONE shuffle, keyed on
the entity key — the same key every downstream per-entity consumer
(dedup survivor selection, as-of joins, per-user features) shuffles on,
so the exchange is reusable.  No driver-side state, no Python UDFs; the
window/join kernels are whole-stage-codegen native expressions.

No reference analogue (qdrant-datafusion's sink side is `todo!()` —
`src/collection.rs:113`); this is beyond-reference surface in the same
family as the repo's ingest sinks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "apply_changes",
    "cdc_latest_snapshot",
    "scd2_apply_changes",
    "scd2_history",
    "table_diff",
]


def _desc_order(order_cols: Sequence[str]) -> list[Column]:
    return [F.col(c).desc() for c in order_cols]


def cdc_latest_snapshot(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Fold a keyed changelog into its CURRENT state: the latest row per
    key, with keys whose latest operation is a delete tombstoned away.

    ``order_cols`` must totally order each key's changes (e.g.
    ``["ts", "event_id"]`` — commit time plus a unique sequence number
    for same-instant writes) and must be NON-NULL (Spark and SQL
    engines disagree on default NULL sort placement, so a NULL order
    key would make "latest" engine-dependent; a changelog with NULL
    commit instants is malformed anyway — gate it with
    `validate.validate_constraints` first); correctness is
    deterministic only under that contract, the same one every
    log-structured store imposes.
    ``op_col``/``delete_ops`` mark tombstones; ``op_col=None`` means an
    upsert-only log (nothing is ever deleted).

    Execution: ONE hash exchange on ``key_cols`` + in-partition sort,
    then `row_number`-take-1 — Spark evaluates it as a running window
    (no per-key materialization), and AQE coalesces the post-shuffle
    partitions.  This is the standard MERGE-INTO "latest wins" kernel:
    at 100 TB the cost is the one key shuffle, which is the floor for
    any per-key fold.  Skewed keys (one entity with millions of
    updates) cost one partition's sort — not quadratic work — because
    nothing self-joins.
    """
    w = Window.partitionBy(*key_cols).orderBy(*_desc_order(order_cols))
    latest = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.filter(~F.col(op_col).isin(list(delete_ops)))
    return latest


def scd2_history(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Slowly-changing-dimension Type 2: every non-delete change becomes
    a VERSION ROW carrying its validity interval.

    ``valid_from`` = the change's own instant (first of ``order_cols``),
    ``valid_to`` = the NEXT change's instant for that key — any
    operation, including a delete, closes the open interval — and NULL
    marks the currently-open version (``is_current`` rides along, typed
    by the null test, so consumers keep a sargable predicate).  Delete
    rows emit no version of their own: a deleted key simply has no
    open interval, exactly the Kimball Type-2 contract.

    Execution: the `lead` window shares the SAME one key exchange and
    in-partition sort as :func:`cdc_latest_snapshot` — Spark computes
    `lead` in a single pass over the sorted run, so history costs no
    more than the snapshot.  The output is append-shaped (version rows
    never mutate), which is what makes this the right layout for a
    100 TB dimension: daily increments append new versions and update
    only the handful of previously-open rows.
    """
    first_order = order_cols[0]
    wa = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    out = changelog.withColumn(
        "valid_to", F.lead(F.col(first_order)).over(wa)
    ).withColumn(
        "valid_from", F.col(first_order)
    )
    if op_col is not None:
        out = out.filter(~F.col(op_col).isin(list(delete_ops)))
    return out.withColumn("is_current", F.col("valid_to").isNull())


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """MERGE INTO, engine-agnostically: fold a keyed changeset into an
    existing snapshot and return the NEW snapshot — the incremental
    sibling of :func:`cdc_latest_snapshot` (which folds a changelog
    from scratch).  Per key: the changeset's latest row wins (ordered
    by ``order_cols``, same non-NULL contract); a latest-is-delete
    tombstones the key; keys untouched by the changeset pass through
    unchanged; keys only in the changeset are inserts.

    Output schema = ``snapshot``'s columns (the changeset's op/order
    bookkeeping columns are dropped); ``changes`` must carry every
    snapshot column for its upsert rows — full-row upserts, the
    Delta/Hudi ``MERGE ... WHEN MATCHED THEN UPDATE SET *`` shape.

    Execution: the changeset resolves latest-per-key with ONE exchange
    on its own (delta-sized) data; the snapshot then anti-joins the
    touched keys and unions the upserts.  The 100 TB property: the
    snapshot is touched by exactly one join keyed on ``key_cols`` — with
    a broadcast-able daily delta the snapshot never shuffles at all, and
    with bucketed snapshot layout the exchange disappears for big deltas
    too.  Nothing is quadratic; no driver state.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*_desc_order(order_cols))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(*keys)
    upserts = latest
    if op_col is not None:
        upserts = upserts.filter(~F.col(op_col).isin(list(delete_ops)))
    return snapshot.join(touched, keys, "left_anti").unionByName(
        upserts.select(*snapshot.columns)
    )


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Incrementally MERGE a keyed changeset into an EXISTING SCD Type-2
    history — the dimension-history sibling of :func:`apply_changes`
    (which merges into a flat snapshot).  Returns the new history,
    exactly equal to rebuilding :func:`scd2_history` over the
    concatenated changelog.

    Contract (the standard Silver-layer increment): per key, every
    change instant in ``changes`` is strictly LATER than that key's
    instants already folded into ``history`` (daily batches off a
    time-ordered log satisfy this by construction).  Out-of-order
    backfill would need interval rewrites — rebuild those keys with
    :func:`scd2_history` instead.

    Per key: the delta's own version rows come from
    :func:`scd2_history` over the delta alone (delta-sized window); the
    key's currently-open history row closes at the delta's FIRST change
    instant (any op — a delete closes without emitting, the Kimball
    contract); untouched keys pass through byte-identical.

    The 100 TB property: history — the big side — is touched by exactly
    ONE join keyed on ``key_cols`` against the delta's per-key min
    instant (one row per touched key, broadcast-able for daily deltas,
    so the history never shuffles); closed version rows are never
    rewritten, which is what makes SCD2 the append-shaped layout.
    """
    keys = list(key_cols)
    first_order = order_cols[0]
    delta_hist = scd2_history(
        changes, key_cols, order_cols, op_col, delete_ops
    )
    closers = changes.groupBy(*keys).agg(
        F.min(first_order).alias("_close_at")
    )
    closed = (
        history.join(closers, keys, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("_close_at").isNotNull(),
                F.col("_close_at"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_close_at")
    )
    return closed.unionByName(delta_hist.select(*history.columns))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Audit diff of two snapshots of the same keyed table: one row per
    key that was ``added`` / ``removed`` / ``changed`` (optionally
    ``unchanged``), with ``changed_cols`` naming exactly which compared
    columns differ (null-safe: NULL↔value counts as a change,
    NULL↔NULL does not).

    Returns ``(key_cols..., status, changed_cols array<string>)`` —
    deliberately key-plus-verdict shaped, not row-payload shaped, so the
    diff of two 100 TB snapshots is itself small and the caller joins
    back for payloads only where needed.

    Execution: ONE full-outer sort-merge join on ``key_cols`` (both
    sides shuffle once on the same key; with bucketed snapshot layouts
    the exchange disappears entirely), comparison is a pure projection.
    This is what a MERGE-INTO dry-run / `table_changes()` audit costs at
    minimum, and nothing here adds to that floor: no window, no second
    shuffle, no driver state.
    """
    keys = list(key_cols)
    # explicit presence markers (not key-nullability tests): a NULL in a
    # key column never matches under SQL join semantics, and without the
    # markers such a row would be mislabeled on the wrong side
    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_o_present"),
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_n_present"),
    )
    cond = None
    for c in keys:
        eq = F.col(f"_ok_{c}") == F.col(f"_nk_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    diff_flags = [
        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in compare_cols
    ]
    # key-presence-only diff (compare_cols=[]) is a valid call shape:
    # every surviving row is purely added/removed, nothing can "change"
    any_diff = F.lit(False)
    for fl in diff_flags:
        any_diff = any_diff | fl
    changed_cols = F.filter(
        F.array(
            *[
                F.when(fl, F.lit(c))
                for c, fl in zip(compare_cols, diff_flags)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_nk_{c}"), F.col(f"_ok_{c}")).alias(c)
            for c in keys
        ],
        status.alias("status"),
        F.when(status == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
