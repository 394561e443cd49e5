"""operators.cdc — changelog folding, SCD2 history, snapshot diff."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.cdc import (
    apply_changes,
    cdc_latest_snapshot,
    scd2_history,
    table_diff,
)


CHANGELOG_SCHEMA = "k long, seq long, op string, val string"
# key 1: insert, update, update      -> live, val=c
# key 2: insert, delete              -> tombstoned
# key 3: insert, delete, insert      -> live again, val=f
# key 4: single insert               -> live, val=g
CHANGELOG = [
    (1, 10, "upsert", "a"),
    (1, 20, "upsert", "b"),
    (1, 30, "upsert", "c"),
    (2, 11, "upsert", "d"),
    (2, 21, "delete", None),
    (3, 12, "upsert", "e"),
    (3, 22, "delete", None),
    (3, 32, "upsert", "f"),
    (4, 13, "upsert", "g"),
]


@pytest.fixture()
def log(spark):
    return spark.createDataFrame(CHANGELOG, CHANGELOG_SCHEMA)


class TestLatestSnapshot:
    def test_latest_wins_and_tombstones(self, log):
        rows = {
            r["k"]: r["val"]
            for r in cdc_latest_snapshot(
                log, ["k"], ["seq"], op_col="op"
            ).collect()
        }
        assert rows == {1: "c", 3: "f", 4: "g"}  # key 2 deleted

    def test_upsert_only_log_keeps_all_keys(self, log):
        rows = {
            r["k"]: r["op"]
            for r in cdc_latest_snapshot(log, ["k"], ["seq"]).collect()
        }
        # no op_col: the delete row itself is just the latest record
        assert rows == {1: "upsert", 2: "delete", 3: "upsert", 4: "upsert"}

    def test_tiebreak_column(self, spark):
        # same seq, differing tiebreak: highest (seq, sub) wins
        df = spark.createDataFrame(
            [(1, 10, 1, "x"), (1, 10, 2, "y")],
            "k long, seq long, sub long, val string",
        )
        r = cdc_latest_snapshot(df, ["k"], ["seq", "sub"]).collect()
        assert [x["val"] for x in r] == ["y"]


class TestScd2History:
    def test_intervals_and_current_flag(self, log):
        h = {
            (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"])
            for r in scd2_history(log, ["k"], ["seq"], op_col="op").collect()
        }
        # key 1: three versions chained, last open
        assert h[(1, 10)] == (20, False)
        assert h[(1, 20)] == (30, False)
        assert h[(1, 30)] == (None, True)
        # key 2: its only version is CLOSED by the delete; no open row
        assert h[(2, 11)] == (21, False)
        # key 3: first version closed by delete, re-insert open
        assert h[(3, 12)] == (22, False)
        assert h[(3, 32)] == (None, True)
        assert h[(4, 13)] == (None, True)

    def test_no_delete_rows_emitted(self, log):
        ops = {
            r["op"]
            for r in scd2_history(log, ["k"], ["seq"], op_col="op").collect()
        }
        assert ops == {"upsert"}

    def test_history_covers_snapshot(self, log):
        """The open intervals ARE the snapshot — the two operators agree."""
        snap = {
            (r["k"], r["val"])
            for r in cdc_latest_snapshot(
                log, ["k"], ["seq"], op_col="op"
            ).collect()
        }
        open_rows = {
            (r["k"], r["val"])
            for r in scd2_history(log, ["k"], ["seq"], op_col="op")
            .filter("is_current")
            .collect()
        }
        assert snap == open_rows


class TestTableDiff:
    def _pair(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, None, 50)],
            "k long, s string, v long",
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40), (5, None, 51)],
            "k long, s string, v long",
        )
        return old, new

    def test_statuses(self, spark):
        old, new = self._pair(spark)
        d = {
            r["k"]: (r["status"], sorted(r["changed_cols"]))
            for r in table_diff(old, new, ["k"], ["s", "v"]).collect()
        }
        assert d == {
            2: ("changed", ["s"]),
            3: ("removed", []),
            4: ("added", []),
            5: ("changed", ["v"]),
        }

    def test_null_safe_compare(self, spark):
        old = spark.createDataFrame([(1, None)], "k long, s string")
        new = spark.createDataFrame([(1, None)], "k long, s string")
        assert table_diff(old, new, ["k"], ["s"]).count() == 0
        new2 = spark.createDataFrame([(1, "x")], "k long, s string")
        r = table_diff(old, new2, ["k"], ["s"]).collect()
        assert r[0]["status"] == "changed" and r[0]["changed_cols"] == ["s"]

    def test_include_unchanged(self, spark):
        old, new = self._pair(spark)
        d = table_diff(old, new, ["k"], ["s", "v"], include_unchanged=True)
        assert {r["k"]: r["status"] for r in d.collect()}[1] == "unchanged"

    def test_null_keyed_rows_never_match(self, spark):
        """A NULL key never joins (SQL semantics): the old row surfaces
        as removed, the new row as added — not as a bogus change."""
        old = spark.createDataFrame([(None, "a"), (1, "b")], "k long, s string")
        new = spark.createDataFrame([(None, "a"), (1, "b")], "k long, s string")
        d = {
            (r["k"], r["status"])
            for r in table_diff(old, new, ["k"], ["s"]).collect()
        }
        assert d == {(None, "removed"), (None, "added")}

    def test_multi_key(self, spark):
        old = spark.createDataFrame(
            [(1, "x", 7), (1, "y", 8)], "a long, b string, v long"
        )
        new = spark.createDataFrame(
            [(1, "x", 7), (1, "z", 9)], "a long, b string, v long"
        )
        d = {
            (r["a"], r["b"]): r["status"]
            for r in table_diff(old, new, ["a", "b"], ["v"]).collect()
        }
        assert d == {(1, "y"): "removed", (1, "z"): "added"}

    def test_empty_compare_cols(self, spark):
        """Key-presence-only diff (compare_cols=[]) is a valid call
        shape: surviving rows are purely added/removed, never changed."""
        old, new = self._pair(spark)
        d = {
            r["k"]: (r["status"], list(r["changed_cols"]))
            for r in table_diff(old, new, ["k"], []).collect()
        }
        assert d == {3: ("removed", []), 4: ("added", [])}

    def test_single_shuffle_plan(self, spark):
        """The diff is one join — no second exchange beyond the two
        side-shuffles feeding the SMJ (or zero with broadcast)."""
        old, new = self._pair(spark)
        plan = (
            table_diff(old, new, ["k"], ["s", "v"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("SortMergeJoin") + plan.count(
            "BroadcastHashJoin"
        ) == 1

class TestApplyChanges:
    def _fixture(self, spark):
        snapshot = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
        )
        # k=1: two upserts (latest wins -> a2); k=2: delete;
        # k=4: insert of a key absent from the snapshot;
        # k=5: upsert then delete (latest-is-delete -> never appears);
        # k=3: untouched -> passes through
        changes = spark.createDataFrame(
            [
                (1, "a1", 1, "upsert"),
                (1, "a2", 2, "upsert"),
                (2, None, 1, "delete"),
                (4, "d", 1, "upsert"),
                (5, "e", 1, "upsert"),
                (5, None, 2, "delete"),
            ],
            "k long, val string, seq long, op string",
        )
        return snapshot, changes

    def test_merge_semantics(self, spark):
        snapshot, changes = self._fixture(spark)
        out = apply_changes(snapshot, changes, ["k"], ["seq"], op_col="op")
        assert {(r["k"], r["val"]) for r in out.collect()} == {
            (1, "a2"),
            (3, "c"),
            (4, "d"),
        }
        assert out.columns == snapshot.columns

    def test_upsert_only_log(self, spark):
        snapshot, changes = self._fixture(spark)
        out = apply_changes(
            snapshot, changes.drop("op"), ["k"], ["seq"]
        )
        # without tombstone semantics the latest row always wins
        assert {(r["k"], r["val"]) for r in out.collect()} == {
            (1, "a2"),
            (2, None),
            (3, "c"),
            (4, "d"),
            (5, None),
        }

    def test_equals_full_fold(self, spark):
        """apply_changes(latest(log[:t]), log[t:]) == latest(full log) —
        the incremental fold must agree with the from-scratch fold."""
        log = spark.createDataFrame(
            [
                (1, 1, "upsert", "a"),
                (2, 2, "upsert", "b"),
                (1, 3, "upsert", "a2"),
                (3, 4, "upsert", "c"),
                (2, 5, "delete", None),
                (4, 6, "upsert", "d"),
                (3, 7, "delete", None),
                (3, 8, "upsert", "c2"),
            ],
            "k long, seq long, op string, val string",
        )
        full = cdc_latest_snapshot(log, ["k"], ["seq"], op_col="op")
        head = cdc_latest_snapshot(
            log.filter("seq <= 4"), ["k"], ["seq"], op_col="op"
        ).select("k", "val")
        inc = apply_changes(
            head, log.filter("seq > 4"), ["k"], ["seq"], op_col="op"
        )
        assert {(r["k"], r["val"]) for r in inc.collect()} == {
            (r["k"], r["val"]) for r in full.select("k", "val").collect()
        }


class TestScd2ApplyChanges:
    def _split(self, spark, cutoff):
        base_rows = [r for r in CHANGELOG if r[1] <= cutoff]
        delta_rows = [r for r in CHANGELOG if r[1] > cutoff]
        return (
            spark.createDataFrame(base_rows, CHANGELOG_SCHEMA),
            spark.createDataFrame(delta_rows, CHANGELOG_SCHEMA),
        )

    @pytest.mark.parametrize("cutoff", [10, 12, 20, 21, 22, 30])
    def test_incremental_equals_full_fold(self, spark, log, cutoff):
        from qdrant_datafusion_spark.operators.cdc import scd2_apply_changes

        base_df, delta_df = self._split(spark, cutoff)
        kwargs = dict(
            key_cols=["k"], order_cols=["seq"], op_col="op",
            delete_ops=("delete",),
        )
        base = scd2_history(base_df, **kwargs)
        merged = scd2_apply_changes(base, delta_df, **kwargs)
        full = scd2_history(log, **kwargs)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        ), cutoff

    def test_delete_only_delta_closes_without_emitting(self, spark):
        from qdrant_datafusion_spark.operators.cdc import scd2_apply_changes

        base = scd2_history(
            spark.createDataFrame(
                [(7, 10, "upsert", "x")], CHANGELOG_SCHEMA
            ),
            ["k"], ["seq"], op_col="op",
        )
        delta = spark.createDataFrame([(7, 20, "delete", None)], CHANGELOG_SCHEMA)
        merged = scd2_apply_changes(
            base, delta, ["k"], ["seq"], op_col="op"
        ).collect()
        assert len(merged) == 1  # no version row for the delete itself
        (row,) = merged
        assert row["valid_to"] == 20 and row["is_current"] is False

    def test_untouched_keys_pass_through(self, spark, log):
        from qdrant_datafusion_spark.operators.cdc import scd2_apply_changes

        base = scd2_history(log, ["k"], ["seq"], op_col="op")
        delta = spark.createDataFrame(
            [(99, 100, "upsert", "new")], CHANGELOG_SCHEMA
        )
        merged = scd2_apply_changes(base, delta, ["k"], ["seq"], op_col="op")
        untouched = sorted(
            map(tuple, merged.filter(F.col("k") != 99).collect())
        )
        assert untouched == sorted(map(tuple, base.collect()))
        new = merged.filter(F.col("k") == 99).collect()
        assert len(new) == 1 and new[0]["is_current"] is True
