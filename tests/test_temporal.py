"""as-of and interval joins: semantics, ties, tolerance, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.temporal import as_of_join, interval_join


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, 10.0), (1, 205, 11.0), (2, 50, 9.0), (3, 10, 1.0)],
        "sym int, ts long, px double",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 1, 9.9), (1, 100, 2, 10.1), (1, 200, 3, 10.9), (2, 60, 4, 8.8)],
        "sym int, ts long, qid long, bid double",
    )
    return trades, quotes


class TestAsOfJoin:
    def test_backward_inclusive_latest(self, spark):
        trades, quotes = _trades_quotes(spark)
        out = {
            (r.sym, r.ts): (r.ts_right, r.bid_right)
            for r in as_of_join(
                trades, quotes, on="ts", by="sym", value_cols=["bid"], seq_col="qid"
            ).collect()
        }
        assert out[(1, 100)] == (100, 10.1)  # equal ts matches (inclusive)
        assert out[(1, 205)] == (200, 10.9)  # latest preceding
        assert out[(2, 50)] == (None, None)  # quote is later → no match
        assert out[(3, 10)] == (None, None)  # key never quoted

    def test_forward_direction(self, spark):
        trades, quotes = _trades_quotes(spark)
        out = {
            (r.sym, r.ts): (r.ts_right, r.bid_right)
            for r in as_of_join(
                trades, quotes, on="ts", by="sym", value_cols=["bid"],
                direction="forward", seq_col="qid",
            ).collect()
        }
        assert out[(1, 100)] == (100, 10.1)  # inclusive both directions
        assert out[(1, 205)] == (None, None)  # nothing after
        assert out[(2, 50)] == (60, 8.8)  # earliest following

    def test_tolerance_nulls_stale_matches(self, spark):
        trades, quotes = _trades_quotes(spark)
        out = {
            (r.sym, r.ts): r.bid_right
            for r in as_of_join(
                trades, quotes, on="ts", by="sym", value_cols=["bid"],
                tolerance=4, seq_col="qid",
            ).collect()
        }
        assert out[(1, 100)] == 10.1  # gap 0 <= 4
        assert out[(1, 205)] is None  # gap 5 > 4

    def test_ties_resolve_by_seq(self, spark):
        left = spark.createDataFrame([(1, 100)], "k int, ts long")
        right = spark.createDataFrame(
            [(1, 100, 7, "low"), (1, 100, 9, "high")], "k int, ts long, sq long, tag string"
        )
        back = as_of_join(
            left, right, on="ts", by="k", value_cols=["tag"], seq_col="sq"
        ).collect()[0]
        assert back.tag_right == "high"  # backward keeps the largest seq
        fwd = as_of_join(
            left, right, on="ts", by="k", value_cols=["tag"],
            direction="forward", seq_col="sq",
        ).collect()[0]
        assert fwd.tag_right == "low"  # forward keeps the smallest seq

    def test_single_shuffle_no_join_node(self, spark):
        trades, quotes = _trades_quotes(spark)
        plan = (
            as_of_join(trades, quotes, on="ts", by="sym", value_cols=["bid"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Join" not in plan  # union+window, not a join
        assert plan.count("Exchange hashpartitioning") == 1

    def test_bad_direction_raises(self, spark):
        trades, quotes = _trades_quotes(spark)
        with pytest.raises(ValueError):
            as_of_join(trades, quotes, direction="nearest")


class TestIntervalJoin:
    def test_half_open_containment(self, spark):
        points = spark.createDataFrame(
            [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 10, "d")],
            "user_id int, ts long, tag string",
        )
        iv = spark.createDataFrame(
            [(1, 0, 10, "w1"), (1, 10, 20, "w2")],
            "user_id int, start_ts long, end_ts long, win string",
        )
        rows = interval_join(points, iv).collect()
        got = {(r.tag, r.win) for r in rows}
        # boundary point ts=10: half-open → lands only in w2
        assert got == {("a", "w1"), ("b", "w2")}

    def test_left_keeps_unmatched(self, spark):
        points = spark.createDataFrame([(1, 99, "x")], "user_id int, ts long, tag string")
        iv = spark.createDataFrame(
            [(1, 0, 10, "w")], "user_id int, start_ts long, end_ts long, win string"
        )
        rows = interval_join(points, iv, how="left").collect()
        assert len(rows) == 1 and rows[0].win is None

    def test_hash_join_not_nested_loop(self, spark):
        points = spark.createDataFrame([(1, 5, "a")], "user_id int, ts long, tag string")
        iv = spark.createDataFrame(
            [(1, 0, 10, "w")], "user_id int, start_ts long, end_ts long, win string"
        )
        plan = (
            interval_join(points, iv)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan

class TestTemporalPlans:
    def test_decontaminate_broadcasts_benchmark(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import decontaminate

        docs = spark.createDataFrame(
            [(i, "a b c d e f g h " + str(i)) for i in range(50)],
            "doc_id long, text string",
        )
        bench = docs.limit(3)
        plan = (
            decontaminate(docs, bench, k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the shingle join (key shh) must broadcast the benchmark side —
        # a sort-merge there would shuffle the exploded corpus shingles;
        # the small per-doc hits re-join may plan however AQE likes
        assert "BroadcastHashJoin [shh" in plan
        assert "SortMergeJoin [shh" not in plan

    def test_interval_join_is_stream_capable(self, spark, tmp_path):
        """Stream-static enrichment: streaming points join static windows
        (the streaming shape of point-in-interval; as-of needs windows and
        stays batch)."""
        from qdrant_datafusion_spark.operators.temporal import interval_join

        pts = spark.createDataFrame(
            [(1, 5, "a"), (1, 15, "b"), (2, 5, "c")],
            "user_id int, ts long, tag string",
        )
        path = str(tmp_path / "pts")
        pts.coalesce(1).write.parquet(path)
        stream = spark.readStream.schema("user_id int, ts long, tag string").parquet(path)
        windows = spark.createDataFrame(
            [(1, 0, 10, "w1")], "user_id int, start_ts long, end_ts long, win string"
        )
        out = interval_join(stream, windows)
        q = (
            out.writeStream.format("memory").queryName("iv_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM iv_stream").collect()
        assert {(r.tag, r.win) for r in rows} == {("a", "w1")}


class TestIntervalJoinMultiKey:
    def test_composite_key_containment(self, spark):
        from qdrant_datafusion_spark.operators.temporal import interval_join

        points = spark.createDataFrame(
            [(1, "eu", 5, "a"), (1, "us", 5, "b")],
            "user_id int, region string, ts long, tag string",
        )
        iv = spark.createDataFrame(
            [(1, "eu", 0, 10, "w-eu")],
            "user_id int, region string, start_ts long, end_ts long, win string",
        )
        rows = interval_join(points, iv, by=["user_id", "region"]).collect()
        assert [(r.tag, r.win) for r in rows] == [("a", "w-eu")]


class TestFunnelStages:
    """funnel_stages — ordered conversion funnel."""

    @staticmethod
    def _events(spark, rows):
        return spark.createDataFrame(
            [(u, f"2024-01-0{d} 00:00:00", t) for u, d, t in rows],
            "user_id long, ts string, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def _run(self, spark, rows, stages=("a", "b", "c"), **kw):
        from qdrant_datafusion_spark.operators.temporal import funnel_stages

        out = funnel_stages(self._events(spark, rows), list(stages), **kw)
        return {r.stage: r.users for r in out.collect()}

    def test_strict_order_required(self, spark):
        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),   # full conversion
            (2, 2, "a"), (2, 1, "b"),                 # b BEFORE a: no stage 2
            (3, 1, "a"), (3, 1, "b"),                 # same ts: strict > fails
            (4, 1, "b"), (4, 2, "c"),                 # never entered stage 1
        ]
        got = self._run(spark, rows)
        assert got == {"a": 3, "b": 1, "c": 1}

    def test_earliest_qualifying_timestamp_carries(self, spark):
        # user 1 has a second later, the chain must use the EARLIEST a
        rows = [(1, 1, "a"), (1, 5, "a"), (1, 2, "b"), (1, 3, "c")]
        got = self._run(spark, rows)
        assert got == {"a": 1, "b": 1, "c": 1}

    def test_max_gap(self, spark):
        rows = [
            (1, 1, "a"), (1, 2, "b"),   # 1-day gap: within
            (2, 1, "a"), (2, 5, "b"),   # 4-day gap: outside 2 days
        ]
        got = self._run(
            spark, rows, stages=("a", "b"),
            max_gap=F.expr("INTERVAL 2 DAYS"),
        )
        assert got == {"a": 2, "b": 1}

    def test_empty_and_validation(self, spark):
        import pytest as _pytest

        got = self._run(spark, [(1, 1, "a")], stages=("a", "zzz"))
        assert got == {"a": 1, "zzz": 0}
        with _pytest.raises(ValueError):
            self._run(spark, [(1, 1, "a")], stages=())


class TestResampleInterpolate:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "k string, t long, v long, e long")
        from qdrant_datafusion_spark.operators.temporal import (
            resample_interpolate,
        )

        out = resample_interpolate(
            df, ts_col="t", by="k", value_col="v", seq_col="e", **kw
        )
        return sorted((r["k"], r["t"], r["v"]) for r in out.collect())

    def test_linear_interp_exact_at_observations(self, spark):
        rows = [("a", 10, 100, 1), ("a", 40, 400, 2)]
        got = self._run(spark, rows, step=10)
        # 20 -> 100 + 300*10 div 30 = 200 ; 30 -> 300
        assert got == [
            ("a", 10, 100), ("a", 20, 200), ("a", 30, 300), ("a", 40, 400),
        ]

    def test_truncating_division_and_descent(self, spark):
        rows = [("a", 10, 100, 1), ("a", 25, 500, 2), ("a", 40, 100, 3)]
        got = dict(
            ((k, t), v) for k, t, v in self._run(spark, rows, step=10)
        )
        # ascending: 100 + 400*10 div 15 = 366 (truncated)
        assert got[("a", 20)] == 366
        # descending: 500 + (-400*5) div 15 = 500 - 133 = 367 (toward zero)
        assert got[("a", 30)] == 367

    def test_duplicate_ts_latest_seq_wins(self, spark):
        rows = [("a", 10, 111, 5), ("a", 10, 999, 2), ("a", 20, 30, 7)]
        got = self._run(spark, rows, step=10)
        assert got[0] == ("a", 10, 111)  # seq 5 beats seq 2

    def test_short_span_keys_emit_nothing(self, spark):
        rows = [("b", 5, 50, 1), ("b", 6, 70, 2), ("c", 3, 10, 1)]
        assert self._run(spark, rows, step=10) == []

    def test_grid_is_step_aligned(self, spark):
        rows = [("a", 17, 10, 1), ("a", 53, 46, 2)]
        got = self._run(spark, rows, step=10)
        assert [t for _, t, _ in got] == [20, 30, 40, 50]

    def test_single_exchange_plan(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            resample_interpolate,
        )

        df = spark.createDataFrame(
            [("a", i * 7, i, i) for i in range(100)],
            "k string, t long, v long, e long",
        )
        out = resample_interpolate(
            df, ts_col="t", by="k", value_col="v", seq_col="e", step=10
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # obs arm + grid arm each hash-partition by k once; no global
        # sort, no cartesian, nothing driver-side
        assert plan.count("hashpartitioning") <= 3
        assert "Cartesian" not in plan and "rangepartitioning" not in plan

    def test_string_seq_tiebreak(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            resample_interpolate,
        )

        rows = [("a", 10, 111, "e5"), ("a", 10, 999, "e2"),
                ("a", 20, 30, "e7")]
        df = spark.createDataFrame(rows, "k string, t long, v long, e string")
        got = sorted(
            (r["k"], r["t"], r["v"])
            for r in resample_interpolate(
                df, ts_col="t", by="k", value_col="v", step=10, seq_col="e"
            ).collect()
        )
        # the tie column is ordered as-is (no cast): "e5" > "e2" wins
        assert got[0] == ("a", 10, 111)


class TestRobustAnomalies:
    """operators.temporal.robust_anomalies — per-key median/MAD flags."""

    def _py(self, vals, k_num=3, k_den=2):
        sv = sorted(vals)
        med = sv[(len(sv) + 1) // 2 - 1]  # lower median
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        return med, mad, {
            i for i, v in enumerate(vals) if abs(v - med) * k_den > mad * k_num
        }

    def test_matches_python_reference(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            robust_anomalies,
        )

        vals = [10, 12, 11, 13, 12, 100, 11, 12, -50, 12, 13]
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)],
            "k long, rid long, v long",
        )
        rows = robust_anomalies(df, "k", "v", "rid").collect()
        med, mad, flagged = self._py(vals)
        assert all(r["med"] == med and r["mad"] == mad for r in rows)
        assert {r["rid"] for r in rows if r["is_anomaly"]} == flagged

    def test_even_count_lower_median(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            robust_anomalies,
        )

        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate([1, 2, 3, 4])],
            "k long, rid long, v long",
        )
        r = robust_anomalies(df, "k", "v", "rid").collect()[0]
        assert r["med"] == 2  # lower median, not 2.5

    def test_mad_zero_flags_any_deviation(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            robust_anomalies,
        )

        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate([5, 5, 5, 5, 9])],
            "k long, rid long, v long",
        )
        rows = {r["rid"]: r["is_anomaly"] for r in robust_anomalies(
            df, "k", "v", "rid"
        ).collect()}
        assert rows == {0: False, 1: False, 2: False, 3: False, 4: True}

    def test_keys_independent(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            robust_anomalies,
        )

        df = spark.createDataFrame(
            [(1, 0, 10), (1, 1, 10), (1, 2, 10),
             (2, 3, 1000), (2, 4, 1000), (2, 5, 1000)],
            "k long, rid long, v long",
        )
        rows = robust_anomalies(df, "k", "v", "rid").collect()
        meds = {r["k"]: r["med"] for r in rows}
        assert meds == {1: 10, 2: 1000}
        assert not any(r["is_anomaly"] for r in rows)

    def test_single_exchange_plan(self, spark):
        from qdrant_datafusion_spark.operators.temporal import (
            robust_anomalies,
        )

        df = spark.createDataFrame(
            [(1, 0, 10), (1, 1, 12)], "k long, rid long, v long"
        )
        plan = (
            robust_anomalies(df, "k", "v", "rid")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
