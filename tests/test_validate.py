"""operators.validate.validate_constraints — one-pass quality audit."""

from __future__ import annotations

import pytest

from qdrant_datafusion_spark.operators.validate import validate_constraints


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "ok"),
            (2, "B", -5.0, "ok"),       # range violation
            (2, "A", 20.0, None),       # dup id, null note
            (None, "Z", 30.0, "meh"),   # null id, bad status
            (4, "A", 1e9, "x" * 40),    # boundary hi: NOT a violation
        ],
        "id long, status string, v double, note string",
    )


def _audit(df, **kw):
    return {
        (r["check"], r["column"]): (r["n_violations"], r["passed"])
        for r in validate_constraints(df, **kw).collect()
    }


class TestValidateConstraints:
    def test_not_null(self, tbl):
        a = _audit(tbl, not_null=["id", "note", "status"])
        assert a[("not_null", "id")] == (1, False)
        assert a[("not_null", "note")] == (1, False)
        assert a[("not_null", "status")] == (0, True)

    def test_range_inclusive_and_null_exempt(self, tbl):
        a = _audit(tbl, ranges={"v": (0.0, 1e9)})
        assert a[("range", "v")] == (1, False)  # only -5; 1e9 inclusive

    def test_accepted_values_null_exempt(self, tbl):
        a = _audit(tbl, accepted={"status": ["A", "B"]})
        assert a[("accepted_values", "status")] == (1, False)  # 'Z'

    def test_pattern(self, tbl):
        a = _audit(tbl, patterns={"note": "^(ok|x+)$"})
        assert a[("pattern", "note")] == (1, False)  # 'meh'; NULL exempt

    def test_unique_ignores_null_keys(self, tbl):
        a = _audit(tbl, unique=["id"])
        # non-null ids: 1,2,2,4 -> 4 rows, 3 distinct -> 1 dup
        assert a[("unique", "id")] == (1, False)

    def test_unique_multi_column(self, tbl):
        a = _audit(tbl, unique=[["id", "status"]])
        # (1,A),(2,B),(2,A),(4,A) all distinct among non-null keys
        assert a[("unique", "id,status")] == (0, True)

    def test_referential(self, tbl, spark):
        ref = spark.createDataFrame([(1,), (2,)], "rid long")
        a = _audit(tbl, referential=[("id", ref, "rid")])
        # non-null probes 1,2,2,4 -> key 4 misses (counted once per row)
        assert a[("referential", "id")] == (1, False)

    def test_referential_only_call(self, tbl, spark):
        ref = spark.createDataFrame([(1,), (2,), (4,)], "rid long")
        a = _audit(tbl, referential=[("id", ref, "rid")])
        assert a[("referential", "id")] == (0, True)

    def test_n_rows_and_single_scan(self, tbl):
        df = validate_constraints(
            tbl,
            not_null=["id"],
            ranges={"v": (0.0, 1e9)},
            accepted={"status": ["A", "B", "Z"]},
            unique=["id"],
        )
        rows = df.collect()
        assert all(r["n_rows"] == 5 for r in rows)
        assert len(rows) == 4
        # all scalar checks compile into ONE aggregate over one scan:
        # no join, no window, exactly one source relation in the plan
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
