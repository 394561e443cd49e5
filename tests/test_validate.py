"""operators.validate.validate_constraints — one-pass quality audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


class TestDiscoverFds:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "a", 10, None),
                (2, "a", 10, "x"),
                (3, "a", 11, "x"),
                (4, "b", 12, "y"),
                (5, "b", 12, None),
            ],
            "pk long, grp string, val long, tag string",
        )

    def test_holds_and_violations(self, spark):
        from qdrant_datafusion_spark.operators.validate import discover_fds

        out = {
            (r.determinant, r.dependent): r
            for r in discover_fds(
                self._df(spark),
                [("pk", "grp"), ("grp", "val"), ("val", "grp")],
            ).collect()
        }
        assert out[("pk", "grp")].holds and out[("pk", "grp")].n_violating == 0
        # grp 'a' has vals {10, 11} -> one violating group of two
        g = out[("grp", "val")]
        assert (g.n_groups, g.n_violating, g.holds) == (2, 1, False)
        assert out[("val", "grp")].holds  # 10->a, 11->a, 12->b

    def test_null_dependents_do_not_violate(self, spark):
        from qdrant_datafusion_spark.operators.validate import discover_fds

        # tag is NULL or a single non-NULL value per grp -> holds
        r = discover_fds(self._df(spark), [("grp", "tag")]).collect()[0]
        assert r.holds and r.n_violating == 0

    def test_shared_determinant_single_aggregation(self, spark):
        from qdrant_datafusion_spark.operators.validate import discover_fds

        df = self._df(spark)
        plan = (
            discover_fds(df, [("grp", "val"), ("grp", "tag")])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # both candidates fold into ONE scan of the input (expand for
        # the two distinct-counts is fine; a second Relation is not)
        assert plan.count("LogicalRDD") + plan.count("Relation") <= 1

    def test_empty_candidates_rejected(self, spark):
        from qdrant_datafusion_spark.operators.validate import discover_fds

        with pytest.raises(ValueError):
            discover_fds(self._df(spark), [])


class TestKAnonymity:
    def test_flags(self, spark):
        from qdrant_datafusion_spark.operators.validate import (
            k_anonymity_audit,
        )

        rows = [("us", "a", 1.0)] * 5 + [("us", "b", -1.0)] * 2 + [
            ("de", "a", 1.0),
            ("de", "a", -2.0),
            ("de", "a", 3.0),
        ]
        df = spark.createDataFrame(rows, "geo string, seg string, bal double")
        out = {
            (r.geo, r.seg): r
            for r in k_anonymity_audit(
                df.withColumn("neg", F.col("bal") < 0),
                ["geo", "seg"],
                "neg",
                k=3,
                l=2,
            ).collect()
        }
        assert out[("us", "a")].k_anonymous and not out[("us", "a")].l_diverse
        assert not out[("us", "b")].k_anonymous
        assert out[("de", "a")].k_anonymous and out[("de", "a")].l_diverse

    def test_requires_quasi_columns(self, spark):
        from qdrant_datafusion_spark.operators.validate import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError):
            k_anonymity_audit(df, [], "b")
