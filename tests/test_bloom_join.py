"""operators.joins.bloom_semi_join — runtime-filter semi/anti join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.joins import bloom_semi_join


@pytest.fixture(scope="module")
def fact(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


@pytest.fixture(scope="module")
def dim(spark):
    # 300 keys, some duplicated rows (distinct() inside must handle)
    base = spark.range(0, 300).select((F.col("id") * 13).alias("k"))
    return base.union(base.limit(50))


class TestBloomSemiJoin:
    def _expected(self, fact, dim, how):
        return {
            r["k"]
            for r in fact.join(
                dim.select("k").distinct(), "k", f"left_{how}"
            ).collect()
        }

    def test_semi_exact(self, fact, dim):
        got = {r["k"] for r in bloom_semi_join(fact, dim, "k").collect()}
        assert got == self._expected(fact, dim, "semi")

    def test_anti_exact(self, fact, dim):
        got = {
            r["k"]
            for r in bloom_semi_join(fact, dim, "k", how="anti").collect()
        }
        assert got == self._expected(fact, dim, "anti")

    def test_semi_anti_partition_fact(self, fact, dim):
        s = bloom_semi_join(fact, dim, "k").count()
        a = bloom_semi_join(fact, dim, "k", how="anti").count()
        assert s + a == fact.count()

    def test_tiny_filter_forces_fps_result_still_exact(self, fact, dim):
        """m_bits=64 saturates the bitmap — almost everything is a Bloom
        candidate — yet the exact-verify stage keeps the result exact."""
        got = {
            r["k"]
            for r in bloom_semi_join(
                fact, dim, "k", m_bits=64, num_hashes=2
            ).collect()
        }
        assert got == self._expected(fact, dim, "semi")
        got_a = {
            r["k"]
            for r in bloom_semi_join(
                fact, dim, "k", how="anti", m_bits=64, num_hashes=2
            ).collect()
        }
        assert got_a == self._expected(fact, dim, "anti")

    def test_multi_column_key(self, spark):
        fact = spark.createDataFrame(
            [(1, "a", 10), (1, "b", 11), (2, "a", 12), (2, "b", 13)],
            "x long, y string, p long",
        )
        dim = spark.createDataFrame(
            [(1, "a"), (2, "b")], "x long, y string"
        )
        got = {
            (r["x"], r["y"], r["p"])
            for r in bloom_semi_join(fact, dim, ["x", "y"]).collect()
        }
        assert got == {(1, "a", 10), (2, "b", 13)}

    def test_null_keys_never_match(self, spark):
        fact = spark.createDataFrame(
            [(None, 1), (5, 2)], "k long, p long"
        )
        dim = spark.createDataFrame([(5,), (None,)], "k long")
        semi = bloom_semi_join(fact, dim, "k").collect()
        assert [(r["k"], r["p"]) for r in semi] == [(5, 2)]
        anti = bloom_semi_join(fact, dim, "k", how="anti").collect()
        assert [(r["k"], r["p"]) for r in anti] == [(None, 1)]

    def test_empty_dim(self, fact, spark):
        dim = spark.createDataFrame([], "k long")
        assert bloom_semi_join(fact, dim, "k").count() == 0
        assert (
            bloom_semi_join(fact, dim, "k", how="anti").count()
            == fact.count()
        )

    def test_probe_stage_is_broadcast_only(self, fact, dim):
        """The fact side reaches the bit tests through BROADCAST joins
        only — no exchange of the fact before the Bloom prefilter (the
        whole point: the unmatched bulk never shuffles)."""
        plan = (
            bloom_semi_join(fact, dim, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastHashJoin") >= 3


class TestRangeBucketJoin:
    def test_matches_naive_between_join(self, spark):
        from qdrant_datafusion_spark.operators.joins import range_bucket_join

        fact = spark.createDataFrame(
            [(i, float(i * 7 % 100)) for i in range(200)], "rid long, v double"
        )
        dim = spark.createDataFrame(
            [("a", 0.0, 25.0), ("b", 20.0, 60.0), ("c", 55.0, 99.0),
             ("d", 98.0, 200.0), ("e", -50.0, -1.0)],
            "band string, lo double, hi double",
        )
        got = sorted(
            (r.rid, r.band)
            for r in range_bucket_join(fact, dim, "v", bucket_width=10.0)
            .collect()
        )
        naive = sorted(
            (r.rid, r.band)
            for r in fact.join(
                dim, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
            ).collect()
        )
        assert got == naive and len(got) > 200  # overlaps produce >1 match

    def test_boundaries_inclusive_and_default_width(self, spark):
        from qdrant_datafusion_spark.operators.joins import range_bucket_join

        fact = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 9.999), (4, 20.001)],
            "rid long, v double",
        )
        dim = spark.createDataFrame(
            [("in", 10.0, 20.0)], "band string, lo double, hi double"
        )
        got = sorted(
            r.rid for r in range_bucket_join(fact, dim, "v").collect()
        )
        assert got == [1, 2]

    def test_plan_is_hash_join_not_nested_loop(self, spark):
        from qdrant_datafusion_spark.operators.joins import range_bucket_join

        fact = spark.createDataFrame([(1, 5.0)], "rid long, v double")
        dim = spark.createDataFrame(
            [("x", 0.0, 10.0)], "band string, lo double, hi double"
        )
        naive = fact.join(
            dim, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        )
        naive_plan = naive._jdf.queryExecution().executedPlan().toString()
        # the problem being solved: Spark's only physical strategies for a
        # pure non-equi predicate are the quadratic pair-compare joins
        assert "NestedLoop" in naive_plan or "CartesianProduct" in naive_plan
        bucketed = range_bucket_join(fact, dim, "v", bucket_width=10.0)
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_bad_width_raises(self, spark):
        from qdrant_datafusion_spark.operators.joins import range_bucket_join

        fact = spark.createDataFrame([(1, 5.0)], "rid long, v double")
        dim = spark.createDataFrame(
            [("x", 3.0, 3.0)], "band string, lo double, hi double"
        )
        with pytest.raises(ValueError):
            range_bucket_join(fact, dim, "v", bucket_width=0.0)
        # zero-span dim => default width 0 => loud error, not div-by-zero
        with pytest.raises(ValueError):
            range_bucket_join(fact, dim, "v")
