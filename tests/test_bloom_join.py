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
