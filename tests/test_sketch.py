"""Unit tests for operators/sketch.py — count-min sketch + skew diagnostics.

The CMS invariants under test are the textbook ones: estimates never
underestimate, a sketch wide relative to the key set is exact, heavy-
hitter detection has no false negatives, and the sketch's size is
bounded by depth×width regardless of input rows.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.sketch import (
    cms_auto_width,
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_join_size,
    skew_hot_keys,
)


def _stream():
    """A skewed key stream: two heavy keys + a long uniform tail."""
    keys = ["hot1"] * 60 + ["hot2"] * 40
    for i in range(50):
        keys += [f"tail{i}"] * 2
    return keys, Counter(keys)


@pytest.fixture(scope="module")
def stream_df(spark):
    keys, _ = _stream()
    return spark.createDataFrame([(k,) for k in keys], "k string")


class TestCms:
    def test_sketch_size_bounded(self, stream_df):
        sk = cms_build(stream_df, "k", depth=3, width=8)
        assert sk.count() <= 3 * 8
        # every depth lane sums to the stream length
        lanes = sk.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
        assert len(lanes) == 3
        assert all(r["s"] == stream_df.count() for r in lanes)

    def test_never_underestimates(self, stream_df):
        _, exact = _stream()
        # width 8 ≪ 52 distinct keys: collisions guaranteed
        sk = cms_build(stream_df, "k", depth=3, width=8)
        est = cms_estimate(
            stream_df.select("k").distinct(), "k", sk, depth=3, width=8
        )
        for r in est.collect():
            assert r["est"] >= exact[r["k"]], r

    def test_wide_sketch_is_exact(self, stream_df):
        _, exact = _stream()
        sk = cms_build(stream_df, "k", depth=4, width=65536)
        est = cms_estimate(
            stream_df.select("k").distinct(), "k", sk, depth=4, width=65536
        )
        got = {r["k"]: r["est"] for r in est.collect()}
        assert got == dict(exact)

    def test_unseen_key_estimates_zero_on_wide_sketch(self, spark, stream_df):
        sk = cms_build(stream_df, "k", depth=4, width=65536)
        probe = spark.createDataFrame([("never-seen-key",)], "k string")
        est = cms_estimate(probe, "k", sk, depth=4, width=65536)
        assert est.collect()[0]["est"] == 0

    def test_heavy_hitters_no_false_negatives(self, stream_df):
        _, exact = _stream()
        n_keys = len(exact)
        total = sum(exact.values())
        true_hot = {
            k for k, c in exact.items() if c * n_keys * 1 > 2 * total
        }
        assert true_hot == {"hot1", "hot2"}  # fixture sanity
        # even with a collision-heavy sketch the true hot keys survive
        hh = cms_heavy_hitters(stream_df, "k", depth=3, width=8, num=2, den=1)
        got = {r["k"] for r in hh.collect()}
        assert true_hot <= got

    def test_heavy_hitters_exact_on_wide_sketch(self, stream_df):
        hh = cms_heavy_hitters(
            stream_df, "k", depth=4, width=65536, num=2, den=1
        )
        got = {(r["k"], r["est"]) for r in hh.collect()}
        assert got == {("hot1", 60), ("hot2", 40)}

    def test_null_keys_excluded(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
        sk = cms_build(df, "k", depth=2, width=16)
        assert sk.agg(F.sum("cnt")).collect()[0][0] == 2 * 2  # 2 rows × 2 depths


class TestCmsJoinSize:
    def test_never_underestimates_and_auto_width_is_tight(self, spark):
        a = spark.createDataFrame(
            [(f"k{i % 40}",) for i in range(400)], "k string"
        )
        b = spark.createDataFrame(
            [(f"k{i}",) for i in range(0, 80, 2)], "k string"
        )
        # exact: keys k0..k38 even appear 10x in a, once in b -> 20*10
        exact = 200
        # collision-heavy sketches still bound from above
        sa = cms_build(a, "k", depth=3, width=16)
        sb = cms_build(b, "k", depth=3, width=16)
        est = cms_join_size(sa, sb).collect()[0]["est_pairs"]
        assert est >= exact
        # auto-sized width: error bounded by the CMS guarantee
        # (expected extra mass per lane = |a|·|b|/width)
        w = cms_auto_width(40)
        sa = cms_build(a, "k", depth=4, width=w)
        sb = cms_build(b, "k", depth=4, width=w)
        est = cms_join_size(sa, sb).collect()[0]["est_pairs"]
        assert exact <= est <= exact + 3 * (400 * 40) // w
        # a width far above the key mass drives the noise to ~zero
        sa = cms_build(a, "k", depth=4, width=65536)
        sb = cms_build(b, "k", depth=4, width=65536)
        est = cms_join_size(sa, sb).collect()[0]["est_pairs"]
        assert est == exact

    def test_disjoint_keys_estimate_near_zero(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
        w = cms_auto_width(100)
        sa = cms_build(a, "k", depth=4, width=w)
        sb = cms_build(b, "k", depth=4, width=w)
        est = cms_join_size(sa, sb).collect()[0]["est_pairs"]
        assert est <= 5  # only hash-collision noise


class TestCmsAutoWidth:
    def test_power_of_two_and_load(self):
        assert cms_auto_width(40) == 256      # 40/0.25=160 -> 256
        assert cms_auto_width(1500) == 8192
        assert cms_auto_width(1) == 64        # floor
        assert cms_auto_width(150_000) == 1 << 20


class TestSkewHotKeys:
    def test_matches_python(self, stream_df):
        _, exact = _stream()
        n_keys, total = len(exact), sum(exact.values())
        want = {
            k: (c, c * n_keys * 1_000_000 // total)
            for k, c in exact.items()
            if c * n_keys * 10 > 12 * total
        }
        got = {
            r["k"]: (r["cnt"], r["ratio_micro"])
            for r in skew_hot_keys(stream_df, "k", num=12, den=10).collect()
        }
        assert got == want

    def test_uniform_stream_has_no_hot_keys(self, spark):
        df = spark.createDataFrame(
            [(f"k{i % 10}",) for i in range(100)], "k string"
        )
        assert skew_hot_keys(df, "k", num=12, den=10).count() == 0


class TestWeightedSample:
    """Priority sampling (pipeline.weighted_sample) — statistical and
    plan-shape invariants (kept here with the other round-9 sampling /
    diagnostics operators)."""

    def test_deterministic_and_weight_biased(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import weighted_sample

        rows = [(i, 1000 if i < 50 else 1) for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, w long")
        a = weighted_sample(df, "id", "w", k=60, seed=7).collect()
        b = weighted_sample(df, "id", "w", k=60, seed=7).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        heavy_in = sum(1 for r in a if r["id"] < 50)
        # 50 heavy rows carry ~95% of total weight; nearly all must place
        assert heavy_in >= 45
        # different seed -> different light-tail selection
        c = weighted_sample(df, "id", "w", k=60, seed=8).collect()
        assert {r["id"] for r in a} != {r["id"] for r in c}

    def test_plan_is_take_ordered(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import weighted_sample

        df = spark.createDataFrame([(i, i + 1) for i in range(100)], "id long, w long")
        plan = weighted_sample(df, "id", "w", k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan or "rangepartitioning" not in plan.lower()


class TestKmv:
    """KMV distinct sketch — estimator, saturation branch, mergeability,
    per-group bounds, set algebra, and the TakeOrderedAndProject plan."""

    def _ids(self, spark, n, prefix="u"):
        return spark.createDataFrame(
            [(f"{prefix}{i % n}",) for i in range(3 * n)], "k string"
        )

    def test_undersaturated_sketch_is_exact(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build,
            kmv_estimate,
        )

        df = self._ids(spark, 100)
        r = kmv_estimate(kmv_build(df, "k", k=256), 256).collect()[0]
        assert r["n_sketch"] == 100
        assert r["est_distinct"] == 100  # n < k branch: exact

    def test_saturated_estimate_within_bound(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build,
            kmv_estimate,
        )

        df = self._ids(spark, 2000)
        r = kmv_estimate(kmv_build(df, "k", k=128), 128).collect()[0]
        assert r["n_sketch"] == 128
        # 4/sqrt(128) ~ 35% generous bound; duplicates must not inflate
        assert abs(r["est_distinct"] - 2000) <= 700

    def test_merge_equals_build_over_union(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build,
            kmv_merge,
        )

        a = self._ids(spark, 300, "a")
        b = self._ids(spark, 300, "b")
        merged = {
            r["h"]
            for r in kmv_merge(
                kmv_build(a, "k", 64), kmv_build(b, "k", 64), 64
            ).collect()
        }
        direct = {
            r["h"] for r in kmv_build(a.union(b), "k", 64).collect()
        }
        assert merged == direct  # partial-aggregate mergeability

    def test_grouped_bounded_and_exact_small_groups(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build_grouped,
            kmv_estimate_grouped,
        )

        rows = [("g1", f"x{i % 10}") for i in range(50)]
        rows += [("g2", f"y{i % 500}") for i in range(900)]
        df = spark.createDataFrame(rows, "g string, k string")
        sk = kmv_build_grouped(df, "g", "k", k=64)
        per = {
            r["g"]: r
            for r in sk.groupBy("g").agg(F.count("*").alias("n")).collect()
        }
        assert per["g1"]["n"] == 10 and per["g2"]["n"] == 64  # k-bounded
        est = {
            r["g"]: r["est_distinct"]
            for r in kmv_estimate_grouped(sk, "g", 64).collect()
        }
        assert est["g1"] == 10  # undersaturated: exact
        assert abs(est["g2"] - 500) <= 250

    def test_set_estimates_identical_and_disjoint(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            kmv_build,
            kmv_set_estimates,
        )

        a = self._ids(spark, 200, "s")
        sa = kmv_build(a, "k", 64)
        same = kmv_set_estimates(sa, sa, 64).collect()[0]
        assert same["jaccard_micro"] == 1_000_000
        assert same["rho"] == same["n_merged"] == 64
        b = self._ids(spark, 200, "t")
        disj = kmv_set_estimates(sa, kmv_build(b, "k", 64), 64).collect()[0]
        assert disj["jaccard_micro"] == 0 and disj["rho"] == 0

    def test_null_keys_excluded(self, spark):
        from qdrant_datafusion_spark.operators.sketch import kmv_build

        df = spark.createDataFrame(
            [("a",), (None,), ("b",)], "k string"
        )
        assert kmv_build(df, "k", 16).count() == 2

    def test_plan_is_take_ordered(self, spark):
        from qdrant_datafusion_spark.operators.sketch import kmv_build

        df = self._ids(spark, 500)
        plan = (
            kmv_build(df, "k", 32)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestHistQuantiles:
    """Equi-width histogram sketch — bucket mapping/edge inverse
    exactness, the containment guarantee, mergeability, degenerate
    domains."""

    def test_bucket_edges_are_exact_inverse(self, spark):
        from qdrant_datafusion_spark.operators.sketch import hist_build

        df = spark.createDataFrame([(v,) for v in range(1000)], "c long")
        h = hist_build(df, "c", 7).collect()
        # every value maps into exactly one bucket; counts sum to n
        assert sum(r["cnt"] for r in h) == 1000
        B, lo, hi = 7, 0, 999
        W = hi - lo + 1
        for r in h:
            b_lo = lo + (r["b"] * W + B - 1) // B
            b_hi = lo + ((r["b"] + 1) * W + B - 1) // B - 1
            # count of range members == bucket count (edges are exact)
            assert r["cnt"] == b_hi - b_lo + 1

    def test_quantile_bucket_contains_true_rank(self, spark):
        import random

        from qdrant_datafusion_spark.operators.sketch import (
            hist_build,
            hist_quantiles,
        )

        random.seed(7)
        vals = [random.randrange(0, 10_000) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "c long")
        out = hist_quantiles(
            hist_build(df, "c", 64), 64, [250_000, 500_000, 750_000]
        ).collect()
        svals = sorted(vals)
        for r in out:
            true_v = svals[r["rank_r"] - 1]
            assert r["b_lo"] <= true_v <= r["b_hi"], r
            assert r["b_lo"] <= r["est"] <= r["b_hi"], r

    def test_counts_merge_with_shared_bounds(self, spark):
        from pyspark.sql import functions as F2

        from qdrant_datafusion_spark.operators.sketch import hist_build

        u = spark.createDataFrame([(v,) for v in range(1000)], "c long")
        direct = {
            r["b"]: r["cnt"] for r in hist_build(u, "c", 16).collect()
        }
        # a production merger sketches each shard against SHARED bounds,
        # then sums counts per bucket — emulate two shards with the same
        # explicit bucket mapping and verify the sum equals the one-shot
        lo, hi, B = 0, 999, 16
        shard = (
            u.withColumn("shard", (F2.col("c") % 2).cast("int"))
            .select(
                "shard",
                F2.expr(f"((c - {lo}) * {B}) div ({hi} - {lo} + 1)").alias("b"),
            )
            .groupBy("shard", "b")
            .agg(F2.count("*").alias("cnt"))
        )
        merged = {
            r["b"]: r["s"]
            for r in shard.groupBy("b")
            .agg(F2.sum("cnt").alias("s"))
            .collect()
        }
        assert merged == direct

    def test_degenerate_single_value(self, spark):
        from qdrant_datafusion_spark.operators.sketch import (
            hist_build,
            hist_quantiles,
        )

        df = spark.createDataFrame([(42,)] * 10, "c long")
        h = hist_build(df, "c", 8)
        rows = h.collect()
        assert len(rows) == 1 and rows[0]["cnt"] == 10
        q = hist_quantiles(h, 8, [500_000]).collect()[0]
        assert q["b_lo"] <= 42 <= q["b_hi"]
        assert q["est"] == 42
