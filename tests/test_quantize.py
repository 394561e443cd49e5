"""Quantization operators: scalar int8 codes, packed binary signs,
Hamming shortlist search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.quantize import (
    binary_quantize,
    binary_quantize_query,
    binary_search_topk,
    hamming_distance,
    quantization_error_stats,
    scalar_dequantize,
    scalar_quantize,
)


def _emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
    )


class TestScalarQuantize:
    def test_codes_in_range_and_endpoints(self, spark, sf_dir):
        q = scalar_quantize(_emb(spark, sf_dir).limit(50), "embedding")
        rows = q.select("codes").collect()
        for r in rows:
            assert min(r.codes) == 0  # the min element always codes to 0
            assert max(r.codes) == 255  # the max element always codes to 255
            assert all(0 <= c <= 255 for c in r.codes)

    def test_reconstruction_error_bounded(self, spark, sf_dir):
        stats = quantization_error_stats(
            _emb(spark, sf_dir), "embedding", "vec_id"
        ).collect()[0]
        assert stats.bound_ok  # max |x - x_hat| <= scale/2 for every vector
        assert stats.worst_err < 0.01

    def test_dequantize_roundtrip_values(self, spark):
        df = spark.createDataFrame([(1, [0.0, 1.0, 0.5])], "id int, v array<double>")
        q = scalar_quantize(df, "v")
        got = q.select(scalar_dequantize("codes", "q_lo", "q_scale").alias("r")).collect()[0].r
        assert got[0] == pytest.approx(0.0)
        assert got[1] == pytest.approx(1.0)
        assert got[2] == pytest.approx(0.5, abs=1 / 255 / 2 + 1e-9)


class TestBinaryQuantize:
    def test_known_bit_pattern(self, spark):
        # dims 0 and 2 positive -> bits 0 and 2 -> word 0b101 = 5
        df = spark.createDataFrame(
            [(1, [0.5, -0.1, 2.0, 0.0])], "id int, v array<double>"
        )
        assert binary_quantize(df, "v").select("bits").collect()[0].bits == [5]

    def test_multi_word_packing_matches_query_packer(self, spark):
        vec = [(1.0 if (i * 7) % 3 else -1.0) for i in range(100)]  # 2 words
        df = spark.createDataFrame([(1, vec)], "id int, v array<double>")
        words = binary_quantize(df, "v").select("bits").collect()[0].bits
        assert len(words) == 2
        assert words == binary_quantize_query(vec)

    def test_bit63_wraps_negative(self, spark):
        vec = [-1.0] * 63 + [1.0]  # only dim 63 positive
        df = spark.createDataFrame([(1, vec)], "id int, v array<double>")
        words = binary_quantize(df, "v").select("bits").collect()[0].bits
        assert words == [-(1 << 63)]
        assert words == binary_quantize_query(vec)

    def test_hamming_distance_matches_popcount(self, spark, sf_dir):
        import random

        rng = random.Random(9)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        qw = binary_quantize_query(qv)
        b = binary_quantize(_emb(spark, sf_dir).limit(20), "embedding")
        got = b.select(
            "vec_id", hamming_distance("bits", qw).alias("hd"), "bits"
        ).collect()
        for r in got:
            expected = bin((r.bits[0] ^ qw[0]) & ((1 << 64) - 1)).count("1")
            assert r.hd == expected


class TestBinarySearch:
    def test_full_shortlist_equals_exact_topk(self, spark, sf_dir):
        from qdrant_datafusion_spark.functions.distance import cosine_similarity

        import random

        rng = random.Random(11)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir)
        n = emb.count()
        approx = binary_search_topk(
            emb, "embedding", "vec_id", qv, k=5, shortlist=n
        ).collect()
        exact = (
            emb.select(
                "vec_id",
                F.round(cosine_similarity(F.col("embedding"), qv), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(5)
            .collect()
        )
        assert [(r.vec_id, r.score) for r in approx] == [
            (r.vec_id, r.score) for r in exact
        ]

    def test_small_shortlist_recalls_top1(self, spark, sf_dir):
        import random

        rng = random.Random(12)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir)
        got = binary_search_topk(emb, "embedding", "vec_id", qv, k=3, shortlist=64)
        rows = got.collect()
        assert len(rows) == 3
        assert rows[0].score >= rows[1].score >= rows[2].score
