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


class TestProductQuantization:
    def _books(self):
        import random

        def vec(seed, d=16):
            rng = random.Random(seed)
            return [round(rng.uniform(-1, 1), 6) for _ in range(d)]

        return [[vec(500 + s * 4 + j) for j in range(4)] for s in range(4)]

    def test_train_is_deterministic_and_shaped(self, spark, sf_dir):
        from qdrant_datafusion_spark.operators.quantize import train_pq_codebooks

        emb = _emb(spark, sf_dir).limit(100)
        b1 = train_pq_codebooks(emb, "embedding", m=4, k=4, iterations=2,
                                id_col="vec_id")
        b2 = train_pq_codebooks(emb, "embedding", m=4, k=4, iterations=2,
                                id_col="vec_id")
        assert b1 == b2  # deterministic init + iteration
        assert len(b1) == 4 and len(b1[0]) == 4 and len(b1[0][0]) == 16

    def test_encode_matches_native_expression(self, spark, sf_dir):
        """The Arrow argmin encode agrees with the native-expression
        distance formula it documents as its reference."""
        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.quantize import (
            _sub_sq_dist,
            pq_encode,
        )

        books = self._books()
        emb = _emb(spark, sf_dir).limit(50)
        got = {
            r.vec_id: r.pq_codes
            for r in pq_encode(emb, "embedding", books).select(
                "vec_id", "pq_codes"
            ).collect()
        }
        v = F.col("embedding")
        native = []
        for s, book in enumerate(books):
            d = F.array(*[_sub_sq_dist(v, s, 16, c) for c in book])
            native.append(F.array_position(d, F.array_min(d)).cast("int"))
        want = {
            r.vec_id: r.codes
            for r in emb.select(
                "vec_id", F.array(*native).alias("codes")
            ).collect()
        }
        assert got == want

    def test_decode_roundtrips_centroids(self, spark):
        from qdrant_datafusion_spark.operators.quantize import (
            pq_decode,
            pq_encode,
        )

        books = self._books()
        # a vector equal to centroid j of each subspace decodes to itself
        target = books[0][2] + books[1][0] + books[2][3] + books[3][1]
        df = spark.createDataFrame([(1, target)], "id int, v array<double>")
        enc = pq_encode(df, "v", books)
        assert enc.select("pq_codes").collect()[0].pq_codes == [3, 1, 4, 2]
        rec = enc.select(pq_decode("pq_codes", books).alias("r")).collect()[0].r
        assert [round(x, 6) for x in rec] == [round(x, 6) for x in target]

    def test_adc_matches_decoded_distance(self, spark, sf_dir):
        """ADC score == squared distance from query to the DECODED vector
        (the defining PQ identity)."""
        import random

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.quantize import (
            pq_adc_score,
            pq_decode,
            pq_encode,
        )

        books = self._books()
        rng = random.Random(21)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir).limit(20)
        enc = pq_encode(emb, "embedding", books)
        rows = enc.select(
            pq_adc_score("pq_codes", qv, books).alias("adc"),
            pq_decode("pq_codes", books).alias("rec"),
        ).collect()
        for r in rows:
            direct = sum((a - b) ** 2 for a, b in zip(qv, r.rec))
            assert r.adc == pytest.approx(direct, rel=1e-9)

    def test_pq_search_full_rerank_equals_exact(self, spark, sf_dir):
        import random

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.functions.distance import cosine_similarity
        from qdrant_datafusion_spark.operators.quantize import pq_search_topk

        books = self._books()
        rng = random.Random(22)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir)
        n = emb.count()
        approx = pq_search_topk(
            emb, "embedding", "vec_id", qv, books, k=5, rerank=n
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


class TestIvfPq:
    def test_full_probe_full_rerank_equals_exact(self, spark, sf_dir):
        import random

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.functions.distance import cosine_similarity
        from qdrant_datafusion_spark.operators.quantize import ivfpq_search_topk

        def vec(seed, d):
            rng = random.Random(seed)
            return [round(rng.uniform(-1, 1), 6) for _ in range(d)]

        centroids = [vec(700 + i, 64) for i in range(4)]
        books = [[vec(720 + s * 4 + j, 16) for j in range(4)] for s in range(4)]
        rng = random.Random(31)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
        n = emb.count()
        got = ivfpq_search_topk(
            emb, "embedding", "id", qv, centroids, books,
            k=5, nprobe=len(centroids), rerank=n,
        ).collect()
        exact = (
            emb.select(
                "id",
                F.round(cosine_similarity(F.col("embedding"), qv), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(5)
            .collect()
        )
        assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in exact]

    def test_probe_restricts_to_probed_cells(self, spark, sf_dir):
        import random

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.ann import assign_ivf_cells
        from qdrant_datafusion_spark.operators.quantize import ivfpq_search_topk

        def vec(seed, d):
            rng = random.Random(seed)
            return [round(rng.uniform(-1, 1), 6) for _ in range(d)]

        centroids = [vec(700 + i, 64) for i in range(4)]
        books = [[vec(720 + s * 4 + j, 16) for j in range(4)] for s in range(4)]
        rng = random.Random(32)
        qv = [rng.uniform(-1, 1) for _ in range(64)]
        emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
        got = {
            r.id
            for r in ivfpq_search_topk(
                emb, "embedding", "id", qv, centroids, books, k=10, nprobe=1
            ).collect()
        }
        q = [float(x) for x in qv]
        best = max(
            range(len(centroids)),
            key=lambda i: sum(a * b for a, b in zip(q, centroids[i])),
        )
        cell_ids = {
            r.id
            for r in assign_ivf_cells(emb, "embedding", centroids)
            .filter(F.col("ivf_cell") == best)
            .collect()
        }
        assert got and got <= cell_ids  # results come only from the probed cell


class TestJLProjection:
    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.quantize import (
            jl_project,
            jl_sign_matrix,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
        rows = emb.select("vec_id", "embedding").collect()
        dim = len(rows[0].embedding)
        out = {
            r.vec_id: list(r.p)
            for r in emb.select(
                "vec_id", jl_project("embedding", dim, 8, seed="t").alias("p")
            ).collect()
        }
        S = np.array(jl_sign_matrix(dim, 8, seed="t"))
        for r in rows:
            want = (np.array(r.embedding, dtype=np.float64) @ S) / np.sqrt(8)
            assert np.allclose(out[r.vec_id], want, atol=1e-9)

    def test_sign_matrix_deterministic_and_balanced(self):
        from qdrant_datafusion_spark.operators.quantize import jl_sign_matrix

        a = jl_sign_matrix(32, 16, seed="x")
        assert a == jl_sign_matrix(32, 16, seed="x")
        assert a != jl_sign_matrix(32, 16, seed="y")
        flat = [x for row in a for x in row]
        assert set(flat) == {1.0, -1.0}
        # unbiased-ish: within 20% of half
        assert abs(sum(1 for x in flat if x > 0) - 256) < 51

    def test_preserves_neighbor_structure(self):
        # JL guarantee, sanity form: on CLUSTERED data (uniform random
        # vectors have concentrated distances, where correlation is
        # noise), projected distances track original distances
        import numpy as np

        from qdrant_datafusion_spark.operators.quantize import jl_sign_matrix

        rng = np.random.default_rng(0)
        centers = rng.normal(size=(5, 64)) * 4.0
        V = np.vstack([c + rng.normal(size=(12, 64)) * 0.5 for c in centers])
        S = np.array(jl_sign_matrix(64, 16, seed="t"))
        P = (V @ S) / np.sqrt(16)
        pairs = rng.integers(0, len(V), size=(300, 2))
        d0 = np.linalg.norm(V[pairs[:, 0]] - V[pairs[:, 1]], axis=1)
        d1 = np.linalg.norm(P[pairs[:, 0]] - P[pairs[:, 1]], axis=1)
        mask = d0 > 0
        assert np.corrcoef(d0[mask], d1[mask])[0, 1] > 0.9
