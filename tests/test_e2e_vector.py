"""End-to-end VECTOR-INDEX lifecycle — the search-side sibling of
test_e2e_pipeline's curation chain:

    train IVF (deterministic k-means) → assign cells → write
    partitionBy(ivf_cell) → partition-pruned probe (recall vs exact) →
    scalar-quantized search (compressed-tier ranking quality) →
    PQ codebooks → IVF+PQ two-level search with exact rerank →
    hard-negative mining → MMR diversification of the final results.

Every stage is individually gated/unit-tested; this test proves they
COMPOSE — the trained index written to disk answers like the in-memory
one, compressed tiers preserve ranking quality, the exact-rerank tier
emits bit-identical scores to brute force on the ids they share, and
the whole chain is deterministic end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.ann import (
    assign_ivf_cells,
    hard_negatives,
    ivf_topk,
    knn_bruteforce,
    mmr_select,
    train_ivf_centroids,
)
from qdrant_datafusion_spark.operators.quantize import (
    ivfpq_search_topk,
    scalar_dequantize,
    scalar_quantize,
    train_pq_codebooks,
)

K = 10


class TestVectorIndexLifecycle:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    @pytest.fixture(scope="class")
    def query(self, emb):
        row = emb.orderBy("vec_id").select("embedding").first()
        return [float(x) for x in row[0]]

    @pytest.fixture(scope="class")
    def exact(self, emb, query):
        return [
            (r["vec_id"], r["score"])
            for r in knn_bruteforce(
                emb, "embedding", query, K, id_col="vec_id"
            ).collect()
        ]

    @pytest.fixture(scope="class")
    def centroids(self, emb):
        return train_ivf_centroids(
            emb, "embedding", k=8, iterations=3, id_col="vec_id"
        )

    @pytest.fixture(scope="class")
    def written(self, emb, centroids, tmp_path_factory, spark):
        path = str(tmp_path_factory.mktemp("ivf") / "table")
        assign_ivf_cells(emb, "embedding", centroids).write.partitionBy(
            "ivf_cell"
        ).parquet(path)
        return spark.read.parquet(path)

    def test_written_index_answers_like_memory(
        self, emb, centroids, written, query
    ):
        mem = ivf_topk(
            assign_ivf_cells(emb, "embedding", centroids),
            "embedding", query, centroids, K, nprobe=3, id_col="vec_id",
        ).collect()
        disk = ivf_topk(
            written, "embedding", query, centroids, K, nprobe=3,
            id_col="vec_id",
        ).collect()
        assert [tuple(r) for r in mem] == [tuple(r) for r in disk]

    def test_ivf_probe_recall_vs_exact(self, written, centroids, query, exact):
        got = {
            r["vec_id"]
            for r in ivf_topk(
                written, "embedding", query, centroids, K, nprobe=3,
                id_col="vec_id",
            ).collect()
        }
        truth = {i for i, _ in exact}
        assert len(got & truth) / K >= 0.5  # 3-of-8-cell probe floor
        # every probed score that overlaps exact is the SAME rounded score
        disk_scores = {
            r["vec_id"]: r["score"]
            for r in ivf_topk(
                written, "embedding", query, centroids, K, nprobe=3,
                id_col="vec_id",
            ).collect()
        }
        for i, s in exact:
            if i in disk_scores:
                assert disk_scores[i] == s

    def test_scalar_quantized_tier_preserves_ranking(self, emb, query, exact):
        from qdrant_datafusion_spark.functions.distance import (
            cosine_similarity,
        )

        q = scalar_quantize(emb, "embedding")
        approx = (
            q.select(
                "vec_id",
                F.round(
                    cosine_similarity(
                        scalar_dequantize("codes", "q_lo", "q_scale"), query
                    ),
                    6,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(K)
            .collect()
        )
        overlap = {r["vec_id"] for r in approx} & {i for i, _ in exact}
        assert len(overlap) / K >= 0.7  # int8 tier keeps most of top-10

    def test_ivfpq_rerank_scores_match_exact(
        self, emb, centroids, query, exact
    ):
        codebooks = train_pq_codebooks(
            emb, "embedding", m=8, k=16, iterations=2, id_col="vec_id"
        )
        got = ivfpq_search_topk(
            emb, "embedding", "vec_id", query, centroids, codebooks,
            k=5, nprobe=4, rerank=200,
        ).collect()
        assert len(got) == 5
        exact_scores = dict(exact)
        hits = [r for r in got if r["vec_id"] in exact_scores]
        assert len(hits) >= 3  # 4-of-8 probe + ADC-200 shortlist floor
        for r in hits:  # the rerank tier is EXACT (rounded-6 contract)
            assert r["score"] == round(exact_scores[r["vec_id"]], 6)

    def test_hard_negatives_complement_the_topk(self, emb, exact):
        negs = hard_negatives(
            emb, "embedding", "vec_id", k=3, lo=0.2, hi=0.9,
            overfetch_rank=20,
        )
        rows = negs.collect()
        assert rows and all(0.2 <= r["score"] < 0.9 for r in rows)
        per_anchor = {}
        for r in rows:
            per_anchor.setdefault(r["id"], []).append(r["neg_rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1))
                   for v in per_anchor.values())

    def test_mmr_first_pick_is_exact_top1(self, emb, query, exact):
        sel = mmr_select(
            emb, "embedding", "vec_id", query=query, k=8, lambda_pct=70
        )
        assert len(sel) == 8
        ranks = [t[0] for t in sel]
        ids = [t[1] for t in sel]
        assert ranks == list(range(1, 9))
        assert len(set(ids)) == 8
        # with nothing selected yet the MMR objective IS relevance:
        # first pick == the exact top-1 (rounded score, id tie-break)
        assert ids[0] == exact[0][0]
