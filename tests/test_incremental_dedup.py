"""operators.dedup.minhash_incremental_dups — batch-vs-corpus dedup."""

from __future__ import annotations

import pytest

from qdrant_datafusion_spark.operators.dedup import (
    minhash_incremental_dups,
    minhash_lsh_dups,
)

DOCS = [
    # corpus (ids 1-5): two near-dup families + a singleton
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),
    (3, "completely different corpus text about spark shuffles here"),
    (4, "completely different corpus text about spark shuffles there"),
    (5, "a lonely singleton document unlike anything else at all"),
    # batch (ids 10, 20, 30): dup of family 1, dup of family 2, novel
    (10, "the quick brown fox jumps over the lazy dog today"),
    (20, "completely different corpus text about spark shuffles here"),
    (30, "novel batch content that matches nothing in the corpus ever"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestMinhashIncremental:
    def _pairs(self, df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()}

    def test_equals_full_restricted_to_batch(self, docs):
        corpus = docs.filter("doc_id < 10")
        batch = docs.filter("doc_id >= 10")
        incr = self._pairs(
            minhash_incremental_dups(
                corpus, batch, "text", "doc_id",
                threshold=0.2, max_bucket_size=None,
            )
        )
        full = self._pairs(
            minhash_lsh_dups(
                docs, "text", "doc_id", threshold=0.2, max_bucket_size=None
            )
        )
        expected = {p for p in full if p[0] >= 10 or p[1] >= 10}
        assert incr == expected
        # and the corpus-internal pairs really were excluded
        assert all(a >= 10 or b >= 10 for a, b in incr)
        assert incr  # non-trivial fixture: batch dups exist

    def test_batch_batch_pairs_included(self, spark):
        corpus = spark.createDataFrame(
            [(1, "unrelated corpus text goes here nothing matches it")],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [
                (10, "two identical batch documents share this text now"),
                (11, "two identical batch documents share this text now"),
            ],
            "doc_id long, text string",
        )
        got = self._pairs(
            minhash_incremental_dups(
                corpus, batch, "text", "doc_id",
                threshold=0.5, max_bucket_size=None,
            )
        )
        assert got == {(10, 11)}


class TestSortedNeighborhood:
    """dedup.sorted_neighborhood_pairs — rank-window blocking."""

    def _brute(self, rows, window):
        ranked = sorted(rows, key=lambda r: (r[1], r[0]))
        out = set()
        for i, (ida, _) in enumerate(ranked):
            for j in range(i + 1, min(i + window, len(ranked))):
                idb = ranked[j][0]
                out.add((min(ida, idb), max(ida, idb), j - i))
        return out

    def test_equals_bruteforce(self, spark):
        rows = [
            (5, "aaa"), (1, "aab"), (9, "aac"), (2, "bbb"),
            (7, "bbc"), (3, "bbd"), (8, "ccc"), (4, "ccd"),
            (6, "ccd"),  # tie on key: broken by id
        ]
        from qdrant_datafusion_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame(rows, "doc_id long, key string")
        got = {
            (r["id_a"], r["id_b"], r["rank_dist"])
            for r in sorted_neighborhood_pairs(
                df, "key", "doc_id", window=3
            ).collect()
        }
        assert got == self._brute(rows, 3)

    def test_candidate_bound(self, spark):
        from qdrant_datafusion_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        n, w = 200, 5
        df = spark.range(n).selectExpr(
            "id AS doc_id", "format_string('k%03d', CAST(id % 37 AS INT)) AS key"
        )
        cnt = sorted_neighborhood_pairs(df, "key", "doc_id", window=w).count()
        # exactly sum over i of min(w-1, n-1-i) pairs: (w-1)*N bound tight
        assert cnt == (w - 1) * n - (w - 1) * w // 2

    def test_verify_columns(self, spark):
        from qdrant_datafusion_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over"),
                (2, "the quick brown fox jumps over"),
                (3, "zz completely different text entirely here"),
            ],
            "doc_id long, text string",
        )
        import pyspark.sql.functions as F

        r = {
            (x["id_a"], x["id_b"]): x
            for x in sorted_neighborhood_pairs(
                df,
                F.substring("text", 1, 10),
                "doc_id",
                window=3,
                content_col="text",
            ).collect()
        }
        assert r[(1, 2)]["jaccard"] == 1.0
        assert r[(1, 2)]["inter"] == r[(1, 2)]["n_union"] > 0
