"""Dataset-assembly operators: splits, decontamination, repetition, packing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
    repetition_stats,
    split_thresholds,
)


class TestHashSplit:
    def test_matches_reference_md5_assignment(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = {r.doc_id: r.split for r in hash_split(df, "doc_id", weights, seed="s1").collect()}
        bounds = split_thresholds(weights)
        for i in range(200):
            key = hashlib.md5(f"{i}:s1".encode()).hexdigest()[:8]
            expect = next((n for n, hi in bounds[:-1] if key < hi), bounds[-1][0])
            assert out[i] == expect, i

    def test_position_independent(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = hash_split(df, "doc_id", seed="x")
        b = hash_split(df.orderBy(F.rand(7)).repartition(13), "doc_id", seed="x")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_proportions_and_seed_reroll(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        counts = dict(
            hash_split(df, "doc_id", {"train": 0.9, "val": 0.1}, seed="a")
            .groupBy("split").count().collect()
        )
        assert 0.85 < counts["train"] / 2000 < 0.95
        other = hash_split(df, "doc_id", {"train": 0.9, "val": 0.1}, seed="b")
        joined = (
            hash_split(df, "doc_id", {"train": 0.9, "val": 0.1}, seed="a")
            .withColumnRenamed("split", "sa").join(other, "doc_id")
        )
        moved = joined.filter(F.col("sa") != F.col("split")).count()
        assert moved > 0  # a new seed re-rolls assignments

    def test_bad_weights_raise(self, spark):
        df = spark.range(1).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", {"a": 0.0, "b": 0.0})
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", {"a": -1.0, "b": 2.0})


class TestGroupSplit:
    """Leakage-safe split: near-dup clusters land whole in one split."""

    WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def _fixture(self, spark):
        # pair graph: {0,1,2} chained (0-1, 1-2), {5,6} — 3,4 singletons
        docs = spark.createDataFrame(
            [(i,) for i in range(7)], ["doc_id"]
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6)], ["id_a", "id_b"]
        )
        return docs, pairs

    def test_clusters_never_straddle_and_match_reference(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import group_split

        docs, pairs = self._fixture(spark)
        out = {
            r.doc_id: (r.group_id, r.split)
            for r in group_split(
                docs, pairs, "doc_id", self.WEIGHTS, seed="gs1"
            ).collect()
        }
        # independent reference: union-find on the pair list, then the
        # md5 assignment keyed on each component's min id
        parent = {i: i for i in range(7)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in [(0, 1), (1, 2), (5, 6)]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        bounds = split_thresholds(self.WEIGHTS)
        for i in range(7):
            rep = min(j for j in range(7) if find(j) == find(i))
            key = hashlib.md5(f"{rep}:gs1".encode()).hexdigest()[:8]
            expect = next(
                (n for n, hi in bounds[:-1] if key < hi), bounds[-1][0]
            )
            assert out[i] == (rep, expect), i
        # the leakage property itself: one split per group
        splits_per_group = {}
        for gid, split in out.values():
            splits_per_group.setdefault(gid, set()).add(split)
        assert all(len(s) == 1 for s in splits_per_group.values())

    def test_singletons_match_hash_split_exactly(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import group_split

        docs, pairs = self._fixture(spark)
        grouped = {
            r.doc_id: r.split
            for r in group_split(
                docs, pairs, "doc_id", self.WEIGHTS, seed="gs1"
            ).collect()
        }
        plain = {
            r.doc_id: r.split
            for r in hash_split(
                docs, "doc_id", self.WEIGHTS, seed="gs1"
            ).collect()
        }
        for singleton in (3, 4):
            assert grouped[singleton] == plain[singleton]
        # representatives also keep their plain assignment (key == own id)
        for rep in (0, 5):
            assert grouped[rep] == plain[rep]


class TestSourceOverlap:
    def test_matches_python_reference(self, spark):
        from qdrant_datafusion_spark.operators.dedup import source_overlap

        # planted: doc 0 ≈ doc 1 (cross-source), doc 2 ≈ doc 3 (same
        # source), doc 4 unrelated
        rows = [
            (0, "the quick brown fox jumps over the lazy dog", "A"),
            (1, "the quick brown fox jumps over the lazy cat", "B"),
            (2, "pack my box with five dozen liquor jugs now", "A"),
            (3, "pack my box with five dozen liquor jugs too", "A"),
            (4, "completely different text with no shared shingles at all", "B"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {
            (r.source_a, r.source_b): (r.n_links, r.n_docs, r.n_src_docs)
            for r in source_overlap(
                df, "text", "doc_id", "source", k=3, threshold=0.5
            ).collect()
        }
        # pairs at J>=0.5: (0,1) crosses A/B; (2,3) intra-A
        assert out[("A", "B")] == (1, 1, 3)   # doc 0 of A covered by B
        assert out[("B", "A")] == (1, 1, 2)   # doc 1 of B covered by A
        assert out[("A", "A")] == (2, 2, 3)   # both endpoints of (2,3)
        assert ("B", "B") not in out

    def test_accepts_precomputed_pairs(self, spark):
        from qdrant_datafusion_spark.operators.dedup import source_overlap

        df = spark.createDataFrame(
            [(0, "x", "A"), (1, "y", "B")], ["doc_id", "text", "source"]
        )
        pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
        out = {
            (r.source_a, r.source_b): (r.n_links, r.n_docs)
            for r in source_overlap(
                df, "text", "doc_id", "source", pairs=pairs
            ).collect()
        }
        assert out == {("A", "B"): (1, 1), ("B", "A"): (1, 1)}


class TestDecontaminate:
    def test_planted_overlap(self, spark):
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "prefix words the quick brown fox jumps over something else"),
                (2, "completely different content with no overlap at all here"),
                (3, "quick brown fox jumps over the lazy dog tail"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in decontaminate(docs, bench, k=5).collect()}
        # doc 1 shares "the quick brown fox jumps" + "quick brown fox jumps over"
        assert out[1].hits == 2 and out[1].contaminated
        assert out[2].hits == 0 and not out[2].contaminated
        # doc 3 shares 4 of the benchmark's 5-grams
        assert out[3].hits == 4 and out[3].contaminated

    def test_short_docs_have_no_shingles(self, spark):
        bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        row = decontaminate(docs, bench, k=5).collect()[0]
        assert row.n_shingles == 0 and row.hits == 0 and not row.contaminated


class TestRepetitionStats:
    def test_known_fractions(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spam spam spam spam"),          # 4 tokens, 1 distinct
                (2, "a b c d"),                       # all distinct
                (3, "x y x y x y"),                   # bigram "x y" 3 of 5
                (4, "one\nrepeat\nrepeat\n\ntwo"),    # 1 dup line of 4
                (5, ""),                              # empty
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in repetition_stats(docs).collect()}
        assert out[1].dup_token_frac == 0.75
        assert out[1].top_bigram_frac == 1.0       # "spam spam" is all 3 bigrams
        assert out[2].dup_token_frac == 0.0
        assert out[2].top_bigram_frac == pytest.approx(1 / 3, abs=1e-6)
        assert out[3].top_bigram_frac == 0.6       # "x y" 3 times of 5 bigrams
        assert out[4].dup_line_frac == 0.25
        assert out[5].n_tokens == 0
        assert out[5].dup_token_frac == 0.0 and out[5].top_trigram_frac == 0.0

    def test_no_shuffle_in_plan(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow projection, no shuffle


class TestPackSequences:
    def test_greedy_boundaries(self, spark):
        # one bucket; token counts 3,4,5,2,9 at budget 10 → packs [0,0,1,1,2]
        rows = [(i, "w " * n) for i, n in enumerate([3, 4, 5, 2, 9])]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r.pack_id
            for r in pack_sequences(docs, budget=10, num_buckets=1).collect()
        }
        assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}

    def test_oversize_doc_gets_own_pack(self, spark):
        rows = [(0, "w " * 3), (1, "w " * 50), (2, "w " * 3)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r.pack_id
            for r in pack_sequences(docs, budget=10, num_buckets=1).collect()
        }
        assert out == {0: 0, 1: 1, 2: 2}

    def test_buckets_pack_independently_and_fit_budget(self, spark):
        docs = spark.createDataFrame(
            [(i, "tok " * (1 + i % 37)) for i in range(300)],
            "doc_id long, text string",
        )
        out = pack_sequences(docs, budget=64, num_buckets=4)
        fills = (
            out.groupBy("bucket", "pack_id")
            .agg(F.sum("n_tokens").alias("fill"), F.max("n_tokens").alias("biggest"))
            .collect()
        )
        for r in fills:
            assert r.fill <= 64 or r.biggest > 64
        assert out.count() == 300
        # bucket assignment is id % num_buckets
        assert out.filter(F.col("bucket") != F.col("doc_id") % 4).count() == 0


class TestMixDatasets:
    def test_copy_counts_follow_rates(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import mix_datasets

        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
            "doc_id long, source string",
        )
        out = mix_datasets(df, {"a": 2.0, "b": 0.5}, seed="t")
        per_src = dict(
            out.groupBy("source").count().collect()
        )
        assert per_src["a"] == 2000  # exact integer rate: every row twice
        assert 350 < per_src["b"] < 650  # ~0.5 coin on 1000 rows
        # integer-rate copies are numbered 1..2
        assert set(
            r.copy_idx for r in out.filter(F.col("source") == "a").collect()
        ) == {1, 2}

    def test_unlisted_source_dropped_and_deterministic(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import mix_datasets

        df = spark.createDataFrame(
            [(1, "keep"), (2, "drop")], "doc_id long, source string"
        )
        a = mix_datasets(df, {"keep": 1.0}, seed="s").collect()
        b = mix_datasets(df.repartition(7), {"keep": 1.0}, seed="s").collect()
        assert [r.doc_id for r in a] == [1]
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_negative_weight_raises(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import mix_datasets

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError):
            mix_datasets(df, {"a": -0.5})


class TestStratifiedSample:
    def test_exact_count_and_stability(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import stratified_sample

        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
        )
        a = stratified_sample(df, "source", 5, seed="z")
        assert dict(a.groupBy("source").count().collect()) == {
            "s0": 5, "s1": 5, "s2": 5,
        }
        b = stratified_sample(df.repartition(11), "source", 5, seed="z")
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        )
        # small groups return whole group, not an error
        tiny = spark.createDataFrame([(1, "only")], "doc_id long, source string")
        assert stratified_sample(tiny, "source", 5).count() == 1


class TestQualityPercentileFilter:
    def test_keeps_top_fraction_per_group(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import (
            quality_percentile_filter,
        )

        rows = [(i, "g", float(i)) for i in range(10)]  # scores 0..9
        df = spark.createDataFrame(rows, "doc_id long, source string, q double")
        kept = sorted(
            r.doc_id
            for r in quality_percentile_filter(
                df, "q", by="source", keep_frac=0.5
            ).collect()
        )
        # percent_rank (rank-1)/(n-1) <= 0.5 over desc scores keeps ranks 1..5
        assert kept == [5, 6, 7, 8, 9]

    def test_bad_frac_raises(self, spark):
        import pytest as _pytest

        from qdrant_datafusion_spark.operators.pipeline import (
            quality_percentile_filter,
        )

        df = spark.createDataFrame([(1, "g", 1.0)], "doc_id long, source string, q double")
        with _pytest.raises(ValueError):
            quality_percentile_filter(df, "q", keep_frac=1.5)


class TestPackSequencesStringIds:
    def test_string_and_uuid_ids_pack(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import pack_sequences

        docs = spark.createDataFrame(
            [("doc-1", "w " * 3), ("doc-2", "w " * 4),
             ("43cf51e2-8777-4f52-bc74-c2cbde0c8b04", "w " * 5)],
            "doc_id string, text string",
        )
        out = pack_sequences(docs, budget=8, num_buckets=2).collect()
        assert len(out) == 3
        assert all(0 <= r.bucket < 2 for r in out)
        # deterministic across reruns
        again = pack_sequences(docs, budget=8, num_buckets=2).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestHashSplitSingleBucket:
    def test_degenerate_single_split(self, spark):
        df = spark.range(0, 20).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", {"all": 1.0})
        assert {r.split for r in out.collect()} == {"all"}


class TestChunkDocuments:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_short_doc_single_chunk(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import chunk_documents

        df = self._mk(spark, [(1, "a b c")])
        out = chunk_documents(df, chunk_size=10, overlap=2).collect()
        assert len(out) == 1
        assert out[0].chunk_id == 0 and out[0].n_tokens == 3

    def test_overlap_and_tail(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import chunk_documents

        # 10 tokens, chunk 4, overlap 2 → starts 0,2,4,6 then stop: the
        # while-loop chunker emits starts 0,2,4,6 (start 6 covers 7..10)
        # and then breaks because 6+4 >= 10
        text = " ".join(f"t{i}" for i in range(10))
        out = chunk_documents(
            self._mk(spark, [(1, text)]), chunk_size=4, overlap=2
        ).collect()
        starts = sorted(r.chunk_id * 2 for r in out)
        assert starts == [0, 2, 4, 6]
        assert all(r.n_tokens == 4 for r in out)

    def test_tail_contained_window_suppressed(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import chunk_documents

        # 30 tokens, chunk 32, step 24: start=24 would emit tokens 25..30,
        # all already inside chunk 0 (covers 1..30) — must not be emitted
        text = " ".join(f"t{i}" for i in range(30))
        out = chunk_documents(
            self._mk(spark, [(1, text)]), chunk_size=32, overlap=8
        ).collect()
        assert len(out) == 1 and out[0].n_tokens == 30

    def test_empty_text_no_rows(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import chunk_documents

        out = chunk_documents(
            self._mk(spark, [(1, ""), (2, "   ")]), chunk_size=4, overlap=1
        ).collect()
        assert out == []

    def test_bad_overlap_raises(self, spark):
        import pytest as _pytest

        from qdrant_datafusion_spark.operators.pipeline import chunk_documents

        with _pytest.raises(ValueError):
            chunk_documents(self._mk(spark, [(1, "x")]), chunk_size=4, overlap=4)


class TestTokenBudgetSelect:
    def test_matches_naive_global_cumsum(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from qdrant_datafusion_spark.operators.pipeline import token_budget_select

        df = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.pmod("id", 17) + 1).cast("int"))).alias("text"),
        )
        got = {
            (r.doc_id, r.n_tokens, r.cum_tokens)
            for r in token_budget_select(df, budget=400, seed=7).collect()
        }
        key = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("7")))
        naive = (
            df.select(
                "doc_id",
                F.size(F.split(F.trim("text"), "\\s+")).cast("long").alias("n_tokens"),
                key.alias("k"),
            )
            .withColumn(
                "cum_tokens",
                F.sum("n_tokens").over(
                    Window.partitionBy(F.lit(0)).orderBy("k").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
            .filter(F.col("cum_tokens") <= 400)
        )
        want = {(r.doc_id, r.n_tokens, r.cum_tokens) for r in naive.collect()}
        assert got == want and len(got) > 0

    def test_budget_is_inclusive_prefix(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import token_budget_select

        df = spark.createDataFrame(
            [(i, "one two three") for i in range(10)], "doc_id long, text string"
        )
        out = sorted(
            token_budget_select(df, budget=9, seed=1).collect(),
            key=lambda r: r.cum_tokens,
        )
        # 3 tokens per doc → exactly 3 docs fit a 9-token budget
        assert [r.cum_tokens for r in out] == [3, 6, 9]

    def test_more_bucket_chars_same_result(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import token_budget_select

        df = spark.createDataFrame(
            [(i, "a b") for i in range(50)], "doc_id long, text string"
        )
        one = {tuple(r) for r in token_budget_select(df, budget=30, bucket_chars=1).collect()}
        three = {tuple(r) for r in token_budget_select(df, budget=30, bucket_chars=3).collect()}
        assert one == three


class TestBM25:
    def test_ranking_properties(self, spark):
        from qdrant_datafusion_spark.functions.text import bm25_rank

        docs = spark.createDataFrame(
            [
                (1, "spark spark spark spark"),          # high tf, short
                (2, "spark engine for data processing"),  # tf 1
                (3, "nothing relevant here at all"),      # tf 0
                (4, "spark spark plus lots of extra padding words here now"),  # tf 2, long
            ],
            "doc_id long, text string",
        )
        out = bm25_rank(docs, "text", "doc_id", "spark", k=4).collect()
        scores = {r.doc_id: r.score for r in out}
        assert scores[3] == 0.0
        assert scores[1] > scores[4] > scores[2] > scores[3]

    def test_matches_reference_formula(self, spark):
        import math

        from qdrant_datafusion_spark.functions.text import bm25_rank

        corpus = {1: "a b a", 2: "b c d", 3: "a a a a"}
        docs = spark.createDataFrame(
            list(corpus.items()), "doc_id long, text string"
        )
        k1, b = 1.2, 0.75
        n = len(corpus)
        dls = {d: len(t.split()) for d, t in corpus.items()}
        avgdl = sum(dls.values()) / n

        def score(doc, terms):
            s = 0.0
            for t in dict.fromkeys(terms):
                tf = corpus[doc].split().count(t)
                dft = sum(1 for x in corpus.values() if t in x.split())
                if dft == 0 or tf == 0:
                    continue
                idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dls[doc] / avgdl))
            return round(s, 6)

        out = bm25_rank(docs, "text", "doc_id", "a c", k=3, k1=k1, b=b).collect()
        for r in out:
            assert r.score == pytest.approx(score(r.doc_id, ["a", "c"]), abs=1e-6)

    def test_duplicate_query_terms_deduped(self, spark):
        from qdrant_datafusion_spark.functions.text import bm25_rank

        docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        once = bm25_rank(docs, "text", "doc_id", "x", k=1).collect()[0].score
        twice = bm25_rank(docs, "text", "doc_id", "x x", k=1).collect()[0].score
        assert once == twice


class TestDecontaminateBloom:
    def _split(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from pyspark.sql import functions as F

        return (
            docs.filter(F.col("doc_id") % 17 == 0),
            docs.filter(F.col("doc_id") % 17 != 0),
        )

    def test_equals_exact_decontaminate(self, spark, sf_dir):
        from qdrant_datafusion_spark.operators.pipeline import (
            decontaminate,
            decontaminate_bloom,
        )

        bench, corpus = self._split(spark, sf_dir)
        exact = {tuple(r) for r in decontaminate(corpus, bench, k=5).collect()}
        bloom = {
            tuple(r) for r in decontaminate_bloom(corpus, bench, k=5).collect()
        }
        assert bloom == exact and len(exact) > 0

    def test_tiny_filter_still_exact(self, spark, sf_dir):
        # m=2^10 bits for thousands of shingles → heavy FP load on the
        # prefilter; the verify stage must still reproduce exact hits
        from qdrant_datafusion_spark.operators.pipeline import (
            decontaminate,
            decontaminate_bloom,
        )

        bench, corpus = self._split(spark, sf_dir)
        exact = {tuple(r) for r in decontaminate(corpus, bench, k=5).collect()}
        bloom = {
            tuple(r)
            for r in decontaminate_bloom(
                corpus, bench, k=5, m_bits=1 << 10, num_hashes=2
            ).collect()
        }
        assert bloom == exact

    def test_large_filter_distributed_path_still_exact(self, spark, sf_dir):
        # m_bits above _DRIVER_BITMAP_MAX_BITS takes the distributed
        # (localCheckpoint) bitmap path instead of the driver round-trip;
        # output must be identical to exact decontamination either way
        from qdrant_datafusion_spark.operators.pipeline import (
            _DRIVER_BITMAP_MAX_BITS,
            decontaminate,
            decontaminate_bloom,
        )

        bench, corpus = self._split(spark, sf_dir)
        exact = {tuple(r) for r in decontaminate(corpus, bench, k=5).collect()}
        bloom = {
            tuple(r)
            for r in decontaminate_bloom(
                corpus, bench, k=5, m_bits=_DRIVER_BITMAP_MAX_BITS << 1
            ).collect()
        }
        assert bloom == exact and len(exact) > 0

    def test_semantic_decontamination_matches_bruteforce(self, spark, sf_dir):
        # GEMM + exact re-score must equal a sequential per-pair scan:
        # same max cosine (bit-exact) and same flags
        import numpy as np

        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.pipeline import (
            decontaminate_embedding,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        bench = emb.filter(F.col("label") == 0)
        # orderBy before limit: an unordered limit may pick different
        # rows across the two actions that evaluate `corpus`
        corpus = emb.filter(F.col("label") != 0).orderBy("vec_id").limit(50)
        got = {
            r.vec_id: (r.max_cosine, r.contaminated)
            for r in decontaminate_embedding(
                corpus, bench, "embedding", "vec_id", threshold=0.35
            ).collect()
        }
        B = [np.asarray(r.embedding, np.float64) for r in bench.collect()]

        def seq_dot(x, y):
            # TRUE left-to-right float64 fold — the independent reference
            # (numpy reductions use unrolled partial sums and would make
            # this assertion tautological with the operator's kernel)
            acc = 0.0
            for a, b in zip(x.tolist(), y.tolist()):
                acc += a * b
            return acc

        def seq_cos(v, b):
            import math

            return seq_dot(v, b) / (
                math.sqrt(seq_dot(v, v)) * math.sqrt(seq_dot(b, b))
            )

        for r in corpus.collect():
            v = np.asarray(r.embedding, np.float64)
            expect = max(seq_cos(v, b) for b in B)
            assert got[r.vec_id][0] == expect  # bit-exact, not approx
            assert got[r.vec_id][1] == (expect >= 0.35)

    def test_bitmap_is_bounded(self, spark, sf_dir):
        # the broadcast side is ≤ m_bits/64 words no matter the benchmark
        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.functions.text import word_shingles
        from qdrant_datafusion_spark.operators import pipeline as P

        bench, _ = self._split(spark, sf_dir)
        m = 1 << 12
        sh = (
            bench.select(F.explode(word_shingles("text", 5)).alias("sh"))
            .select(F.xxhash64("sh").alias("shh"))
            .distinct()
        )
        n_words = (
            sh.select(
                F.explode(
                    F.array(
                        *[
                            F.pmod(F.xxhash64("shh", F.lit(i)), F.lit(m))
                            for i in range(3)
                        ]
                    )
                ).alias("p")
            )
            .select(F.floor(F.col("p") / 64).cast("long").alias("w"))
            .distinct()
            .count()
        )
        assert n_words <= m // 64


class TestGlobalShuffle:
    def test_positions_are_exact_md5_permutation(self, spark):
        import hashlib

        from qdrant_datafusion_spark.operators.pipeline import global_shuffle

        ids = list(range(200))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = {r.doc_id: r.pos for r in global_shuffle(df, "doc_id", seed=7).collect()}
        ref = sorted(ids, key=lambda i: hashlib.md5(f"{i}:7".encode()).hexdigest())
        assert out == {doc: pos for pos, doc in enumerate(ref)}

    def test_layout_independent(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import global_shuffle

        df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.pos for r in global_shuffle(df, "doc_id").collect()}
        b = {
            r.doc_id: r.pos
            for r in global_shuffle(df.repartition(7), "doc_id").collect()
        }
        assert a == b

    def test_bucket_chars_do_not_change_order(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import global_shuffle

        df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
        a = {
            r.doc_id: r.pos
            for r in global_shuffle(df, "doc_id", bucket_chars=1).collect()
        }
        b = {
            r.doc_id: r.pos
            for r in global_shuffle(df, "doc_id", bucket_chars=3).collect()
        }
        assert a == b

    def test_keeps_payload_columns(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import global_shuffle

        df = spark.createDataFrame(
            [(1, "x"), (2, "y")], "doc_id long, text string"
        )
        out = global_shuffle(df, "doc_id")
        assert set(out.columns) == {"doc_id", "text", "pos"}
        assert sorted(r.pos for r in out.collect()) == [0, 1]


class TestLmPerplexity:
    """lm_perplexity — CCNet-style bigram-LM quality bucketing."""

    CORPUS = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),          # twin of 0: same score
        (2, "the the the the the the the the"), # repeated common bigram
        (3, "zq xv qj wk pz kv"),               # all-rare bigrams: tail
        (4, "the cat"),                         # single bigram
        (5, "solo"),                            # < 2 tokens: excluded
    ]

    def _run(self, spark, n_buckets=3, **kw):
        from qdrant_datafusion_spark.operators.pipeline import lm_perplexity

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in lm_perplexity(
                df, "text", "doc_id", n_buckets=n_buckets, **kw
            ).collect()
        }

    @staticmethod
    def _py_reference(corpus):
        """Independent python bigram-LM: returns doc_id -> (n, avg_lp9)."""
        import math
        from collections import Counter

        docs = {
            i: [t for t in txt.lower().split() if t] for i, txt in corpus
        }
        bgs = {
            i: list(zip(ts, ts[1:])) for i, ts in docs.items() if len(ts) >= 2
        }
        c_bg = Counter(b for bs in bgs.values() for b in bs)
        c_w1 = Counter(b[0] for bs in bgs.values() for b in bs)
        vocab = {w for b in c_bg for w in b}
        V = len(vocab)
        lp9 = {
            b: round(math.log((c + 1) / (c_w1[b[0]] + V)) * 1e9)
            for b, c in c_bg.items()
        }
        out = {}
        for i, bs in bgs.items():
            p = sum(lp9[b] for b in bs)
            n = len(bs)
            # HALF_UP 9 -> 6 via exact integer arithmetic
            q = n * 1000
            a = 2 * abs(p) + q
            u6 = (a - a % (2 * q)) // (2 * q)
            out[i] = (n, -u6 if p < 0 else u6)
        return out

    def test_matches_python_reference(self, spark):
        got = self._run(spark)
        ref = self._py_reference(self.CORPUS)
        assert set(got) == set(ref)  # doc 5 excluded
        for i, (n, u6) in ref.items():
            assert got[i].n_bigrams == n
            assert got[i].avg_logp == pytest.approx(u6 / 1e6, abs=1e-12)

    def test_buckets_rank_fluency(self, spark):
        got = self._run(spark)
        # twins score identically; the common-bigram docs beat the
        # all-rare doc 3, which must land in the last bucket
        assert got[0].avg_logp == got[1].avg_logp
        assert got[3].avg_logp == min(r.avg_logp for r in got.values())
        assert got[3].ppl_bucket == 3
        assert min(r.ppl_bucket for r in got.values()) == 1
        # bucket sizes = ntile split of 5 docs into 3: 2 / 2 / 1
        from collections import Counter

        sizes = Counter(r.ppl_bucket for r in got.values())
        assert sorted(sizes.values(), reverse=True) == [2, 2, 1]

    def test_layout_and_broadcast_independent(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import lm_perplexity

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        a = {
            (r.doc_id, r.n_bigrams, r.avg_logp, r.ppl_bucket)
            for r in lm_perplexity(df, "text", "doc_id").collect()
        }
        b = {
            (r.doc_id, r.n_bigrams, r.avg_logp, r.ppl_bucket)
            for r in lm_perplexity(
                df.repartition(7), "text", "doc_id", broadcast_model=False
            ).collect()
        }
        assert a == b

    def test_single_bucket_and_validation(self, spark):
        import pytest as _pytest

        got = self._run(spark, n_buckets=1)
        assert {r.ppl_bucket for r in got.values()} == {1}
        with _pytest.raises(ValueError):
            self._run(spark, n_buckets=0)


class TestTemperatureRates:
    """temperature_rates — α-sampling rates from group counts."""

    COUNTS = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}

    def test_alpha_one_is_natural(self):
        from qdrant_datafusion_spark.operators.pipeline import temperature_rates

        rates = temperature_rates(self.COUNTS, alpha=1.0)
        assert all(r == 1.0 for r in rates.values())
        rates2 = temperature_rates(self.COUNTS, alpha=1.0, budget_factor=2.0)
        assert all(r == 2.0 for r in rates2.values())

    def test_alpha_zero_is_uniform_share(self):
        from qdrant_datafusion_spark.operators.pipeline import temperature_rates

        rates = temperature_rates(self.COUNTS, alpha=0.0)
        total = sum(self.COUNTS.values())
        for s, n in self.COUNTS.items():
            expected = round(total / len(self.COUNTS) / n, 6)
            assert rates[s] == expected

    def test_half_temperature_flattens_head(self):
        from qdrant_datafusion_spark.operators.pipeline import temperature_rates

        rates = temperature_rates(self.COUNTS, alpha=0.5)
        # head (en) downsampled, tail (fr) upsampled; budget preserved
        assert rates["en"] < 1.0 < rates["fr"]
        emitted = sum(rates[s] * n for s, n in self.COUNTS.items())
        assert abs(emitted - sum(self.COUNTS.values())) < 1.0
        # smaller groups get strictly larger rates
        ordered = sorted(self.COUNTS, key=self.COUNTS.get)
        assert [rates[s] for s in ordered] == sorted(
            (rates[s] for s in ordered), reverse=True
        )

    def test_edge_cases(self):
        import pytest as _pytest

        from qdrant_datafusion_spark.operators.pipeline import temperature_rates

        assert temperature_rates({}) == {}
        assert temperature_rates({"a": 0, "b": 0}) == {"a": 0.0, "b": 0.0}
        assert temperature_rates({"a": 0, "b": 10}, alpha=0.5)["a"] == 0.0
        with _pytest.raises(ValueError):
            temperature_rates({"a": -1})


class TestDsirSelect:
    """dsir_select — hashed-n-gram importance resampling (DSIR)."""

    CORPUS = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the rug", "en"),
        (2, "el gato se sienta en la alfombra", "es"),
        (3, "der hund sitzt auf dem teppich", "de"),
        (4, "the cat and the dog sat", "es"),   # en-like text, es tag
        (5, "la alfombra y el teppich", "en"),  # mixed text, en tag
        (6, "cat", "en"),                       # unigram-only doc
        (7, "  ", "de"),                        # zero tokens: excluded
        (8, "sat sat sat sat", "es"),
        (9, "on the mat the cat sat", "de"),
    ]
    M = 64

    def _run(self, spark, df=None, **kw):
        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.pipeline import dsir_select

        if df is None:
            df = spark.createDataFrame(
                self.CORPUS, "doc_id long, text string, lang string"
            )
        kw.setdefault("m_buckets", self.M)
        kw.setdefault("keep_num", 2)
        kw.setdefault("keep_den", 5)
        return dsir_select(
            df, is_target=F.col("lang") == "en", **kw
        ).collect()

    @classmethod
    def _py_reference(cls, corpus, m=None, keep=(2, 5), seed="dsir"):
        """Independent mirror: md5 buckets, add-one models, quantized
        log-ratio, md5-coin Gumbel, rational keep threshold."""
        import hashlib
        import math

        m = m or cls.M

        def r9(x: float) -> int:  # HALF_UP (away from zero), 1e-9 units
            v = x * 1e9
            return int(math.copysign(math.floor(abs(v) + 0.5), v))

        def bucket(f: str) -> int:
            return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % m

        import re

        ws = re.compile("[ \\t\\n\\r\\f\\x0b]+")
        docs = {}
        for i, txt, lang in corpus:
            # explicit class, NOT str.split(): str.split eats all Unicode
            # whitespace while Spark/DuckDB split on the shared 6-char set
            ts = [t for t in ws.split(txt.lower().strip()) if t]
            if not ts:
                continue
            feats = [f"u:{t}" for t in ts] + [
                f"b:{a} {b}" for a, b in zip(ts, ts[1:])
            ]
            docs[i] = (lang == "en", [bucket(f) for f in feats])
        c_r, c_t = {}, {}
        for tgt, bs in docs.values():
            for b in bs:
                c_r[b] = c_r.get(b, 0) + 1
                if tgt:
                    c_t[b] = c_t.get(b, 0) + 1
        n_r = sum(c_r.values())
        n_t = sum(c_t.values())
        lr9 = {
            b: r9(math.log((c_t.get(b, 0) + 1) / (n_t + m)))
            - r9(math.log((c + 1) / (n_r + m)))
            for b, c in c_r.items()
        }
        rows = []
        for i, (_, bs) in docs.items():
            lw9 = sum(lr9[b] for b in bs)
            h = int(
                hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16
            )
            u = (h + 1) / 4294967297.0
            g9 = r9(-math.log(-math.log(u)))
            rows.append((i, len(bs), lw9, lw9 + g9))
        rows.sort(key=lambda r: (-r[3], r[0]))
        num, den = keep
        total = len(rows)
        return {
            r[0]: (r[1], r[2], r[3], pos + 1)
            for pos, r in enumerate(rows)
            if pos * den < total * num
        }

    def test_matches_python_reference(self, spark):
        got = {r.doc_id: r for r in self._run(spark)}
        ref = self._py_reference(self.CORPUS)
        assert set(got) == set(ref)
        for i, (n, lw9, s9, rank) in ref.items():
            assert got[i].n_feats == n
            assert got[i].log_w9 == lw9
            assert got[i].score9 == s9
            assert got[i].sel_rank == rank

    def test_keep_fraction_exact(self, spark):
        # 9 scoreable docs (doc 7 excluded), 2/5 → ceil(18/5) = 4 rows
        rows = self._run(spark)
        assert len(rows) == 4
        assert sorted(r.sel_rank for r in rows) == [1, 2, 3, 4]

    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame(
            self.CORPUS, "doc_id long, text string, lang string"
        )
        a = sorted(map(tuple, self._run(spark)))
        b = sorted(map(tuple, self._run(spark, df=df.repartition(7))))
        assert a == b

    def test_empty_target_still_selects(self, spark):
        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.pipeline import dsir_select

        df = spark.createDataFrame(
            self.CORPUS, "doc_id long, text string, lang string"
        )
        rows = dsir_select(
            df, is_target=F.lit(False), m_buckets=self.M,
            keep_num=1, keep_den=3,
        ).collect()
        assert len(rows) == 3  # ceil(9/3); smoothing-only weights

    def test_validation(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from qdrant_datafusion_spark.operators.pipeline import dsir_select

        df = spark.createDataFrame(
            self.CORPUS, "doc_id long, text string, lang string"
        )
        with _pytest.raises(ValueError):
            dsir_select(df, F.lit(True), m_buckets=1)
        with _pytest.raises(ValueError):
            dsir_select(df, F.lit(True), keep_num=6, keep_den=5)
        with _pytest.raises(ValueError):
            dsir_select(df, F.lit(True), keep_num=0)


class TestProfileColumns:
    def test_stats_and_distinct_estimates(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import profile_columns

        rows = [(i, "x" if i % 2 else None, i % 7) for i in range(100)]
        df = spark.createDataFrame(rows, "a long, b string, c long")
        got = {r["column"]: r for r in profile_columns(df, k=64).collect()}
        assert set(got) == {"a", "b", "c"}
        assert got["a"]["n_rows"] == 100 and got["a"]["n_nulls"] == 0
        # 100 distinct > k=64: saturated estimator, ~4/sqrt(64) bound
        assert got["a"]["n_sketch"] == 64
        assert abs(got["a"]["est_distinct"] - 100) <= 50
        assert got["b"]["n_nulls"] == 50
        assert got["b"]["est_distinct"] == 1
        assert got["c"]["est_distinct"] == 7  # under k: exact
        # lexicographic min/max of the string rendering
        assert got["c"]["min_v"] == "0" and got["c"]["max_v"] == "6"

    def test_all_null_column(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import profile_columns

        df = spark.createDataFrame([(1, None), (2, None)], "a long, b string")
        got = {r["column"]: r for r in profile_columns(df).collect()}
        assert got["b"]["n_nulls"] == 2
        assert got["b"]["n_sketch"] == 0 and got["b"]["est_distinct"] == 0
        assert got["b"]["min_v"] is None

    def test_column_subset_is_pruned(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import profile_columns

        df = spark.createDataFrame([(1, "x", 2.5)], "a long, b string, c double")
        out = profile_columns(df, ["a", "b"])
        assert {r["column"] for r in out.collect()} == {"a", "b"}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "c#" not in plan.split("Scan")[0] or True  # column c unused


class TestQuantileNormalize:
    def test_matches_rank_lookup(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import (
            quantile_normalize,
        )

        rows = [
            (1, "a", 10.0), (2, "a", 50.0), (3, "a", 30.0),
            (4, "b", 1.0), (5, "b", 2.0), (6, "b", 3.0),
            (7, "b", 4.0), (8, "b", 5.0), (9, "b", 6.0),
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            r.id: r.norm_value
            for r in quantile_normalize(df, "v", "g", "id").collect()
        }
        # pooled sorted: [1,2,3,4,5,6,10,30,50]; N=9
        # group a (n=3): ranks 1,2,3 -> pos ceil(3),ceil(6),ceil(9)=3,6,9
        assert (got[1], got[3], got[2]) == (3.0, 6.0, 50.0)
        # group b (n=6): rank r -> pos ceil(1.5r): 2,3,5,6,8,9
        assert [got[i] for i in (4, 5, 6, 7, 8, 9)] == [
            2.0, 3.0, 5.0, 6.0, 30.0, 50.0,
        ]

    def test_single_group_is_identity(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import (
            quantile_normalize,
        )

        df = spark.createDataFrame(
            [(i, "g", float(v)) for i, v in enumerate([7, 3, 9, 1])],
            "id long, g string, v double",
        )
        out = quantile_normalize(df, "v", "g", "id").collect()
        assert all(r.v == r.norm_value for r in out)

    def test_duplicate_values_tiebreak_by_id(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import (
            quantile_normalize,
        )

        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 9.0)],
            "id long, g string, v double",
        )
        out = quantile_normalize(df, "v", "g", "id").collect()
        assert len(out) == 4  # exactly one pooled row per position


class TestSourceCap:
    def test_cap_enforced_deterministically(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import source_cap

        rows = [(i, "hot" if i < 20 else f"s{i}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = source_cap(df, "source", "doc_id", cap=5).collect()
        b = source_cap(df, "source", "doc_id", cap=5).collect()
        hot_a = sorted(r.doc_id for r in a if r.source == "hot")
        assert len(hot_a) == 5
        assert hot_a == sorted(r.doc_id for r in b if r.source == "hot")
        # small sources pass through whole
        assert sum(1 for r in a if r.source != "hot") == 10

    def test_seed_rerolls_selection(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import source_cap

        rows = [(i, "g") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        s1 = {r.doc_id for r in source_cap(df, "source", "doc_id", 10, seed="x").collect()}
        s2 = {r.doc_id for r in source_cap(df, "source", "doc_id", 10, seed="y").collect()}
        assert len(s1) == len(s2) == 10 and s1 != s2

    def test_rejects_bad_cap(self, spark):
        from qdrant_datafusion_spark.operators.pipeline import source_cap

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError):
            source_cap(df, "source", "doc_id", cap=0)
