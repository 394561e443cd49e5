"""End-to-end curation pipeline: clean → quality-cut → exact dedup →
near-dup keep-best → decontaminate → pack → split.

Every stage is an individually-gated operator; this test proves they
COMPOSE — schemas line up across stages, filters stay monotone, the
final artifact satisfies its invariants, and the whole chained flow is
bit-deterministic end-to-end (re-running it yields the identical
artifact, the property that makes a 100 TB pipeline resumable and
auditable).  It doubles as the library's executable usage example.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.text import clean_text, quality_score
from qdrant_datafusion_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_dups,
    select_canonical,
)
from qdrant_datafusion_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
    quality_percentile_filter,
)

BUDGET = 256


def run_pipeline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. clean: PII redaction + markup strip (text changes, ids stay)
    cleaned = docs.withColumn("text", clean_text("text"))

    # 2. per-source relative quality cut: drop each source's worst 20%
    q12 = (
        quality_score("text", stopwords=("the", "a")).cast("decimal(18,12)")
        * F.lit(10**12)
    ).cast("long")
    scored = cleaned.withColumn("q12", q12)
    quality_kept = quality_percentile_filter(
        scored, "q12", by="source", keep_frac=0.8
    )

    # 3. exact dedup: keep one row per distinct normalized content
    exact_ids = exact_dedup(quality_kept, "text", "doc_id").select("doc_id")
    exact_kept = quality_kept.join(exact_ids, "doc_id")

    # 4. near-dup keep-best: MinHash pairs → components → quality argmax
    pairs = minhash_lsh_dups(
        exact_kept, "text", "doc_id", k=3, num_hashes=32, bands=16, threshold=0.2
    )
    clusters = dup_clusters(pairs)
    canon = select_canonical(exact_kept, clusters, "doc_id", F.col("q12"))
    near_kept = exact_kept.join(
        canon.filter("kept").select(F.col("id").alias("doc_id")), "doc_id"
    )

    # 5. decontaminate against a deterministic pseudo-benchmark
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    decon = decontaminate(near_kept, benchmark, "text", "doc_id", k=5, min_hits=1)
    final = near_kept.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )

    # 6. pack into training sequences; 7. split train/val/test
    packed = pack_sequences(final, "doc_id", "text", budget=BUDGET, num_buckets=4)
    split = hash_split(final, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    return docs, quality_kept, exact_kept, near_kept, final, packed, split


class TestCurationPipeline:
    @pytest.fixture(scope="class")
    def flow(self, spark, sf_dir):
        return run_pipeline(spark, sf_dir)

    def test_stages_monotone_and_subset(self, flow):
        docs, quality_kept, exact_kept, near_kept, final, _, _ = flow
        counts = [df.count() for df in (docs, quality_kept, exact_kept, near_kept, final)]
        assert counts[0] >= counts[1] >= counts[2] >= counts[3] >= counts[4] > 0
        # every stage only FILTERS: ids remain a subset of the prior stage
        prev = None
        for df in (docs, quality_kept, exact_kept, near_kept, final):
            ids = {r.doc_id for r in df.select("doc_id").collect()}
            if prev is not None:
                assert ids <= prev
            prev = ids

    def test_near_dup_stage_really_dropped_a_duplicate(self, flow):
        _, _, exact_kept, near_kept, _, _, _ = flow
        # the sf fixture plants organic near-dup families that survive the
        # exact stage; keep-best must remove at least their non-canonical
        # members, or the stage is a no-op and the test is vacuous
        assert near_kept.count() < exact_kept.count()

    def test_pack_budget_invariant(self, flow):
        *_, packed, _ = flow
        rows = packed.collect()
        assert {r.doc_id for r in rows} == {
            r.doc_id for r in flow[4].select("doc_id").collect()
        }  # packing maps every final doc exactly once
        fills: dict[tuple, int] = {}
        for r in rows:
            fills[(r.bucket, r.pack_id)] = fills.get((r.bucket, r.pack_id), 0) + r.n_tokens
        over = {k: v for k, v in fills.items() if v > BUDGET}
        # a pack may exceed budget only when a single doc alone does
        singles = {
            (r.bucket, r.pack_id)
            for r in rows
            if r.n_tokens > BUDGET
        }
        assert set(over) <= singles, (over, singles)

    def test_split_partitions_the_final_set(self, flow):
        *_, split = flow
        n = split.count()
        by = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(by.values()) == n
        assert set(by) <= {"train", "val", "test"}
        assert by.get("train", 0) > 0.7 * n  # 90% weight, generous tolerance

    def test_pipeline_is_deterministic_end_to_end(self, spark, sf_dir, flow):
        import hashlib

        import pandas as pd

        def digest(df):
            pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
            for c in pdf.columns:
                if pdf[c].dtype == object:
                    pdf[c] = pdf[c].astype(str)
            pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
            return hashlib.md5(
                pd.util.hash_pandas_object(pdf, index=False).values.tobytes()
            ).hexdigest()

        *_, final1, packed1, split1 = run_pipeline(spark, sf_dir)
        assert digest(final1) == digest(flow[4])
        assert digest(packed1) == digest(flow[5])
        assert digest(split1.select("doc_id", "split")) == digest(
            flow[6].select("doc_id", "split")
        )
