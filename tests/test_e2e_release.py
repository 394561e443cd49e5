"""End-to-end RELEASE-AUDIT cycle — the composed flow the session-5
operators exist for:

    fuzzy ER (edit-distance + exact-Jaccard agree on true near-dups) →
    cap hot sources → quantile-align per-source scores →
    discover contracts (FDs) → enforce them → k-anonymity release gate →
    plan the compacted write

Each stage's output feeds the next; the invariants asserted are the
cross-operator ones unit tests can't see (the two similarity joins
agree where their semantics overlap, normalization preserves in-group
order, discovered FDs validate cleanly, the compaction plan partitions
the manifest).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.fuzzy import (
    containment_pairs,
    edit_distance_pairs,
    set_similarity_pairs,
)
from qdrant_datafusion_spark.operators.layout import compaction_plan
from qdrant_datafusion_spark.operators.pipeline import (
    quantile_normalize,
    source_cap,
)
from qdrant_datafusion_spark.operators.validate import (
    discover_fds,
    k_anonymity_audit,
    validate_constraints,
)

# a tiny corpus with two exact-duplicate families, one typo family, and
# singletons; sources deliberately skewed (src_hot has 6 of 12 docs)
DOCS = [
    # (doc_id, source, score, text)
    (1, "src_hot", 0.9, "the quick brown fox jumps over the lazy dog"),
    (2, "src_hot", 0.8, "the quick brown fox jumps over the lazy dog"),
    (3, "src_hot", 0.7, "the quick brown fox jumps over the lazy d0g"),
    (4, "src_hot", 0.6, "completely unrelated text about spark plans"),
    (5, "src_hot", 0.5, "another unrelated document with its own words"),
    (6, "src_hot", 0.4, "shuffle partitions and broadcast joins explained"),
    (7, "src_a", 0.95, "watermarks bound state in streaming joins"),
    (8, "src_a", 0.15, "catalyst rewrites predicates before the scan"),
    (9, "src_a", 0.55, "the quick brown fox jumps over the lazy dog"),
    (10, "src_b", 0.33, "tungsten generates code for whole stages"),
    (11, "src_b", 0.66, "adaptive execution re-plans at runtime"),
    (12, "src_b", 0.99, "exchange reuse deduplicates shuffle stages"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, score double, text string"
    )


class TestReleaseCycle:
    def test_fuzzy_and_jaccard_tiers_agree_on_true_dups(self, spark, docs):
        # stage 1a: edit-distance pairs on the raw text key
        fuzzy = {
            (r.id_a, r.id_b)
            for r in edit_distance_pairs(
                docs, F.col("text"), "doc_id", max_dist=2
            ).collect()
        }
        # the two exact-dup + typo families, nothing else
        assert fuzzy == {(1, 2), (1, 3), (2, 3), (1, 9), (2, 9), (3, 9)}

        # stage 1b: exact-Jaccard word sets at t=4/5 — must find every
        # EXACT duplicate fuzzy found (identical word sets), and the
        # typo doc iff its set overlap clears the threshold
        jac = {
            (r.id_a, r.id_b)
            for r in set_similarity_pairs(
                docs.select("doc_id", F.split("text", " ").alias("w")),
                "w",
                "doc_id",
                t_num=4,
                t_den=5,
            ).collect()
        }
        exact_dups = {(1, 2), (1, 9), (2, 9)}
        assert exact_dups <= jac
        assert jac <= fuzzy  # word-set agreement implies low edit distance here

        # stage 1c: the containment tier must hold BOTH directions for
        # every exact duplicate (equal sets contain each other), and
        # every Jaccard pair implies both containments at this t
        cont = {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                docs.select("doc_id", F.split("text", " ").alias("w")),
                "w",
                "doc_id",
                t_num=4,
                t_den=5,
            ).collect()
        }
        for a, b in exact_dups:
            assert (a, b) in cont and (b, a) in cont

    def test_cap_then_normalize_preserves_group_order(self, spark, docs):
        capped = source_cap(docs, "source", "doc_id", cap=4)
        counts = {
            r.source: r.n
            for r in capped.groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert counts["src_hot"] == 4 and counts["src_a"] == 3

        aligned = quantile_normalize(
            capped.select("doc_id", "source", "score"),
            "score",
            "source",
            "doc_id",
        )
        rows = aligned.collect()
        assert len(rows) == sum(counts.values())
        # normalization is monotone within each source
        by_src: dict = {}
        for r in rows:
            by_src.setdefault(r.source, []).append((r.score, r.norm_value))
        for vals in by_src.values():
            vals.sort()
            norms = [n for _, n in vals]
            assert norms == sorted(norms)
        # every normalized value is a value that EXISTS in the pool
        pool = {r.score for r in capped.collect()}
        assert {r.norm_value for r in rows} <= pool

    def test_discovered_fds_validate_cleanly(self, spark, docs):
        # a doc's text determines its word count; source never
        # determines score on this corpus
        enriched = docs.withColumn("n_words", F.size(F.split("text", " ")))
        fds = {
            (r.determinant, r.dependent): r.holds
            for r in discover_fds(
                enriched, [("text", "n_words"), ("source", "score")]
            ).collect()
        }
        assert fds[("text", "n_words")] is True
        assert fds[("source", "score")] is False

        # the held FD becomes an enforced contract: uniqueness of
        # (text, n_words) pairs per text == zero violations
        audit = {
            r.check: r.passed
            for r in validate_constraints(
                enriched.select("text", "n_words").distinct(),
                unique=[("text",)],
            ).collect()
        }
        assert all(audit.values())

    def test_release_gate_and_compaction_plan(self, spark, docs):
        kanon = k_anonymity_audit(
            docs.withColumn("good", F.col("score") >= 0.5),
            ["source"],
            "good",
            k=4,
            l=2,
        )
        flags = {r.source: (r.k_anonymous, r.l_diverse) for r in kanon.collect()}
        assert flags["src_hot"] == (True, True)
        assert flags["src_b"][0] is False  # 3 rows < k=4

        plan = compaction_plan(docs, "source", F.octet_length("text"), 200)
        rows = sorted(plan.collect(), key=lambda r: r.key if hasattr(r, "key") else r.source)
        # the manifest partitions the corpus exactly
        assert sum(r.n_rows for r in rows) == len(DOCS)
        total = sum(r.bytes for r in rows)
        # bins are contiguous in source order and start at 0
        assert rows[0].bin == 0
        bins = [r.bin for r in rows]
        assert bins == sorted(bins)
        assert max(bins) == (total - rows[-1].bytes) // 200
