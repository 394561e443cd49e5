"""Unit tests for paragraph-level exact dedup (dedup.paragraph_dedup_global
/ paragraph_dedup_incremental) — brute-force first-occurrence references,
the Bloom false-positive path (tiny filter forced to collide), store-hash
reuse, and the normalize contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.dedup import (
    paragraph_dedup_global,
    paragraph_dedup_incremental,
)

DOCS = [
    (1, "alpha beta\ngamma delta\nepsilon zeta"),
    (2, "gamma delta\nnew one"),
    (3, "alpha beta\nalpha beta\nunique three"),
    (4, "Gamma Delta\nanother four"),  # case-insensitive dup under normalize
]


def _ref_global(docs, normalize=True):
    seen = {}
    per_doc = {}
    for did, text in sorted(docs):
        units = [u for u in text.split("\n") if u.strip()]
        kept = []
        for pos, u in enumerate(units):
            key = u.strip().lower() if normalize else u
            if key not in seen:
                seen[key] = (did, pos)
                kept.append(u)
        per_doc[did] = (len(units), len(kept), " ".join(kept))
    return per_doc


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestParagraphGlobal:
    def test_matches_first_occurrence_reference(self, spark, docs_df):
        got = {
            r["doc_id"]: (r["n_units"], r["n_kept"], r["kept_text"])
            for r in paragraph_dedup_global(docs_df).collect()
        }
        assert got == _ref_global(DOCS)

    def test_normalize_off_keeps_case_variants(self, spark, docs_df):
        got = {
            r["doc_id"]: r["n_kept"]
            for r in paragraph_dedup_global(docs_df, normalize=False).collect()
        }
        ref = _ref_global(DOCS, normalize=False)
        assert got == {d: k for d, (_, k, _) in ref.items()}
        # 'Gamma Delta' survives un-normalized (case differs from doc 1)
        assert got[4] == 2

    def test_all_dup_doc_empty_kept_text(self, spark):
        df = spark.createDataFrame(
            [(1, "x y\nz w"), (2, "x y\nz w")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in paragraph_dedup_global(df).collect()}
        assert rows[2]["n_kept"] == 0
        assert rows[2]["kept_text"] == ""
        assert rows[1]["n_kept"] == 2

    def test_units_override(self, spark, docs_df):
        # 1-word units via an expression: every token is a unit
        out = paragraph_dedup_global(
            docs_df,
            units=F.split(F.regexp_replace("text", "\n", " "), " "),
        ).collect()
        # 'alpha' appears first in doc 1 pos 0; doc 3 drops both copies
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[3]["n_kept"] < by_id[3]["n_units"]


def _ref_incremental(batch, store, normalize=True):
    store_units = set()
    for _, text in store:
        for u in text.split("\n"):
            if u.strip():
                store_units.add(u.strip().lower() if normalize else u)
    seen = set()
    per_doc = {}
    for did, text in sorted(batch):
        units = [u for u in text.split("\n") if u.strip()]
        kept = []
        for u in units:
            key = u.strip().lower() if normalize else u
            if key not in store_units and key not in seen:
                seen.add(key)
                kept.append(u)
        per_doc[did] = (len(units), len(kept), " ".join(kept))
    return per_doc


class TestParagraphIncremental:
    def test_matches_reference(self, spark):
        store = [(10, "alpha beta\nstored two"), (11, "gamma delta")]
        batch = [
            (20, "alpha beta\nfresh unit"),
            (21, "fresh unit\ngamma delta\nonly here"),
        ]
        out = paragraph_dedup_incremental(
            spark.createDataFrame(batch, "doc_id long, text string"),
            store=spark.createDataFrame(store, "doc_id long, text string"),
        )
        got = {
            r["doc_id"]: (r["n_units"], r["n_kept"], r["kept_text"])
            for r in out.collect()
        }
        assert got == _ref_incremental(batch, store)

    def test_tiny_bloom_forces_fps_output_still_exact(self, spark):
        # m_bits=64 over ~40 store units → dense filter, many false
        # positives — the exact-verify tier must scrub every one
        store = [(i, f"stored {i} unit\ncommon tail") for i in range(40)]
        batch = [(100, "fresh a\nfresh b\ncommon tail\nstored 7 unit")]
        out = paragraph_dedup_incremental(
            spark.createDataFrame(batch, "doc_id long, text string"),
            store=spark.createDataFrame(store, "doc_id long, text string"),
            m_bits=64,
            num_hashes=2,
        )
        got = {
            r["doc_id"]: (r["n_units"], r["n_kept"], r["kept_text"])
            for r in out.collect()
        }
        assert got == _ref_incremental(batch, store)
        assert got[100] == (4, 2, "fresh a fresh b")

    def test_store_hashes_table_reused(self, spark):
        # passing the persisted hash store (the streaming-ingest pattern)
        # must agree with deriving hashes from the store docs
        store = [(10, "alpha beta\nstored two")]
        batch = [(20, "alpha beta\nfresh unit")]
        store_df = spark.createDataFrame(store, "doc_id long, text string")
        batch_df = spark.createDataFrame(batch, "doc_id long, text string")
        hashes = (
            store_df.select(F.explode(F.split("text", "\n")).alias("_u"))
            .filter(F.trim("_u") != "")
            .select(F.xxhash64(F.lower(F.trim("_u"))).alias("uh"))
            .distinct()
        )
        a = paragraph_dedup_incremental(batch_df, store=store_df).collect()
        b = paragraph_dedup_incremental(
            batch_df, store_hashes=hashes
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_exactly_one_of_store_or_hashes(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            paragraph_dedup_incremental(df)
        with pytest.raises(ValueError):
            paragraph_dedup_incremental(
                df, store=df, store_hashes=df.select(F.lit(1).alias("uh"))
            )
