"""pyspark.ml Pipeline-stage interop (round-12 verdict task 5): the
wrapped quality classifier must equal the library functions bit-for-bit
through fit/transform, survive ML-persistence save/load, and compose in
a Pipeline with stock stages (Tokenizer, HashingTF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.text import tokens
from qdrant_datafusion_spark.ml_interop import (
    NbBowClassifier,
    NbBowClassifierModel,
)
from qdrant_datafusion_spark.operators.classify import (
    hashed_bow_counts,
    nb_bow_predict,
    train_nb_bow,
)

DIM = 64


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    """documents with the gate's comparative label (y=+1 iff 'fast'
    strictly beats 'slow'), empty-text rows dropped — the same
    population the text_quality_classifier gate trains on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens(F.col("text"))
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            "text",
            F.when(
                F.size(F.filter(toks, lambda x: x == "fast"))
                > F.size(F.filter(toks, lambda x: x == "slow")),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def split(labeled):
    part = F.pmod(F.col("doc_id"), F.lit(10))
    return labeled.filter(part < 8), labeled.filter(part >= 8)


class TestNbBowPipeline:
    def test_pipeline_fit_transform_equals_library(self, split):
        """Pipeline(NbBowClassifier).fit(...).transform(...) must emit
        the exact (doc_id, pred) pairs of the library path — same
        all-integer kernel, the stage is plumbing only."""
        from pyspark.ml import Pipeline

        train, held = split
        feats_train = hashed_bow_counts(train, "text", "doc_id", dim=DIM)
        nb = train_nb_bow(
            feats_train, train.select("doc_id", "y"), dim=DIM
        )
        feats_held = hashed_bow_counts(held, "text", "doc_id", dim=DIM)
        lib = {
            (r.doc_id, r.pred)
            for r in nb_bow_predict(feats_held, nb).collect()
        }
        pm = Pipeline(stages=[NbBowClassifier(dim=DIM)]).fit(train)
        got = {
            (r.doc_id, r.pred)
            for r in pm.transform(held)
            .filter(F.col("pred").isNotNull())
            .select("doc_id", "pred")
            .collect()
        }
        assert got == lib and len(lib) > 0
        # the persisted weights ARE the library model's, not a re-derivation
        assert pm.stages[0].nbModel == nb
        # transform is row-preserving: zero-token docs keep NULL pred
        assert pm.transform(held).count() == held.count()

    def test_pipeline_model_save_load_roundtrip(self, split, tmp_path):
        from pyspark.ml import Pipeline, PipelineModel

        train, held = split
        pm = Pipeline(stages=[NbBowClassifier(dim=DIM)]).fit(train)
        before = sorted(
            (r.doc_id, r.pred)
            for r in pm.transform(held).select("doc_id", "pred").collect()
            if r.pred is not None
        )
        path = str(tmp_path / "nb_pipeline_model")
        pm.write().overwrite().save(path)
        loaded = PipelineModel.load(path)
        stage = loaded.stages[0]
        assert isinstance(stage, NbBowClassifierModel)
        assert stage.nbModel == pm.stages[0].nbModel  # weights bit-exact
        after = sorted(
            (r.doc_id, r.pred)
            for r in loaded.transform(held)
            .select("doc_id", "pred")
            .collect()
            if r.pred is not None
        )
        assert after == before

    def test_estimator_save_load_roundtrip(self, tmp_path):
        est = NbBowClassifier(dim=32, textCol="body", predictionCol="q")
        path = str(tmp_path / "nb_estimator")
        est.write().overwrite().save(path)
        loaded = NbBowClassifier.load(path)
        assert loaded.getDim() == 32
        assert loaded.getTextCol() == "body"
        assert loaded.getPredictionCol() == "q"

    def test_mixed_pipeline_with_stock_stages(self, split, tmp_path):
        """A Pipeline mixing STOCK stages (Tokenizer -> HashingTF) with
        the house stage must fit, transform, and round-trip through
        PipelineModel.save/load — the actual interop claim: one
        persisted artifact holding both vendor and house stages."""
        from pyspark.ml import Pipeline, PipelineModel
        from pyspark.ml.feature import HashingTF, Tokenizer

        train, held = split
        pipe = Pipeline(
            stages=[
                Tokenizer(inputCol="text", outputCol="_words"),
                HashingTF(
                    inputCol="_words", outputCol="_tf", numFeatures=256
                ),
                NbBowClassifier(dim=DIM),
            ]
        )
        pm = pipe.fit(train)
        out = pm.transform(held)
        assert {"_words", "_tf", "pred"} <= set(out.columns)
        before = sorted(
            (r.doc_id, r.pred)
            for r in out.select("doc_id", "pred").collect()
            if r.pred is not None
        )
        path = str(tmp_path / "mixed_pipeline_model")
        pm.write().overwrite().save(path)
        loaded = PipelineModel.load(path)
        after = sorted(
            (r.doc_id, r.pred)
            for r in loaded.transform(held)
            .select("doc_id", "pred")
            .collect()
            if r.pred is not None
        )
        assert after == before and len(after) > 0
