"""``pyspark.ml`` Pipeline-stage interop for the curation operators.

Round-12 primitive-level interop (``MinHashLSH`` / ``BucketedRandomProjectionLSH``
tiers in ``operators/dedup.py`` / ``operators/ann.py``) proved the stock
MLlib PRIMITIVES compose with this engine; this module covers the
remaining stock surface: the ``Estimator`` / ``Transformer`` / ``Pipeline``
API itself, with ML persistence.  The trained quality classifier
(``operators/classify.py`` — multinomial NB over hashed bag-of-words,
the GPT-3/LLaMA/CCNet quality-filter component) is wrapped as:

- :class:`NbBowClassifier` — an ``Estimator`` whose ``fit`` calls
  :func:`~qdrant_datafusion_spark.operators.classify.train_nb_bow`
  (ONE corpus aggregation, bounded driver state);
- :class:`NbBowClassifierModel` — a ``Model`` whose ``transform``
  appends the prediction column via
  :func:`~qdrant_datafusion_spark.operators.classify.nb_bow_predict`
  (one broadcast join + one groupBy — the langid apply shape), and
  whose weights persist through ``DefaultParamsWritable`` (a JSON
  param), so a fitted ``PipelineModel`` mixing this stage with stock
  stages (``Tokenizer``, ``HashingTF``, LSH models, ...) saves and
  loads with the standard ``PipelineModel.load``.

The contract (pytest-enforced, ``tests/test_ml_interop.py``): a
``Pipeline`` fit/transform equals the library functions BIT-FOR-BIT —
the stage is plumbing around the same all-integer fixed-point kernel
(``Q(x) = floor(ln(x)·1e6 + 0.5)``), never a reimplementation — and a
save/load round-trip of the fitted ``PipelineModel`` reproduces the
identical output.

Scale: ``fit`` collects ≤ ``dim × |labels|`` weight rows (bounded
driver state); the model broadcast-joins ≤ ``dim`` weight rows at
apply time; ``transform`` is row-preserving (a left join back on the
id — documents with zero tokens keep a NULL prediction, the same
ignored-feature contract as the library function, which simply omits
them).

Reference hook: the reference repo has no ML surface (1,155-LoC Rust
connector); SURVEY §2.12's quality-classifier family names the
pyspark.ml wrapper as the interop tier.
"""

from __future__ import annotations

import json

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.classify import (
    NbBowModel,
    hashed_bow_counts,
    nb_bow_predict,
    train_nb_bow,
)

__all__ = ["NbBowClassifier", "NbBowClassifierModel"]


class _NbBowParams(Params):
    """Shared Params: declared once, inherited by estimator and model."""

    textCol = Param(
        Params._dummy(), "textCol", "input text column",
        typeConverter=TypeConverters.toString,
    )
    idCol = Param(
        Params._dummy(), "idCol",
        "document id column (join key for the appended prediction)",
        typeConverter=TypeConverters.toString,
    )
    labelCol = Param(
        Params._dummy(), "labelCol", "integer label column (fit only)",
        typeConverter=TypeConverters.toString,
    )
    predictionCol = Param(
        Params._dummy(), "predictionCol", "appended prediction column",
        typeConverter=TypeConverters.toString,
    )
    dim = Param(
        Params._dummy(), "dim", "hashed bag-of-words feature-space size",
        typeConverter=TypeConverters.toInt,
    )

    def _set_shared_defaults(self) -> None:
        self._setDefault(
            textCol="text", idCol="doc_id", labelCol="y",
            predictionCol="pred", dim=64,
        )

    def getTextCol(self) -> str:
        return self.getOrDefault(self.textCol)

    def getIdCol(self) -> str:
        return self.getOrDefault(self.idCol)

    def getLabelCol(self) -> str:
        return self.getOrDefault(self.labelCol)

    def getPredictionCol(self) -> str:
        return self.getOrDefault(self.predictionCol)

    def getDim(self) -> int:
        return self.getOrDefault(self.dim)


class NbBowClassifier(
    Estimator, _NbBowParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Estimator form of the trained quality classifier: ``fit`` =
    :func:`hashed_bow_counts` + :func:`train_nb_bow` on the input's
    (id, text, label) columns, returning :class:`NbBowClassifierModel`.
    """

    @keyword_only
    def __init__(self, **kwargs):
        super().__init__()
        self._set_shared_defaults()
        self._set(**kwargs)

    @keyword_only
    def setParams(self, **kwargs) -> "NbBowClassifier":
        self._set(**kwargs)
        return self

    def _fit(self, dataset: DataFrame) -> "NbBowClassifierModel":
        feats = hashed_bow_counts(
            dataset, self.getTextCol(), self.getIdCol(), dim=self.getDim()
        )
        nb = train_nb_bow(
            feats,
            dataset.select(self.getIdCol(), self.getLabelCol()),
            dim=self.getDim(),
            id_col=self.getIdCol(),
            label_col=self.getLabelCol(),
        )
        model = NbBowClassifierModel(modelJson=_model_to_json(nb))
        model._set(
            textCol=self.getTextCol(), idCol=self.getIdCol(),
            labelCol=self.getLabelCol(),
            predictionCol=self.getPredictionCol(), dim=self.getDim(),
        )
        model._resetUid(self.uid)
        return model


class NbBowClassifierModel(
    Model, _NbBowParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Fitted NB model as a row-preserving ``Transformer``: appends
    ``predictionCol`` by left-joining :func:`nb_bow_predict`'s (id,
    pred) output back on ``idCol`` (zero-token documents keep NULL —
    the library function omits them).  Weights live in the
    ``modelJson`` param, so ``DefaultParamsWritable`` persistence is
    the standard metadata JSON — no custom reader/writer."""

    modelJson = Param(
        Params._dummy(), "modelJson",
        "trained NbBowModel as JSON (dim, labels, priors, weights — the"
        " all-integer fixed-point weights, exactly what train_nb_bow"
        " produced, so persistence cannot perturb values)",
        typeConverter=TypeConverters.toString,
    )

    @keyword_only
    def __init__(self, **kwargs):
        super().__init__()
        self._set_shared_defaults()
        self._set(**kwargs)

    @property
    def nbModel(self) -> NbBowModel:
        return _model_from_json(self.getOrDefault(self.modelJson))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        id_col = self.getIdCol()
        feats = hashed_bow_counts(
            dataset, self.getTextCol(), id_col, dim=self.getDim()
        )
        pred = nb_bow_predict(
            feats, self.nbModel, id_col=id_col,
            out_col=self.getPredictionCol(),
        )
        return dataset.join(pred, id_col, "left")


def _model_to_json(m: NbBowModel) -> str:
    return json.dumps(
        {
            "dim": m.dim,
            "labels": list(m.labels),
            "priors": {str(k): v for k, v in m.priors.items()},
            "weights": {
                str(y): {str(d): w for d, w in per.items()}
                for y, per in m.weights.items()
            },
        },
        sort_keys=True,
    )


def _model_from_json(s: str) -> NbBowModel:
    o = json.loads(s)
    return NbBowModel(
        dim=int(o["dim"]),
        labels=tuple(int(x) for x in o["labels"]),
        priors={int(k): int(v) for k, v in o["priors"].items()},
        weights={
            int(y): {int(d): int(w) for d, w in per.items()}
            for y, per in o["weights"].items()
        },
    )
