"""Model-based quality filtering: distributed trained text classifiers.

The GPT-3 / LLaMA / CCNet-era pipelines gate web documents with a
TRAINED quality classifier (GPT-3: logistic regression over hashed
features of WebText-vs-CommonCrawl; LLaMA: fastText-style linear model
on Wikipedia references; CCNet: an LM).  This module implements that
component Spark-first, with the same all-integer fixed-point discipline
as ``operators.langid`` / ``operators.graph`` so training is
bit-identical on any partitioning or engine and every step mirrors into
a DuckDB value oracle:

- ``hashed_bow_counts`` / ``hashed_bow_features`` — the hashing trick
  (Weinberger et al. 2009): a FIXED ``dim``-bucket feature space
  regardless of vocabulary, so any trained model is a constant-size
  driver literal at any corpus scale;
- ``train_nb_bow`` / ``nb_bow_predict`` — multinomial Naive Bayes with
  Laplace smoothing over the hashed buckets (the production default:
  trains in ONE aggregation pass, converges by construction, and its
  ``Q(x) = floor(ln(x)·1e6 + 0.5)`` integer log weights replay exactly
  in SQL — the same quantization ``operators.langid`` pins);
- ``train_perceptron`` / ``perceptron_predict`` — a batch perceptron
  (Rosenblatt 1958; order-free integer batch updates) for SEPARABLE
  planted labels.  Note the classic caveat: with a fixed unit
  increment, the batch variant needs many epochs on small-margin data
  and can oscillate on non-separable data — prefer the NB trainer for
  real quality labels; the perceptron earns its keep where a clean
  margin exists (unit-tested in tests/test_classify.py).

Cost shapes: feature build = one explode + groupBy(id, d); NB train =
one groupBy((label, d)) bounded by ``dim × |labels|`` rows collected to
the driver (documented-bounded, like langid's K×L weight table); NB
apply = one broadcast join + one groupBy(id); perceptron epoch = one
explode + groupBy(d) over the misclassified docs, ``dim + 1`` longs to
the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SqlWindow

from qdrant_datafusion_spark.functions.text import tokens
from qdrant_datafusion_spark.operators.tokenizer import _qlog
from qdrant_datafusion_spark.session import fan_out

__all__ = [
    "hashed_bow_counts",
    "hashed_bow_features",
    "NbBowModel",
    "nb_bow_score",
    "pr_curve",
    "train_nb_bow",
    "nb_bow_predict",
    "train_perceptron",
    "perceptron_predict",
]


def _bucket(tok: Column, dim: int) -> Column:
    """md5-based feature bucket in ``[0, dim)`` — the same
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % dim`` arithmetic the
    sketch oracles replay in DuckDB, salted with ``bow:``."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("bow:"), tok)), 1, 8), 16, 10
        ).cast("long"),
        F.lit(dim),
    )


def hashed_bow_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Hashed bag-of-words in long form: ``(id, d int, c long)`` — one
    row per (document, occupied bucket).  One explode + one keyed
    groupBy, linear in corpus tokens; documents with zero tokens emit
    no rows (callers treat missing ids as feature-less)."""
    # fan_out BEFORE tokenize/explode/md5-bucket: the whole feature walk
    # otherwise runs inside the one-task scan stage of a
    # single-row-group file (session.fan_out)
    return (
        fan_out(
            df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id"
        )
        .select("_id", F.explode(tokens(F.col(text_col))).alias("_t"))
        .select("_id", _bucket(F.col("_t"), dim).cast("int").alias("d"))
        .groupBy("_id", "d")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumnRenamed("_id", id_col)
    )


def hashed_bow_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Packed form of :func:`hashed_bow_counts`:
    ``(id, feats array<struct<d int, c long>>)`` sorted by dimension —
    the zero-shuffle scoring layout the perceptron folds over."""
    return (
        hashed_bow_counts(df, text_col, id_col, dim)
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("c")))
            ).alias("feats")
        )
    )


# ---------------------------------------------------------------------------
# Naive Bayes over hashed BoW — the production quality-filter trainer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NbBowModel:
    """Multinomial-NB weights over hashed buckets.  ``labels`` sorted
    ascending; ``priors[l] = Q(n_docs[l]) − Q(n_docs)``;
    ``weights[l][d] = Q(cnt[l][d] + 1) − Q(tot[l] + dim)`` for every
    bucket ``d`` OBSERVED IN TRAINING (out-of-vocabulary buckets score
    0 at apply time — the same ignored-feature contract as
    ``langid.LangNgramModel``)."""

    dim: int
    labels: tuple[int, ...]
    priors: dict[int, int]
    weights: dict[int, dict[int, int]]


def train_nb_bow(
    feats: DataFrame,
    labels: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> NbBowModel:
    """Train multinomial NB from long-form features and integer labels.

    ONE corpus aggregation — groupBy((label, bucket)) with map-side
    combine — bounded by ``dim × |labels|`` rows, collected to the
    driver alongside the ``|labels|``-row doc counts (bounded driver
    state, the langid contract).  Smoothing denominators use ``dim``
    (the fixed feature-space size), so the weights do not depend on
    which buckets happen to be occupied.
    """
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("long").alias("_y")
    )
    fe = feats.select(F.col(id_col).alias("_id"), "d", "c")
    cnt_rows = (
        fe.join(lab, "_id")
        .groupBy("_y", "d")
        .agg(F.sum("c").cast("long").alias("_c"))
        .collect()  # bounded: ≤ dim × |labels| rows
    )
    doc_rows = lab.groupBy("_y").agg(F.count("*").alias("_n")).collect()
    doc_counts = {int(r["_y"]): int(r["_n"]) for r in doc_rows}
    if not doc_counts:
        raise ValueError("labels is empty")
    label_set = tuple(sorted(doc_counts))
    total_docs = sum(doc_counts.values())
    priors = {
        y: _qlog(doc_counts[y]) - _qlog(total_docs) for y in label_set
    }
    cnt: dict[int, dict[int, int]] = {y: {} for y in label_set}
    for r in cnt_rows:
        cnt[int(r["_y"])][int(r["d"])] = int(r["_c"])
    dims = sorted({d for per in cnt.values() for d in per})
    weights: dict[int, dict[int, int]] = {}
    for y in label_set:
        tot = sum(cnt[y].values())
        denom = _qlog(tot + dim)
        weights[y] = {d: _qlog(cnt[y].get(d, 0) + 1) - denom for d in dims}
    return NbBowModel(
        dim=dim, labels=label_set, priors=priors, weights=weights
    )


def nb_bow_predict(
    feats: DataFrame,
    model: NbBowModel,
    id_col: str = "doc_id",
    out_col: str = "pred",
) -> DataFrame:
    """``(id, pred)`` — argmax over labels of
    ``prior[l] + Σ_d c_d · weight[l][d]``, ties broken by label
    ascending (the strict-``>`` argmax chain, identical to
    ``ORDER BY score DESC, label ASC LIMIT 1``).  One broadcast join on
    the bucket + one groupBy(id) — the langid apply shape."""
    spark = feats.sparkSession
    labs = model.labels
    dims = sorted(model.weights[labs[0]]) if labs else []
    wdf = spark.createDataFrame(
        [(d, [model.weights[y][d] for y in labs]) for d in dims],
        "d int, _w array<long>",
    )
    sums = (
        feats.select(F.col(id_col).alias("_id"), "d", "c")
        .join(F.broadcast(wdf), "d", "left")
        .groupBy("_id")
        .agg(
            *[
                F.sum(F.element_at("_w", i + 1) * F.col("c")).alias(f"_s{i}")
                for i in range(len(labs))
            ]
        )
    )
    scores: list[tuple[int, Column]] = [
        (
            y,
            F.lit(model.priors[y]).cast("long")
            + F.coalesce(F.col(f"_s{i}"), F.lit(0)),
        )
        for i, y in enumerate(labs)
    ]
    best_y: Column = F.lit(scores[0][0]).cast("long")
    best_s: Column = scores[0][1]
    for y, s in scores[1:]:
        gt = s > best_s
        best_y = F.when(gt, F.lit(y).cast("long")).otherwise(best_y)
        best_s = F.when(gt, s).otherwise(best_s)
    return sums.select(
        F.col("_id").alias(id_col), best_y.alias(out_col)
    )


def nb_bow_score(
    feats: DataFrame,
    model: NbBowModel,
    id_col: str = "doc_id",
    out_col: str = "margin",
) -> DataFrame:
    """``(id, margin)`` for a BINARY model: the integer decision margin
    ``score(labels[1]) − score(labels[0])`` (positive → the larger
    label, zero → the smaller one, matching :func:`nb_bow_predict`'s
    tie rule).  The single-score form threshold sweeps and PR curves
    consume.  Same plan as predict: one broadcast join + one
    groupBy(id)."""
    if len(model.labels) != 2:
        raise ValueError(
            f"margin needs a binary model, got labels {model.labels}"
        )
    y0, y1 = model.labels
    dims = sorted(model.weights[y0])
    wdf = feats.sparkSession.createDataFrame(
        [(d, model.weights[y1][d] - model.weights[y0][d]) for d in dims],
        "d int, _dw long",
    )
    prior_diff = model.priors[y1] - model.priors[y0]
    return (
        feats.select(F.col(id_col).alias("_id"), "d", "c")
        .join(F.broadcast(wdf), "d", "left")
        .groupBy("_id")
        .agg(
            (
                F.lit(prior_diff).cast("long")
                + F.coalesce(F.sum(F.col("_dw") * F.col("c")), F.lit(0))
            ).alias(out_col)
        )
        .withColumnRenamed("_id", id_col)
    )


def pr_curve(
    scored: DataFrame,
    score_col: str = "margin",
    label_col: str = "y",
    n_buckets: int = 16,
) -> DataFrame:
    """Bucketed precision/recall curve — the threshold-tuning half of
    model-based quality filtering (pick the score cut that hits a
    target precision before unleashing the filter on 100 TB).

    Scores quantize into ``n_buckets`` equal-width integer bins, so the
    curve costs ONE groupBy bounded at ``n_buckets`` rows plus a window
    over those rows alone (the sketch-quantile-walk discipline — the
    single-partition window is over ≤ n_buckets rows, never the data).
    Driver state: the 2-long min/max row.  All ratios are integer
    HALF_UP parts-per-million (``(2·10⁶·a + b) // (2·b)``) so the curve
    is bit-identical cross-engine.

    Input: ``(score_col long, label_col ∈ {-1,+1})``.  Output, one row
    per NON-EMPTY bucket, descending: ``(b, thr_lo, tp, fp, fn,
    precision_ppm, recall_ppm)`` — tp/fp count rows with score ≥ the
    bucket's lower edge ``thr_lo``.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # pin once: the min/max/positives collect and the bucket groupBy are
    # two actions — without the pin the upstream scoring join runs twice
    scored = scored.localCheckpoint(eager=False)
    y0 = F.col(label_col).cast("long")
    ext = scored.agg(
        F.min(score_col).cast("long"),
        F.max(score_col).cast("long"),
        F.sum(F.when(y0 == 1, 1).otherwise(0)).cast("long"),
    ).collect()[0]
    if ext[0] is None:
        raise ValueError("scored is empty")
    if not ext[2]:
        # recall is tp / positives — undefined over an all-negative set
        # (found by the hypothesis property test as a DIVIDE_BY_ZERO)
        raise ValueError("scored has no positive labels; recall undefined")
    lo, hi = int(ext[0]), int(ext[1])
    width = hi - lo + 1
    y = F.col(label_col).cast("long")
    ag = (
        scored.groupBy(
            F.expr(
                f"(({score_col} - {lo}) * {n_buckets}) div {width}"
            ).alias("b")
        )
        .agg(
            F.sum(F.when(y == 1, 1).otherwise(0)).cast("long").alias("pos"),
            F.sum(F.when(y == -1, 1).otherwise(0)).cast("long").alias("neg"),
        )
    )
    wd = SqlWindow.orderBy(F.desc("b")).rowsBetween(
        SqlWindow.unboundedPreceding, SqlWindow.currentRow
    )
    wall = SqlWindow.orderBy(F.desc("b")).rowsBetween(
        SqlWindow.unboundedPreceding, SqlWindow.unboundedFollowing
    )
    tp = F.sum("pos").over(wd)
    fp = F.sum("neg").over(wd)
    p_total = F.sum("pos").over(wall)
    out = ag.select(
        "b",
        (
            F.lit(lo).cast("long")
            + F.expr(f"(b * {width} + {n_buckets} - 1) div {n_buckets}")
        ).alias("thr_lo"),
        tp.alias("tp"),
        fp.alias("fp"),
        (p_total - tp).cast("long").alias("fn"),
    )
    return out.select(
        "b",
        "thr_lo",
        "tp",
        "fp",
        "fn",
        F.expr("(2 * 1000000 * tp + (tp + fp)) div (2 * (tp + fp))")
        .cast("long")
        .alias("precision_ppm"),
        F.expr("(2 * 1000000 * tp + (tp + fn)) div (2 * (tp + fn))")
        .cast("long")
        .alias("recall_ppm"),
    ).orderBy(F.desc("b"))


# ---------------------------------------------------------------------------
# Batch perceptron — the separable-case trainer
# ---------------------------------------------------------------------------


def _score(feats: Column, w: list[int], b: int) -> Column:
    """Integer margin ``b + Σ w[d]·c`` as a zero-shuffle array fold
    against the literal weight vector."""
    w_lit = F.array(*[F.lit(int(x)).cast("long") for x in w])
    return F.aggregate(
        feats,
        F.lit(int(b)).cast("long"),
        lambda acc, s: acc + F.element_at(w_lit, s["d"] + 1) * s["c"],
    )


def train_perceptron(
    feats: DataFrame,
    labels: DataFrame,
    dim: int,
    epochs: int = 3,
    id_col: str = "doc_id",
    label_col: str = "y",
    averaged: bool = True,
) -> tuple[list[int], int]:
    """Batch-perceptron weights after ``epochs`` full passes over
    PACKED features (:func:`hashed_bow_features`).

    ``labels`` carries ``(id, y)`` with y ∈ {-1, +1}.  Per epoch t:
    ``mis = {i : y_i · score_t(i) ≤ 0}`` (zero margin counts as wrong —
    epoch 1 from w=0 therefore updates on every doc, the standard batch
    start), then ``w += Σ_mis y_i·x_i`` and ``b += Σ_mis y_i``.  All
    sums are integer and order-free → deterministic on any layout.

    ``averaged=True`` (the library DEFAULT) returns the AVERAGED
    perceptron — the batch analogue of Freund & Schapire 1999: the sum
    ``(Σ_t w_t, Σ_t b_t)`` of the per-epoch weight snapshots.  The
    prediction sign is invariant to the 1/T scale, so the returned
    weights stay integer.  On NON-separable data the plain batch rule
    oscillates between weight states forever ("silently bad model"),
    while the snapshot average smooths the oscillation and its held-out
    accuracy stabilizes — measured in
    ``tests/test_classify.py::TestAveragedPerceptron``.  Pass
    ``averaged=False`` for the raw last-epoch weights (the
    separable-case rule the integer reference tests pin down).

    Returns ``(weights list of len dim, bias)``.  Driver state per
    epoch: ``dim + 1`` longs (plus the same-sized running sum when
    averaging).
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    fe = (
        feats.select(F.col(id_col).alias("_id"), "feats")
        .join(
            labels.select(
                F.col(id_col).alias("_id"),
                F.col(label_col).cast("long").alias("_y"),
            ),
            "_id",
            # inner: docs with zero in-vocab tokens have no feature row
            # and contribute nothing to any batch update either way
        )
        .localCheckpoint(eager=True)
    )
    w = [0] * dim
    b = 0
    sw = [0] * dim  # running Σ of per-epoch snapshots (averaged form)
    sb = 0
    bias_d = dim  # bias rides the same explode as a planted dimension
    for _ in range(epochs):
        mis = fe.filter(F.col("_y") * _score(F.col("feats"), w, b) <= 0)
        delta_rows = (
            mis.select(
                "_y",
                F.explode(
                    F.concat(
                        F.col("feats"),
                        F.array(
                            F.struct(
                                F.lit(bias_d).cast("int").alias("d"),
                                F.lit(1).cast("long").alias("c"),
                            )
                        ),
                    )
                ).alias("s"),
            )
            .groupBy(F.col("s.d").alias("d"))
            .agg(F.sum(F.col("_y") * F.col("s.c")).cast("long").alias("dw"))
            .collect()
        )
        for r in delta_rows:
            if r["d"] == bias_d:
                b += int(r["dw"])
            else:
                w[r["d"]] += int(r["dw"])
        if averaged:
            sw = [a + x for a, x in zip(sw, w)]
            sb += b
    return (sw, sb) if averaged else (w, b)


def perceptron_predict(
    feats: DataFrame,
    w: list[int],
    b: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, score, pred)`` — integer margin and sign prediction
    (``score > 0 → +1`` else ``-1``; the ≤-0 side matches the training
    mistake rule).  A pure narrow map: zero shuffles."""
    s = _score(F.col("feats"), w, b)
    return feats.select(
        F.col(id_col),
        s.alias("score"),
        F.when(s > 0, F.lit(1)).otherwise(F.lit(-1)).cast("int").alias("pred"),
    )
