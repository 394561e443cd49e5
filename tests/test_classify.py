"""Unit tests for operators/classify.py — hashed-BoW features, the NB
quality-filter trainer, and the batch perceptron.  Every assertion
compares against an independent pure-Python reference built from the
same integer contracts (md5 buckets, Q-quantized logs, integer batch
updates)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.classify import (
    hashed_bow_counts,
    hashed_bow_features,
    nb_bow_predict,
    perceptron_predict,
    train_nb_bow,
    train_perceptron,
)

DIM = 16


def _bucket(tok: str) -> int:
    return int(hashlib.md5(f"bow:{tok}".encode()).hexdigest()[:8], 16) % DIM


def _qlog(x: int) -> int:
    return int(math.floor(math.log(x) * 1_000_000 + 0.5))


DOCS = [
    (0, "fast fast table join"),
    (1, "slow slow scan scan scan"),
    (2, "fast slow merge"),
    (3, "table table table fast"),
    (4, "slow merge merge"),
    (5, "fast fast fast slow"),
]
# y = +1 iff count(fast) > count(slow)
LABELS = {0: 1, 1: -1, 2: -1, 3: 1, 4: -1, 5: 1}


def _ref_counts(text: str) -> Counter:
    return Counter(_bucket(t) for t in text.lower().split())


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def labels_df(spark):
    return spark.createDataFrame(
        [(i, y) for i, y in LABELS.items()], "doc_id long, y long"
    )


class TestHashedBow:
    def test_counts_match_reference(self, spark, docs_df):
        got = {
            (r["doc_id"], r["d"]): r["c"]
            for r in hashed_bow_counts(docs_df, dim=DIM).collect()
        }
        want = {
            (i, d): c
            for i, text in DOCS
            for d, c in _ref_counts(text).items()
        }
        assert got == want

    def test_packed_sorted_and_consistent(self, spark, docs_df):
        rows = hashed_bow_features(docs_df, dim=DIM).collect()
        for r in rows:
            ds = [s["d"] for s in r["feats"]]
            assert ds == sorted(ds)
            assert {(s["d"], s["c"]) for s in r["feats"]} == set(
                _ref_counts(dict(DOCS)[r["doc_id"]]).items()
            )

    def test_empty_doc_emits_no_rows(self, spark):
        df = spark.createDataFrame(
            [(0, "a b"), (1, "   ")], "doc_id long, text string"
        )
        ids = {r["doc_id"] for r in hashed_bow_counts(df, dim=DIM).collect()}
        assert ids == {0}


def _ref_nb(train_ids):
    cnt = {1: Counter(), -1: Counter()}
    nd = {1: 0, -1: 0}
    for i, text in DOCS:
        if i not in train_ids:
            continue
        y = LABELS[i]
        nd[y] += 1
        cnt[y].update(_ref_counts(text))
    labels = sorted(k for k in nd if nd[k])
    total = sum(nd.values())
    priors = {y: _qlog(nd[y]) - _qlog(total) for y in labels}
    dims = sorted(set().union(*[cnt[y].keys() for y in labels]))
    weights = {
        y: {
            d: _qlog(cnt[y].get(d, 0) + 1) - _qlog(sum(cnt[y].values()) + DIM)
            for d in dims
        }
        for y in labels
    }
    return labels, priors, weights


class TestNbBow:
    def test_model_matches_reference(self, spark, docs_df, labels_df):
        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(feats, labels_df, dim=DIM)
        labels, priors, weights = _ref_nb(set(LABELS))
        assert list(model.labels) == labels
        assert model.priors == priors
        assert model.weights == weights

    def test_predict_matches_reference(self, spark, docs_df, labels_df):
        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(feats, labels_df, dim=DIM)
        got = {
            r["doc_id"]: r["pred"]
            for r in nb_bow_predict(feats, model).collect()
        }
        labels, priors, weights = _ref_nb(set(LABELS))
        for i, text in DOCS:
            scores = {
                y: priors[y]
                + sum(
                    weights[y].get(d, 0) * c
                    for d, c in _ref_counts(text).items()
                )
                for y in labels
            }
            best = max(labels, key=lambda y: (scores[y], -y))
            # tie → label ascending: max on (score, -y) picks smaller y
            assert got[i] == best

    def test_oov_bucket_scores_zero(self, spark, docs_df, labels_df):
        # train WITHOUT doc 4 ('merge'-heavy); if 'merge' lands in a
        # bucket unseen in training, apply must ignore it (not smooth it)
        train = labels_df.filter(F.col("doc_id") != 4)
        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(
            feats.join(train.select("doc_id"), "doc_id"), train, dim=DIM
        )
        dims = set(model.weights[model.labels[0]])
        pred = {
            r["doc_id"]: r["pred"]
            for r in nb_bow_predict(feats, model).collect()
        }
        # reference with the same ignored-OOV contract
        labels, priors, weights = _ref_nb(set(LABELS) - {4})
        for i, text in DOCS:
            scores = {
                y: priors[y]
                + sum(
                    weights[y].get(d, 0) * c
                    for d, c in _ref_counts(text).items()
                    if d in dims
                )
                for y in labels
            }
            best = max(labels, key=lambda y: (scores[y], -y))
            assert pred[i] == best

    def test_empty_labels_raises(self, spark, docs_df, labels_df):
        feats = hashed_bow_counts(docs_df, dim=DIM)
        with pytest.raises(ValueError):
            train_nb_bow(feats, labels_df.filter(F.lit(False)), dim=DIM)


def _ref_perceptron(epochs: int):
    feats = {i: _ref_counts(text) for i, text in DOCS}
    w = [0] * DIM
    b = 0
    for _ in range(epochs):
        dw = [0] * DIM
        db = 0
        for i, c in feats.items():
            y = LABELS[i]
            s = b + sum(w[d] * v for d, v in c.items())
            if y * s <= 0:
                db += y
                for d, v in c.items():
                    dw[d] += y * v
        w = [a + x for a, x in zip(w, dw)]
        b += db
    return w, b


class TestPerceptron:
    @pytest.mark.parametrize("epochs", [1, 3])
    def test_matches_integer_reference(self, spark, docs_df, labels_df, epochs):
        feats = hashed_bow_features(docs_df, dim=DIM)
        w, b = train_perceptron(
            feats, labels_df, dim=DIM, epochs=epochs, averaged=False
        )
        rw, rb = _ref_perceptron(epochs)
        assert w == rw
        assert b == rb

    def test_converges_on_separable_margin(self, spark):
        # planted SEPARABLE concept: y=+1 iff the doc contains 'pos'
        # (a dedicated bucket), with a clean unit margin — the regime
        # the batch perceptron is for
        rows = [
            (i, ("pos common filler" if i % 2 == 0 else "neg common filler"))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        labels = df.select(
            "doc_id",
            F.when(F.col("text").startswith("pos"), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
        )
        feats = hashed_bow_features(df, dim=DIM)
        w, b = train_perceptron(feats, labels, dim=DIM, epochs=3)
        joined = perceptron_predict(feats, w, b).join(labels, "doc_id")
        wrong = joined.filter(F.col("pred") != F.col("y")).count()
        assert wrong == 0

    def test_predict_sign_rule(self, spark, docs_df, labels_df):
        feats = hashed_bow_features(docs_df, dim=DIM)
        w, b = train_perceptron(
            feats, labels_df, dim=DIM, epochs=1, averaged=False
        )
        for r in perceptron_predict(feats, w, b).collect():
            assert r["pred"] == (1 if r["score"] > 0 else -1)

    def test_bad_epochs_raises(self, spark, docs_df, labels_df):
        feats = hashed_bow_features(docs_df, dim=DIM)
        with pytest.raises(ValueError):
            train_perceptron(feats, labels_df, dim=DIM, epochs=0)


def _ref_perceptron_both(docs, labels, ids, epochs):
    """(plain last-epoch, averaged Σ-snapshot) weights — the same
    integer batch algebra as _ref_perceptron, over arbitrary data."""
    w = [0] * DIM
    b = 0
    sw = [0] * DIM
    sb = 0
    for _ in range(epochs):
        dw = [0] * DIM
        db = 0
        for i in ids:
            c, y = docs[i], labels[i]
            s = b + sum(w[d] * v for d, v in c.items())
            if y * s <= 0:
                db += y
                for d, v in c.items():
                    dw[d] += y * v
        w = [a + x for a, x in zip(w, dw)]
        b += db
        sw = [a + x for a, x in zip(sw, w)]
        sb += b
    return (w, b), (sw, sb)


class TestAveragedPerceptron:
    """The library-default trainer (averaged=True, Freund & Schapire
    1999 batch analogue): on NON-separable data the plain batch rule
    oscillates between weight states; the snapshot average smooths it
    and held-out accuracy must not degrade."""

    def test_spark_matches_averaged_reference(self, spark, docs_df, labels_df):
        feats = hashed_bow_features(docs_df, dim=DIM)
        w, b = train_perceptron(feats, labels_df, dim=DIM, epochs=3)
        ref_docs = {i: _ref_counts(text) for i, text in DOCS}
        _, (sw, sb) = _ref_perceptron_both(
            ref_docs, LABELS, sorted(ref_docs), epochs=3
        )
        assert w == sw
        assert b == sb

    def test_still_converges_on_separable_margin(self, spark):
        # the averaged default must not break the separable guarantee:
        # every snapshot past convergence IS the separator, so the
        # average separates too
        rows = [
            (i, ("pos common filler" if i % 2 == 0 else "neg common filler"))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        labels = df.select(
            "doc_id",
            F.when(F.col("text").startswith("pos"), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
        )
        feats = hashed_bow_features(df, dim=DIM)
        w, b = train_perceptron(feats, labels, dim=DIM, epochs=3)
        joined = perceptron_predict(feats, w, b).join(labels, "doc_id")
        assert joined.filter(F.col("pred") != F.col("y")).count() == 0

    def test_heldout_accuracy_ge_plain_on_nonseparable(self):
        """Across 5 fixed seeds of a label-noised (non-separable) random
        corpus, averaged held-out accuracy >= plain per seed, and
        strictly better in aggregate.  Pure-Python over the SAME integer
        algebra the Spark trainer is pinned to by
        test_spark_matches_averaged_reference + the integer-reference
        tests, so this property transfers to the distributed trainer."""
        import random

        def gen(seed, n=80, flip=0.15):
            rng = random.Random(seed)
            docs, labels = {}, {}
            fillers = [f"w{j}" for j in range(10)]
            for i in range(n):
                sig = "pos" if i % 2 == 0 else "neg"
                toks = [sig] + [rng.choice(fillers) for _ in range(3)]
                docs[i] = Counter(_bucket(t) for t in toks)
                y = 1 if i % 2 == 0 else -1
                if rng.random() < flip:
                    y = -y
                labels[i] = y
            return docs, labels

        def acc(docs, labels, ids, w, b):
            ok = 0
            for i in ids:
                s = b + sum(w[d] * v for d, v in docs[i].items())
                ok += ((1 if s > 0 else -1) == labels[i])
            return ok / len(ids)

        plain_total = avg_total = 0.0
        for seed in range(5):
            docs, labels = gen(seed)
            ids = sorted(docs)
            tr = [i for i in ids if i % 10 < 7]
            ho = [i for i in ids if i % 10 >= 7]
            (w, b), (sw, sb) = _ref_perceptron_both(docs, labels, tr, 8)
            a_plain = acc(docs, labels, ho, w, b)
            a_avg = acc(docs, labels, ho, sw, sb)
            assert a_avg >= a_plain, (seed, a_plain, a_avg)
            plain_total += a_plain
            avg_total += a_avg
        assert avg_total > plain_total


class TestNbScore:
    def test_margin_sign_matches_predict(self, spark, docs_df, labels_df):
        from qdrant_datafusion_spark.operators.classify import nb_bow_score

        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(feats, labels_df, dim=DIM)
        j = nb_bow_score(feats, model).join(
            nb_bow_predict(feats, model), "doc_id"
        )
        for r in j.collect():
            assert r["pred"] == (1 if r["margin"] > 0 else -1)

    def test_margin_matches_reference(self, spark, docs_df, labels_df):
        from qdrant_datafusion_spark.operators.classify import nb_bow_score

        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(feats, labels_df, dim=DIM)
        got = {
            r["doc_id"]: r["margin"]
            for r in nb_bow_score(feats, model).collect()
        }
        labels, priors, weights = _ref_nb(set(LABELS))
        for i, text in DOCS:
            want = (priors[1] - priors[-1]) + sum(
                (weights[1].get(d, 0) - weights[-1].get(d, 0)) * c
                for d, c in _ref_counts(text).items()
                if d in weights[1]
            )
            assert got[i] == want

    def test_non_binary_model_rejected(self, spark, docs_df):
        from qdrant_datafusion_spark.operators.classify import nb_bow_score

        labs3 = spark.createDataFrame(
            [(i, i % 3) for i, _ in DOCS], "doc_id long, y long"
        )
        feats = hashed_bow_counts(docs_df, dim=DIM)
        model = train_nb_bow(feats, labs3, dim=DIM)
        with pytest.raises(ValueError):
            nb_bow_score(feats, model)


def _ref_pr(points, nb):
    # points: list of (score, y)
    lo = min(s for s, _ in points)
    hi = max(s for s, _ in points)
    width = hi - lo + 1
    buckets = {}
    for s, y in points:
        b = (s - lo) * nb // width
        pos, neg = buckets.get(b, (0, 0))
        buckets[b] = (pos + (y == 1), neg + (y == -1))
    p_total = sum(p for p, _ in buckets.values())
    rows = []
    tp = fp = 0
    for b in sorted(buckets, reverse=True):
        pos, neg = buckets[b]
        tp += pos
        fp += neg
        fn = p_total - tp
        thr_lo = lo + (b * width + nb - 1) // nb
        prec = (2 * 10**6 * tp + (tp + fp)) // (2 * (tp + fp))
        rec = (2 * 10**6 * tp + (tp + fn)) // (2 * (tp + fn))
        rows.append((b, thr_lo, tp, fp, fn, prec, rec))
    return rows


class TestPrCurve:
    def test_matches_reference(self, spark):
        from qdrant_datafusion_spark.operators.classify import pr_curve

        points = [
            (-17, -1), (-5, -1), (-5, 1), (0, -1), (3, 1), (3, 1),
            (9, -1), (14, 1), (30, 1), (31, 1),
        ]
        df = spark.createDataFrame(points, "margin long, y long")
        got = [tuple(r) for r in pr_curve(df, n_buckets=4).collect()]
        assert got == _ref_pr(points, 4)

    def test_monotone_recall_and_counts(self, spark):
        from qdrant_datafusion_spark.operators.classify import pr_curve

        import random

        rng = random.Random(7)
        points = [
            (rng.randrange(-1000, 1000), rng.choice([-1, 1]))
            for _ in range(500)
        ]
        df = spark.createDataFrame(points, "margin long, y long")
        rows = pr_curve(df, n_buckets=16).collect()
        # descending thresholds: tp/fp cumulative, recall monotone up
        tps = [r["tp"] for r in rows]
        fps = [r["fp"] for r in rows]
        recs = [r["recall_ppm"] for r in rows]
        assert tps == sorted(tps) and fps == sorted(fps)
        assert recs == sorted(recs)
        assert rows[-1]["fn"] == 0 and rows[-1]["recall_ppm"] == 10**6
        assert tps[-1] + fps[-1] == 500
        assert got_matches_ref(points, rows)

    def test_empty_and_bad_args(self, spark):
        from qdrant_datafusion_spark.operators.classify import pr_curve

        df = spark.createDataFrame([], "margin long, y long")
        with pytest.raises(ValueError):
            pr_curve(df)
        one = spark.createDataFrame([(5, 1)], "margin long, y long")
        with pytest.raises(ValueError):
            pr_curve(one, n_buckets=0)


def got_matches_ref(points, rows):
    return [tuple(r) for r in rows] == _ref_pr(points, 16)


def test_pr_curve_all_negative_rejected(spark):
    # recall = tp/positives is undefined with zero positives — the
    # hypothesis sweep surfaced this as an ANSI DIVIDE_BY_ZERO
    from qdrant_datafusion_spark.operators.classify import pr_curve

    df = spark.createDataFrame([(1, -1), (5, -1)], "margin long, y long")
    with pytest.raises(ValueError, match="no positive labels"):
        pr_curve(df)
