"""Char-n-gram language identification (fastText-style profile model).

Beyond-reference pipeline surface (the reference engine has no text
classification): a multinomial Naive-Bayes classifier over character
n-grams — the shape of fastText's langid / CLD2-style profile models —
trained distributed and applied as pure native expressions.

Cross-engine exactness: all weights are fixed-point integers through the
tokenizer family's ``Q(x) = floor(ln(x)·1e6 + 0.5)`` (``tokenizer._qlog``
with its boundary guard), so scores are BIGINT sums and the argmax is
bit-identical on Spark, DuckDB, and Python — no float comparison anywhere.

Scale shape (100 TB story):

- **training** is ONE shuffle: explode docs to (lang, ngram) instances
  and groupBy-count — linear in corpus characters with map-side combine;
  the feature selection (global top-K ngrams) and the K×L weight table
  are bounded driver state by construction (like the tokenizer's merge
  table), NOT proportional to data size;
- **apply** is one broadcast join + one partially-aggregated groupBy:
  explode each document's n-grams, broadcast-join the K-row weight
  table (K ≤ a few hundred — always broadcastable), and sum the L
  weight lanes per document with map-side combine, so the shuffle
  carries one L-long row per document per input partition — linear in
  documents, not in characters.  The argmax is a static chain of
  ``when`` comparisons over L plain columns.  (A zero-shuffle
  literal-map fold was measured first and rejected: Catalyst evaluates
  a ``create_map`` of 2K literals per *array element* inside a lambda,
  which is O(chars × K) map builds — ~50× slower than the join at
  sf0.01 and worse with scale.)  No Python in either path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_datafusion_spark.session import fan_out

from .tokenizer import _qlog

__all__ = ["LangNgramModel", "lang_id_ngram", "train_lang_ngram"]

#: whitespace class shared with the tokenizer family (Java \s == this
#: set; RE2/DuckDB \s lacks \x0b)
_WS = "[ \\t\\n\\r\\f\\x0b]+"


@dataclass(frozen=True)
class LangNgramModel:
    """A trained profile model: per-language integer prior and per-
    (language, feature-ngram) integer log-likelihood weights."""

    n: int
    langs: tuple[str, ...]  # ascending — the tie-break order
    priors: dict[str, int]
    weights: dict[str, dict[str, int]]  # lang -> ngram -> Q-weight


def _norm(text_col) -> Column:
    """Lowercase + collapse whitespace runs to single spaces — the
    shared normalization both engines apply before n-gram extraction."""
    return F.regexp_replace(F.lower(F.col(text_col)), _WS, " ")


def _ngrams(norm: Column, n: int) -> Column:
    """All char n-grams of a normalized text, with multiplicity.

    One ``regexp_extract_all`` lookahead pass (``(?=(.{n})).`` — the
    capture peeks n chars, the dot advances one position, so every
    overlapping n-gram is emitted in order): a single C regex walk per
    document instead of a ``transform(sequence(...), substring)``
    higher-order function, which evaluates one interpreted substring
    call per character (guide §4.1 — HOFs are not codegen'd; measured
    3.7× on the sf0.1 explode, bit-identical output).  ``(?s)`` keeps
    the dot matching any residual control chars the whitespace collapse
    leaves behind."""
    length = F.length(norm)
    return F.when(
        length >= n,
        F.regexp_extract_all(norm, F.lit(f"(?s)(?=(.{{{n}}}))."), 1),
    ).otherwise(F.array().cast("array<string>"))


def train_lang_ngram(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    top_k: int = 200,
) -> LangNgramModel:
    """Train the profile model on a labelled corpus.

    One explode + groupBy over (lang, ngram) counts every n-gram
    occurrence (map-side combine keeps the shuffle ~|distinct ngrams|);
    the global top-``top_k`` n-grams (count DESC, ngram ASC — fully
    deterministic) become the feature set, and the Laplace-smoothed
    weight is ``Q(cnt[l,g] + 1) − Q(tot[l] + top_k)`` with the prior
    ``Q(docs[l]) − Q(docs_total)``.  Collected state is K×L weights plus
    L priors — bounded by construction.
    """
    # fan_out BEFORE the normalize+explode: the whole n-gram walk and the
    # map-side combine otherwise run inside the one-task scan stage of a
    # single-row-group file (session.fan_out — no-op with real splits);
    # keyed on the text itself (unique-ish, deterministic under retries)
    ng = (
        fan_out(
            df.select(
                F.col(label_col).alias("_l"), F.col(text_col).alias("_raw")
            ).where(F.col("_l").isNotNull()),
            "_raw",
        )
        .select("_l", _norm("_raw").alias("_t"))
        .select("_l", F.explode(_ngrams(F.col("_t"), n)).alias("_g"))
    )
    # ONE corpus pass: the explode+groupBy result is bounded by
    # |langs| x |distinct n-grams|, so pin it once and derive both the
    # feature top-k and the per-(lang, feature) weights from the pinned
    # table instead of re-scanning the corpus for each collect
    counts = (
        ng.groupBy("_l", "_g")
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    feat = [
        r["_g"]
        for r in counts.groupBy("_g")
        .agg(F.sum("_c").alias("_tc"))
        .orderBy(F.desc("_tc"), F.asc("_g"))
        .limit(top_k)
        .collect()  # bounded: top_k rows
    ]
    feat_set = set(feat)
    lang_counts = {
        (r["_l"], r["_g"]): int(r["_c"])
        for r in counts.where(F.col("_g").isin(feat)).collect()
        # bounded: at most top_k × n_langs rows
    }
    doc_counts = {
        r["_l"]: int(r["_n"])
        for r in df.where(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("_l"))
        .agg(F.count("*").alias("_n"))
        .collect()  # bounded: n_langs rows
    }
    langs = tuple(sorted(doc_counts))
    total_docs = sum(doc_counts.values())
    priors = {
        lang: _qlog(doc_counts[lang]) - _qlog(total_docs) for lang in langs
    }
    weights: dict[str, dict[str, int]] = {}
    for lang in langs:
        tot = sum(
            c for (lg, _g), c in lang_counts.items() if lg == lang
        )
        denom = _qlog(tot + top_k)
        weights[lang] = {
            g: _qlog(lang_counts.get((lang, g), 0) + 1) - denom
            for g in feat_set
        }
    return LangNgramModel(n=n, langs=langs, priors=priors, weights=weights)


def lang_id_ngram(
    df: DataFrame,
    model: LangNgramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pred_lang",
) -> DataFrame:
    """Classify every row: argmax over languages of
    ``prior[l] + Σ_g weight[l][g]`` summed over the row's n-gram
    *occurrences* (multiplicity counts), ties broken by language
    ascending.  Returns ``df`` plus ``out_col``; rows whose ``id_col``
    is unique (the operator contract) classify independently.
    """
    if not model.langs:
        return df.withColumn(out_col, F.lit(None).cast("string"))
    spark = df.sparkSession
    langs = model.langs
    feats = sorted(model.weights[langs[0]])
    wdf = spark.createDataFrame(
        [(g, [model.weights[lang][g] for lang in langs]) for g in feats],
        "_g string, _w array<long>",
    )
    # materialize the normalized text behind a projection boundary BEFORE
    # the n-gram transform: inlined, the non-cheap regexp_replace+lower is
    # re-evaluated per array ELEMENT inside the lambda (O(len^2) regex work
    # per doc — measured 7x slower at sf0.1).  CollapseProject keeps the
    # boundary because the alias is multiply-referenced and non-cheap.
    # fan_out first (same rationale as train_lang_ngram; keyed on the id,
    # which the groupBy below then reuses as its shuffle key)
    ex = fan_out(
        df.select(F.col(id_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col), _norm(text_col).alias("_t")
    ).select(
        F.col(id_col),
        F.explode_outer(_ngrams(F.col("_t"), model.n)).alias("_g"),
    )
    sums = (
        ex.join(F.broadcast(wdf), "_g", "left")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.element_at("_w", i + 1)).alias(f"_s{i}")
                for i in range(len(langs))
            ]
        )
    )
    scores: list[tuple[str, Column]] = [
        (
            lang,
            F.lit(model.priors[lang]).cast("long")
            + F.coalesce(F.col(f"_s{i}"), F.lit(0)),
        )
        for i, lang in enumerate(langs)
    ]
    # static argmax chain: strict > keeps the earlier (ascending) lang
    # on ties — identical to ORDER BY score DESC, lang ASC LIMIT 1
    best_lang: Column = F.lit(scores[0][0])
    best_score: Column = scores[0][1]
    for lang, s in scores[1:]:
        gt = s > best_score
        best_lang = F.when(gt, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(gt, s).otherwise(best_score)
    pred = sums.select(F.col(id_col), best_lang.alias(out_col))
    return df.join(pred, id_col, "left")
