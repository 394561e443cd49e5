"""Composite-query search — ``V_RECOMMEND`` and ``V_DISCOVER``
(reference tests/bin/tests.sql:83-137, 395-398; README roadmap
"similarity/recommend/discover UDFs", README.md:150).

These are Tier C in the reference (declared, never implemented), so the
semantics here follow Qdrant's documented behavior:

- recommend (average_vector strategy): build one composite query
  ``avg(positives) - avg(negatives)``, score every point against it with
  the collection metric, and *exclude the example points* from results.
- discover: target vector plus weighted context vectors combined into a
  composite ``target + Σ w_i * ctx_i``.

Example vectors given *by id* are resolved against the collection itself.
For a handful of ids (the corpus shape) the engine collects just those rows
(a pushed-down ``id IN (...)`` Parquet scan) and folds them into a literal
composite on the driver — the scored scan is then a single pass with a
native kernel and zero joins.  ``*_df`` variants accept a DataFrame of
examples for the many-examples case (aggregated distributed, then a tiny
collect of one composite vector).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.distance import v_search


def _mean_vectors(vectors: list[list[float]]) -> list[float] | None:
    if not vectors:
        return None
    dim = len(vectors[0])
    acc = [0.0] * dim
    for v in vectors:
        for i, x in enumerate(v):
            acc[i] += float(x)
    return [x / len(vectors) for x in acc]


def resolve_vectors_by_id(
    collection: DataFrame,
    ids: Sequence[str],
    vector_col: str,
    id_col: str = "id",
) -> list[list[float]]:
    """Fetch the vectors of specific points.  The ``isin`` filter pushes to
    the Parquet scan (id IN (...) row-group pruning); only ``vector_col`` is
    read (column pruning)."""
    if not ids:
        return []
    rows = (
        collection.filter(F.col(id_col).isin(list(ids)))
        .select(vector_col)
        .collect()
    )
    return [list(r[0]) for r in rows if r[0] is not None]


def recommend_composite(
    positives: list[list[float]], negatives: list[list[float]]
) -> list[float]:
    """avg(pos) - avg(neg); with no negatives, just avg(pos)."""
    pos = _mean_vectors(positives)
    if pos is None:
        raise ValueError("V_RECOMMEND requires at least one positive example")
    neg = _mean_vectors(negatives)
    if neg is None:
        return pos
    return [p - n for p, n in zip(pos, neg)]


def v_recommend(
    vector: Column | str,
    positives: Sequence[Sequence[float]],
    negatives: Sequence[Sequence[float]] = (),
    metric: str = "cosine",
) -> Column:
    """Recommendation score from literal positive/negative example vectors
    (the vector-literal corpus variants, tests/bin/tests.sql:100-114).
    NULL negative lists are tolerated (edge case tests/bin/tests.sql:395-398)."""
    composite = recommend_composite(
        [list(map(float, p)) for p in positives],
        [list(map(float, n)) for n in (negatives or ())],
    )
    return v_search(vector, composite, metric)


def recommend_by_ids(
    collection: DataFrame,
    vector_col: str,
    positive_ids: Sequence[str],
    negative_ids: Sequence[str] = (),
    metric: str = "cosine",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """``V_RECOMMEND('id1','id2',...)`` — by-id variant
    (tests/bin/tests.sql:83-98).  Resolves example ids → vectors, scores the
    collection against the composite, and excludes the examples (Qdrant
    documented behavior)."""
    pos = resolve_vectors_by_id(collection, positive_ids, vector_col, id_col)
    neg = resolve_vectors_by_id(collection, negative_ids, vector_col, id_col)
    if not pos:
        raise ValueError(f"positive ids {list(positive_ids)!r} resolved no vectors")
    composite = recommend_composite(pos, neg)
    excluded = list(positive_ids) + list(negative_ids)
    return collection.filter(~F.col(id_col).isin(excluded)).withColumn(
        score_col, v_search(F.col(vector_col), composite, metric)
    )


def discover_composite(
    target: Sequence[float], context: Sequence[tuple[Sequence[float], float]]
) -> list[float]:
    """target + Σ w_i * ctx_i."""
    out = [float(x) for x in target]
    for vec, w in context:
        for i, x in enumerate(vec):
            out[i] += float(w) * float(x)
    return out


def v_discover(
    vector: Column | str,
    target: Sequence[float],
    context: Sequence[tuple[Sequence[float], float]] = (),
    metric: str = "cosine",
) -> Column:
    """Discovery score — target vector plus weighted context pairs
    (tests/bin/tests.sql:121-137)."""
    return v_search(vector, discover_composite(target, context), metric)


def discover_by_ids(
    collection: DataFrame,
    vector_col: str,
    target: Sequence[float],
    context_ids: Sequence[tuple[str, float]],
    metric: str = "cosine",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """By-id discover: context pairs are (point_id, weight)."""
    ids = [i for i, _ in context_ids]
    weights = dict(context_ids)
    rows = (
        collection.filter(F.col(id_col).isin(ids))
        .select(id_col, vector_col)
        .collect()
    )
    context = [(list(r[1]), weights[r[0]]) for r in rows if r[1] is not None]
    composite = discover_composite(target, context)
    return collection.filter(~F.col(id_col).isin(ids)).withColumn(
        score_col, v_search(F.col(vector_col), composite, metric)
    )
