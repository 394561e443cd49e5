"""Dense-vector distance kernels — pure native Column expressions.

These realize the reference's planned ``V_SEARCH`` / ``V_DISTANCE`` /
``V_WITHIN`` UDF surface (reference tests/bin/tests.sql:10-51) with
JVM-side higher-order functions (``zip_with`` + ``aggregate``) so the hot
path stays inside WholeStageCodegen — no Python boundary at all.  A NULL
vector yields a NULL score, never an error, matching the reference's
all-vector-columns-nullable schema rule (src/arrow/schema.rs:44,50) and the
e2e mostly-null-column behavior (tests/e2e.rs:311-320).

Metrics mirror Qdrant's configured distances (Cosine / Dot / Euclid, plus
Manhattan) — collection-configured per field (reference tests/e2e.rs:127-148);
``v_search`` accepts an explicit metric or a CollectionDescriptor lookup.

Scale note: each kernel is O(dim) per row, fully distributed, no shuffle.
Top-k over a scored column compiles to TakeOrderedAndProject (no global
sort materialization) — verified in tests/test_plans.py.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str
VectorLike = "Column | Sequence[float] | str"


def _as_col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_vec(v) -> Column:
    """Accept a Column, a column name, or a Python list literal as a vector.

    Literal vectors build through ONE ``F.expr`` call instead of one
    ``F.lit`` py4j roundtrip per element (~80ms of driver time per
    64-dim literal, paid 2-3x per kernel via the q reuse in cosine —
    guide §7.3 planning cost).  ``CAST('<repr>' AS DOUBLE)`` parses via
    Double.parseDouble, which round-trips Python float repr bit-exactly
    (verified against the F.lit path element-for-element)."""
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    xs = [float(x) for x in v]
    if xs and all(math.isfinite(x) for x in xs):
        return F.expr(
            "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in xs) + ")"
        )
    return F.array(*[F.lit(x) for x in xs])


def _fsum(arr: Column) -> Column:
    """Sum an array<numeric> into a double, preserving NULL arrays."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def _dmul(a: Column, b: Column) -> Column:
    # multiply in double, not float32: float32 products carry ~1e-8 relative
    # error, enough to flip rounded values against a double-precision oracle
    return a.cast("double") * b.cast("double")


def dot_product(v: VectorLike, q: VectorLike) -> Column:
    """Elementwise dot product of two array<float> columns/literals."""
    return _fsum(F.zip_with(_as_vec(v), _as_vec(q), _dmul))


def norm(v: VectorLike) -> Column:
    """L2 norm."""
    vec = _as_vec(v)
    return F.sqrt(_fsum(F.zip_with(vec, vec, _dmul)))


def cosine_similarity(v: VectorLike, q: VectorLike) -> Column:
    # try_divide: a zero vector yields NULL, not an ANSI divide-by-zero
    # error (Spark 4 runs ANSI mode by default)
    return F.try_divide(dot_product(v, q), norm(v) * norm(q))


def euclid_distance(v: VectorLike, q: VectorLike) -> Column:
    return F.sqrt(
        _fsum(
            F.zip_with(
                _as_vec(v),
                _as_vec(q),
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            )
        )
    )


def manhattan_distance(v: VectorLike, q: VectorLike) -> Column:
    return _fsum(
        F.zip_with(
            _as_vec(v), _as_vec(q), lambda a, b: F.abs(a.cast("double") - b.cast("double"))
        )
    )


_SIMILARITY = {
    # metric -> (score expression, higher_is_better)
    "cosine": (cosine_similarity, True),
    "dot": (dot_product, True),
    "euclid": (euclid_distance, False),
    "manhattan": (manhattan_distance, False),
}


def v_search(
    vector: VectorLike,
    query: VectorLike,
    metric: str = "cosine",
    descriptor=None,
    field: str | None = None,
) -> Column:
    """Similarity *score* of each row's vector against a query vector —
    the reference's ``V_SEARCH`` (tests/bin/tests.sql:10-35).

    Scores follow Qdrant convention: higher is better for every metric, so
    distance metrics are negated (``ORDER BY score DESC LIMIT k`` is always
    the top-k idiom).  If ``descriptor`` is given the metric comes from the
    collection config for ``field`` (reference behavior: metric is
    collection-configured, tests/e2e.rs:127-148).
    """
    if descriptor is not None:
        metric = descriptor.metric_for(field)
    fn, higher = _SIMILARITY[metric]
    score = fn(vector, query)
    return score if higher else -score


def v_distance(vector: VectorLike, query: VectorLike, metric: str = "cosine") -> Column:
    """Explicit-metric *distance* (lower = closer) — ``V_DISTANCE``
    (tests/bin/tests.sql:42-45).  For cosine this is 1 - similarity."""
    if metric == "cosine":
        return F.lit(1.0) - cosine_similarity(vector, query)
    if metric == "dot":
        return -dot_product(vector, query)
    if metric == "euclid":
        return euclid_distance(vector, query)
    if metric == "manhattan":
        return manhattan_distance(vector, query)
    raise ValueError(f"unknown metric {metric!r}")


def v_within(
    vector: VectorLike, query: VectorLike, radius: float, metric: str = "euclid"
) -> Column:
    """Radius predicate — ``V_WITHIN`` (tests/bin/tests.sql:48-51)."""
    return v_distance(vector, query, metric) < F.lit(float(radius))


def v_random(seed: int | None = None) -> Column:
    """Random ordering value — ``V_RANDOM`` (tests/bin/tests.sql:310-320).
    ``df.orderBy(v_random(42)).limit(n)`` gives deterministic sampling."""
    return F.rand(seed) if seed is not None else F.rand()
