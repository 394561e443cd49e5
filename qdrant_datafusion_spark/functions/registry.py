"""SQL registration — the analogue of the reference's
``register_json_udfs`` (src/udfs.rs:13-16): one call makes every V_*
function usable from ``spark.sql`` text.

Functions whose query argument is a *literal* (the corpus shape —
``V_SEARCH([0.1, 0.2])``) can't be plain UDFs without losing the native
codegen path, so registration works at two levels:

1. Column-level (``df.select(v_search(...))``) — always native; preferred.
2. SQL-level: lightweight wrappers registered via ``spark.udf.register``
   where the signature allows (scalar in → scalar out).  These are
   implemented as Arrow-batched pandas UDFs so SQL users still avoid
   row-at-a-time Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def register_all(spark: SparkSession) -> None:
    """Install SQL-callable versions of the V_* surface on this session."""

    @pandas_udf("double")
    def v_cosine(v: pd.Series, q: pd.Series) -> pd.Series:
        def one(a, b):
            if a is None or b is None:
                return None
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na == 0.0 or nb == 0.0:
                return math.nan
            return float(np.dot(a, b) / (na * nb))

        return pd.Series([one(a, b) for a, b in zip(v, q)], dtype="float64")

    @pandas_udf("double")
    def v_dot(v: pd.Series, q: pd.Series) -> pd.Series:
        def one(a, b):
            if a is None or b is None:
                return None
            return float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))

        return pd.Series([one(a, b) for a, b in zip(v, q)], dtype="float64")

    @pandas_udf("double")
    def v_euclid(v: pd.Series, q: pd.Series) -> pd.Series:
        def one(a, b):
            if a is None or b is None:
                return None
            d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
            return float(np.sqrt(np.dot(d, d)))

        return pd.Series([one(a, b) for a, b in zip(v, q)], dtype="float64")

    @pandas_udf("double")
    def v_sparse(ind: pd.Series, val: pd.Series, qind: pd.Series, qval: pd.Series) -> pd.Series:
        def one(i, v, qi, qv):
            if i is None or v is None or qi is None or qv is None:
                return None
            # coerce: SQL literals like array(1.0, 2.0) arrive as Decimals
            qmap = {int(ix): float(x) for ix, x in zip(qi, qv)}
            return float(sum(float(x) * qmap.get(int(ix), 0.0) for ix, x in zip(i, v)))

        return pd.Series(
            [one(*t) for t in zip(ind, val, qind, qval)], dtype="float64"
        )

    @pandas_udf("double")
    def v_maxsim(mv: pd.Series, q: pd.Series) -> pd.Series:
        def one(doc, query):
            if doc is None or query is None or len(doc) == 0:
                return None
            d = np.asarray([np.asarray(x, np.float64) for x in doc])
            qm = np.asarray([np.asarray(x, np.float64) for x in query])
            return float((qm @ d.T).max(axis=1).sum())

        return pd.Series([one(a, b) for a, b in zip(mv, q)], dtype="float64")

    # V_SEARCH is a Spark 4 SQL-defined function, not a Python UDF: the
    # body inlines into the plan (sequential fold, bit-identical to the
    # Column-level kernel in functions.distance), so SQL callers —
    # including correlated LATERAL subqueries — never cross the Python
    # boundary.  try_divide: zero vectors yield NULL under ANSI mode.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION V_SEARCH(
            v ARRAY<DOUBLE>, q ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN try_divide(
          aggregate(zip_with(v, q, (x, y) -> x * y),
                    CAST(0.0 AS DOUBLE), (a, x) -> a + x),
          sqrt(aggregate(zip_with(v, v, (x, y) -> x * y),
                         CAST(0.0 AS DOUBLE), (a, x) -> a + x))
          * sqrt(aggregate(zip_with(q, q, (x, y) -> x * y),
                           CAST(0.0 AS DOUBLE), (a, x) -> a + x)))
        """
    )
    spark.udf.register("V_COSINE", v_cosine)
    spark.udf.register("V_DOT", v_dot)
    spark.udf.register("V_EUCLID", v_euclid)
    spark.udf.register("V_SPARSE_SEARCH", v_sparse)
    spark.udf.register("V_COLBERT", v_maxsim)

    # V_RANDOM must be a (nondeterministic) Python UDF: SQL-defined
    # functions are rejected inside Sort, and ORDER BY V_RANDOM() is the
    # corpus's sampling idiom (tests/bin/tests.sql:310-320)
    import random as _random

    from pyspark.sql.functions import udf
    from pyspark.sql.types import DoubleType

    spark.udf.register(
        "V_RANDOM", udf(lambda: _random.random(), DoubleType()).asNondeterministic()
    )

    # the rest of the corpus surface as SQL-defined functions — every body
    # is pure built-in expression, so all of these inline into the plan
    for ddl in _SQL_FUNCTION_DDL:
        spark.sql(ddl)


#: SQL-defined functions completing the corpus's SQL-callable surface
#: (reference tests/bin/tests.sql): distance/radius predicates, JSON field
#: existence, text relevance, geo distance + gaussian decay, random order.
_SQL_FUNCTION_DDL = [
    # V_DISTANCE(v, q, metric): lower = closer (cosine -> 1 - similarity)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_DISTANCE(
        v ARRAY<DOUBLE>, q ARRAY<DOUBLE>, metric STRING)
    RETURNS DOUBLE
    RETURN CASE metric
      WHEN 'cosine' THEN 1.0 - try_divide(
        aggregate(zip_with(v, q, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x),
        sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))
        * sqrt(aggregate(zip_with(q, q, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)))
      WHEN 'dot' THEN -aggregate(zip_with(v, q, (x, y) -> x * y),
                                 CAST(0.0 AS DOUBLE), (a, x) -> a + x)
      WHEN 'euclid' THEN sqrt(aggregate(zip_with(v, q, (x, y) -> (x - y) * (x - y)),
                                        CAST(0.0 AS DOUBLE), (a, x) -> a + x))
      WHEN 'manhattan' THEN aggregate(zip_with(v, q, (x, y) -> abs(x - y)),
                                      CAST(0.0 AS DOUBLE), (a, x) -> a + x)
      ELSE CAST(NULL AS DOUBLE) END
    """,
    # V_FUSION(scores, method): the corpus's scalar fusion shape
    # (tests/bin/tests.sql:371; semantics match functions.fusion.v_fusion —
    # scalar 'rrf' sums reciprocal *scores*, true rank-RRF is rrf_fuse)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_FUSION(scores ARRAY<DOUBLE>, method STRING)
    RETURNS DOUBLE
    RETURN CASE method
      WHEN 'max' THEN array_max(scores)
      WHEN 'weighted_sum' THEN aggregate(scores, CAST(0.0 AS DOUBLE), (a, x) -> a + x)
      WHEN 'rrf' THEN aggregate(scores, CAST(0.0 AS DOUBLE),
                                (a, x) -> a + 1.0 / (60.0 + x))
      ELSE CAST(NULL AS DOUBLE) END
    """,
    # V_WITHIN(v, q, radius): euclid-radius predicate
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_WITHIN(
        v ARRAY<DOUBLE>, q ARRAY<DOUBLE>, radius DOUBLE)
    RETURNS BOOLEAN
    RETURN sqrt(aggregate(zip_with(v, q, (x, y) -> (x - y) * (x - y)),
                          CAST(0.0 AS DOUBLE), (a, x) -> a + x)) < radius
    """,
    # HAS_FIELD(payload_json, field)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION HAS_FIELD(payload STRING, field STRING)
    RETURNS BOOLEAN
    RETURN get_json_object(payload, concat('$.', field)) IS NOT NULL
    """,
    # MATCH_TEXT(text, query): token-exact term-overlap relevance in [0,1]
    """
    CREATE OR REPLACE TEMPORARY FUNCTION MATCH_TEXT(text STRING, query STRING)
    RETURNS DOUBLE
    RETURN try_divide(
      CAST(size(array_intersect(
        filter(split(lower(trim(text)), '\\\\s+'), x -> x != ''),
        filter(split(lower(trim(query)), '\\\\s+'), x -> x != ''))) AS DOUBLE),
      CAST(size(array_distinct(
        filter(split(lower(trim(query)), '\\\\s+'), x -> x != ''))) AS DOUBLE))
    """,
    # V_GEO_DISTANCE(lat1, lon1, lat2, lon2): haversine meters
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_GEO_DISTANCE(
        lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
    RETURNS DOUBLE
    RETURN 2.0 * 6371000.0 * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2)
      + cos(radians(lat1)) * cos(radians(lat2))
        * pow(sin(radians(lon2 - lon1) / 2), 2)))
    """,
    # V_GAUSS_DECAY(distance, scale) -> (0, 1]
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_GAUSS_DECAY(d DOUBLE, scale DOUBLE)
    RETURNS DOUBLE
    RETURN exp(-(d * d) / (2.0 * scale * scale))
    """,
    # V_MEAN_VEC: elementwise mean of a vector list (NULL/empty -> NULL)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_MEAN_VEC(vs ARRAY<ARRAY<DOUBLE>>)
    RETURNS ARRAY<DOUBLE>
    RETURN CASE WHEN vs IS NULL OR size(vs) = 0 THEN CAST(NULL AS ARRAY<DOUBLE>)
    ELSE transform(
      aggregate(vs, transform(element_at(vs, 1), x -> CAST(0.0 AS DOUBLE)),
                (acc, p) -> zip_with(acc, p, (a, b) -> a + b)),
      x -> x / CAST(size(vs) AS DOUBLE))
    END
    """,
    # V_RECOMMEND(v, positives, negatives): cosine vs avg(pos) - avg(neg);
    # NULL/empty negatives tolerated (edge case tests/bin/tests.sql:395-398)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_RECOMMEND(
        v ARRAY<DOUBLE>, pos ARRAY<ARRAY<DOUBLE>>, neg ARRAY<ARRAY<DOUBLE>>)
    RETURNS DOUBLE
    RETURN V_SEARCH(v,
      CASE WHEN V_MEAN_VEC(neg) IS NULL THEN V_MEAN_VEC(pos)
           ELSE zip_with(V_MEAN_VEC(pos), V_MEAN_VEC(neg), (a, b) -> a - b) END)
    """,
    # V_DISCOVER(v, target, ctx_vectors, ctx_weights): cosine vs
    # target + SUM w_i * ctx_i  (tests/bin/tests.sql:121-137)
    """
    CREATE OR REPLACE TEMPORARY FUNCTION V_DISCOVER(
        v ARRAY<DOUBLE>, target ARRAY<DOUBLE>,
        ctxs ARRAY<ARRAY<DOUBLE>>, ws ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN V_SEARCH(v,
      CASE WHEN ctxs IS NULL OR size(ctxs) = 0 THEN target
      ELSE aggregate(arrays_zip(ctxs, ws), target,
                     (acc, e) -> zip_with(acc, e.ctxs, (a, b) -> a + e.ws * b))
      END)
    """,
]
