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
            qmap = dict(zip(qi, qv))
            return float(sum(float(x) * qmap.get(ix, 0.0) for ix, x in zip(i, v)))

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
