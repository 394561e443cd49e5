"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  - flagship query smoke check on sf0.001
queries()     - every implemented operator from SURVEY.md §2 (+ the
                training-data pipeline extensions) as (spark, sf_dir) -> DF
oracle_sql()  - matching DuckDB SQL for the correctness gate

Implementations live in qdrant_datafusion_spark.entry_queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid dense+sparse RRF fusion (the reference's
    north-star query shape, tests/bin/tests.sql:350-383) at sf0.001."""
    from qdrant_datafusion_spark.entry_queries import v_fusion_hybrid

    return v_fusion_hybrid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from qdrant_datafusion_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from qdrant_datafusion_spark.entry_queries import ORACLES

    return dict(ORACLES)
