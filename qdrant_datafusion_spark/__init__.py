"""qdrant_datafusion_spark — a PySpark-native analytics engine with the
capabilities of the GeorgeLeePatterson/qdrant-datafusion reference.

The reference (Rust, ~1,450 LoC) exposes a Qdrant vector collection as a
DataFusion SQL table and inherits the relational surface from the engine
(see /root/reference/src/table.rs:157-184 for the provider scan).  Here
Spark SQL / Catalyst plays DataFusion's role: collections are Parquet-backed
DataFrames registered in the catalog, every V_* vector-search function from
the reference's planned surface (reference tests/bin/tests.sql) is a native
Column expression (JVM-side, codegen'd) or an Arrow-vectorized pandas UDF,
and the relational surface (filter/join/agg/window/setop) comes from
Catalyst — with *more* optimization than the reference (filter pushdown,
multi-partition scans, AQE).

Layout:
  session      - tuned SparkSession builder
  collections  - collection descriptor + Parquet-backed load/register/write
  fixtures     - the reference's e2e test collections as deterministic DataFrames
  functions/   - V_* kernels (search, distance, sparse, multivector, fusion,
                 recommend/discover, JSON payload, text, geo)
  operators/   - composed operators (top-k search, batch search, dedup,
                 ANN, multimodal plumbing)
  streaming/   - Structured Streaming ingestion & windowed aggregation
  sources/     - PySpark Python Data Source for collection directories
"""

__version__ = "0.1.0"

from qdrant_datafusion_spark.session import get_spark  # noqa: F401
