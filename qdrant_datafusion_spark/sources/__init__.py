"""Custom sources.

``collection_source`` implements the PySpark 4 Python Data Source API for
collection directories — the structural analogue of the reference's
``QdrantTableProvider`` (reference src/table.rs:123-184): schema from the
collection descriptor, partitioned scan, and a live-endpoint seam where a
gRPC client would plug in.
"""

from qdrant_datafusion_spark.sources.collection_source import (  # noqa: F401
    CollectionDataSource,
    register_collection_source,
)
