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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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

    def simpleStreamReader(self, schema: StructType) -> "CollectionStreamReader":
        """``spark.readStream.format("qdrant_collection")`` — continuous
        ingestion from a growing collection directory.  The reference has
        no streaming at all (its scan is Boundedness::Bounded,
        src/table.rs:248-249); this is the additive live-ingest seam: an
        offset is the sorted fragment list already consumed, so each
        micro-batch reads exactly the new fragments (replayable between
        offsets for exactly-once sinks)."""
        return CollectionStreamReader(self.options.get("path"), schema)


class CollectionStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self._schema = schema
        self._fields = [f.name for f in schema.fields]

    def _fragments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.parquet")))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, frags: list[str]):
        # materialized (not a generator): Spark's prefetching cache copies
        # the returned iterator, which generators don't support
        import pyarrow.parquet as pq

        rows = []
        for f in frags:
            table = pq.read_table(f, columns=self._fields)
            for rec in table.to_pylist():
                rows.append(tuple(rec[name] for name in self._fields))
        return iter(rows)

    def read(self, start: dict):
        frags = self._fragments()
        new = [f for f in frags if f not in set(start.get("seen", []))]
        return self._rows_for(new), {"seen": frags}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: exactly the fragments that
        # arrived between the two offsets
        seen = set(start.get("seen", []))
        return self._rows_for([f for f in end.get("seen", []) if f not in seen])


def register_collection_source(spark) -> None:
    """Register the format on a session (once per session)."""
    spark.dataSource.register(CollectionDataSource)


def _descriptor_json_for(path: str) -> str | None:
    f = os.path.join(path, DESCRIPTOR_FILE)
    if os.path.exists(f):
        with open(f) as fh:
            return json.dumps(json.loads(fh.read()))
    return None
