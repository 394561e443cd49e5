"""Wire-format deserialization parity with reference deserialize.rs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.collections import CollectionDescriptor, VectorField
from qdrant_datafusion_spark.sources.wire import (
    convert_to_multi_vector,
    points_to_dataframe,
    vector_from_output,
    vector_lookup,
)


class TestVectorNormalization:
    """Mirrors the reference's own unit tests (deserialize.rs:343-423)."""

    def test_multi_vector_split_and_error(self):
        assert convert_to_multi_vector([1.0, 2.0, 3.0, 4.0], 2) == [
            [1.0, 2.0],
            [3.0, 4.0],
        ]
        with pytest.raises(ValueError, match="not .*divisible"):
            convert_to_multi_vector([1.0, 2.0, 3.0], 2)

    def test_current_format_precedence(self):
        # current-format fields win even when deprecated fields are set
        dense = {"vector": {"dense": {"data": [1.0, 2.0, 3.0]}}, "data": [9.9]}
        assert vector_from_output(dense) == ("dense", [1.0, 2.0, 3.0])
        sparse = {"vector": {"sparse": {"indices": [0, 2, 5], "values": [0.1, 0.2, 0.3]}}}
        assert vector_from_output(sparse) == ("sparse", ([0, 2, 5], [0.1, 0.2, 0.3]))
        multi = {
            "vector": {
                "multi_dense": {"vectors": [{"data": [1.0, 2.0]}, {"data": [3.0, 4.0]}]}
            }
        }
        assert vector_from_output(multi) == ("multi", [[1.0, 2.0], [3.0, 4.0]])

    def test_deprecated_format_fallbacks(self):
        assert vector_from_output({"data": [1.0, 2.0, 3.0, 4.0], "vectors_count": 2}) == (
            "multi",
            [[1.0, 2.0], [3.0, 4.0]],
        )
        assert vector_from_output(
            {"data": [0.5, 0.7], "indices": {"data": [3, 8]}}
        ) == ("sparse", ([3, 8], [0.5, 0.7]))
        assert vector_from_output({"data": [1.0, 2.0]}) == ("dense", [1.0, 2.0])
        assert vector_from_output({"data": []}) is None
        assert vector_from_output(None) is None

    def test_unnamed_keys_under_vector(self):
        lk = vector_lookup({"vector": {"data": [1.0]}})
        assert set(lk) == {"vector"} and lk["vector"] == ("dense", [1.0])
        lk = vector_lookup(
            {"vectors": {"text": {"data": [1.0]}, "img": {"data": [2.0]}}}
        )
        assert set(lk) == {"text", "img"}


class TestSchemaDrivenExtraction:
    DESC = CollectionDescriptor(
        "wire_all_kinds",
        (
            VectorField("dense_vec", 3, "cosine", "dense"),
            VectorField("sparse_vec", 0, "dot", "sparse"),
            VectorField("multi_vec", 2, "dot", "multi"),
        ),
    )

    POINTS = [
        {
            "id": {"num": 7},
            "payload": {"city": "berlin", "score": 3},
            "vectors": {
                "vectors": {
                    "dense_vec": {"vector": {"dense": {"data": [1.0, 2.0, 3.0]}}},
                    "sparse_vec": {
                        "vector": {"sparse": {"indices": [1, 4], "values": [0.5, 0.25]}}
                    },
                    "multi_vec": {"data": [1.0, 2.0, 3.0, 4.0], "vectors_count": 2},
                }
            },
        },
        {
            "id": {"uuid": "ab-12"},
            "payload": {},
            "vectors": {"vectors": {"dense_vec": {"data": [9.0, 8.0, 7.0]}}},
        },
        {"id": {}, "payload": None, "vectors": None},
    ]

    def test_rows_match_schema_and_reference_semantics(self, spark):
        df = points_to_dataframe(spark, self.POINTS, self.DESC.schema())
        rows = df.collect()
        assert df.columns == [
            "id",
            "payload",
            "dense_vec",
            "sparse_vec_indices",
            "sparse_vec_values",
            "multi_vec",
        ]
        by_id = {r.id: r for r in rows}
        full = by_id["7"]  # numeric id renders as string
        assert full.payload == '{"city": "berlin", "score": 3}'
        assert full.dense_vec == [1.0, 2.0, 3.0]
        assert full.sparse_vec_indices == [1, 4]
        assert full.sparse_vec_values == [0.5, 0.25]
        assert full.multi_vec == [[1.0, 2.0], [3.0, 4.0]]  # deprecated split
        assert by_id["ab-12"].payload is None  # empty payload → null
        assert by_id["ab-12"].multi_vec is None  # missing vector → null
        assert by_id[""].dense_vec is None  # id message with no options → ""

    def test_missing_id_coerces_to_sentinel(self, spark):
        # id is non-nullable in the schema (schema.rs:61); a point with no
        # id message still deserializes, with the "" sentinel
        df = points_to_dataframe(spark, [{}], self.DESC.schema())
        assert df.collect()[0].id == ""

    def test_kind_mismatch_is_null_not_garbage(self, spark):
        # a dense vector arriving under a multi-typed field must not leak
        points = [
            {
                "id": {"num": 1},
                "vectors": {"vectors": {"multi_vec": {"data": [1.0, 2.0]}}},
            }
        ]
        df = points_to_dataframe(spark, points, self.DESC.schema())
        assert df.collect()[0].multi_vec is None

    def test_deserialized_points_are_queryable(self, spark):
        """End of the seam: wire points land queryable by the search stack."""
        from qdrant_datafusion_spark.functions.distance import v_search

        desc = CollectionDescriptor(
            "wire_q", (VectorField("emb", 3, "cosine", "dense"),)
        )
        points = [
            {"id": {"num": i}, "payload": {"k": i}, "vectors": {"vectors": {"emb": {"data": [float(i), 1.0, 0.0]}}}}
            for i in range(1, 6)
        ]
        df = points_to_dataframe(spark, points, desc.schema())
        top = (
            df.select("id", v_search("emb", [1.0, 1.0, 0.0], "cosine").alias("score"))
            .orderBy(F.desc("score"), "id")
            .limit(1)
            .collect()
        )
        assert top[0].id == "1"  # [1,1,0] is the exact query direction


class TestConnectorRoundTrip:
    """The full seam, end to end: Catalyst's pruned schema builds the
    outbound request (sources.request), a mock server answers with
    wire-shaped points honoring the request's selectors and limit, and
    the response deserializes (sources.wire) into exactly the pruned
    schema — what a live gRPC connector does per page inside
    DataSourceReader.read."""

    DESC = CollectionDescriptor(
        "rt",
        (
            VectorField("text_emb", 2, "cosine", "dense"),
            VectorField("sparse_f", 0, "dot", "sparse"),
        ),
    )

    STORE = [
        {
            "id": {"num": i},
            "payload": {"rank": i},
            "vectors": {
                "vectors": {
                    "text_emb": {"vector": {"dense": {"data": [float(i), 1.0]}}},
                    "sparse_f": {
                        "vector": {"sparse": {"indices": [i], "values": [0.5]}}
                    },
                }
            },
        }
        for i in range(10)
    ]

    @staticmethod
    def _mock_server(store, request):
        """Answer a QueryPoints request the way the wire contract
        specifies: honor limit and the with_vectors/with_payload
        selectors (drop what wasn't asked for)."""
        out = []
        for p in store[: request.get("limit", len(store))]:
            q = {"id": p["id"]}
            if request["with_payload"]:
                q["payload"] = p["payload"]
            wv = request["with_vectors"]
            if wv is True:
                q["vectors"] = p["vectors"]
            elif isinstance(wv, dict):
                kept = {
                    n: vo
                    for n, vo in p["vectors"]["vectors"].items()
                    if n in wv["names"]
                }
                q["vectors"] = {"vectors": kept}
            out.append(q)
        return out

    def test_pruned_scan_round_trips(self, spark):
        from pyspark.sql.types import StructType

        from qdrant_datafusion_spark.sources.request import build_query_request
        from qdrant_datafusion_spark.sources.wire import points_to_dataframe

        full = self.DESC.schema()
        pruned = StructType(
            [f for f in full.fields if f.name in ("id", "text_emb")]
        )
        request, rejected = build_query_request("rt", pruned, limit=4)
        assert rejected == []
        assert request["with_vectors"] == {"names": ["text_emb"]}
        assert request["with_payload"] is False

        points = self._mock_server(self.STORE, request)
        df = points_to_dataframe(spark, points, pruned)
        rows = df.collect()
        # exactly the pruned columns, exactly the limit, right values
        assert df.columns == ["id", "text_emb"] and len(rows) == 4
        assert rows[2].id == "2" and rows[2].text_emb == [2.0, 1.0]
        # the server dropped the sparse vector: a re-request with the full
        # schema fetches it (proving the selector actually narrowed IO)
        full_req, _ = build_query_request("rt", full)
        full_points = self._mock_server(self.STORE, full_req)
        assert "sparse_f" in full_points[0]["vectors"]["vectors"]
        assert "sparse_f" not in points[0]["vectors"]["vectors"]
