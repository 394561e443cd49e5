"""Remote request construction parity with reference utils.rs/table.rs."""

from __future__ import annotations

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    StringContains,
)

from qdrant_datafusion_spark.collections import CollectionDescriptor, VectorField
from qdrant_datafusion_spark.sources.request import (
    build_payload_selector,
    build_query_request,
    build_vector_selector,
)

_DESC = CollectionDescriptor(
    "req",
    (
        VectorField("text_emb", 3, "cosine", "dense"),
        VectorField("img_emb", 3, "dot", "dense"),
        VectorField("sparse_f", 0, "dot", "sparse"),
    ),
)
_UNNAMED = CollectionDescriptor(
    "req_u", (VectorField("vector", 3, "cosine", "dense"),), unnamed=True
)


def _project(schema, *names):
    from pyspark.sql.types import StructType

    return StructType([f for f in schema.fields if f.name in names])


class TestSelectors:
    """Mirrors the utils.rs doc examples (utils.rs:38-52)."""

    def test_metadata_only_fetches_no_vectors(self):
        schema = _project(_DESC.schema(), "id", "payload")
        assert build_vector_selector(schema) is False

    def test_unnamed_collection_fetches_all(self):
        assert build_vector_selector(_UNNAMED.schema()) is True

    def test_named_projection_lists_names(self):
        schema = _project(_DESC.schema(), "id", "text_emb")
        assert build_vector_selector(schema) == ["text_emb"]

    def test_sparse_pair_collapses_to_base_name(self):
        schema = _project(_DESC.schema(), "sparse_f_indices", "sparse_f_values")
        assert build_vector_selector(schema) == ["sparse_f"]

    def test_payload_flag_tracks_projection(self):
        assert build_payload_selector(_DESC.schema()) is True
        assert not build_payload_selector(_project(_DESC.schema(), "id", "text_emb"))


class TestQueryRequest:
    def test_projected_limited_request(self):
        schema = _project(_DESC.schema(), "id", "text_emb")
        req, rejected = build_query_request("req", schema, limit=25)
        assert req == {
            "collection_name": "req",
            "with_vectors": {"names": ["text_emb"]},
            "with_payload": False,
            "limit": 25,
        }
        assert rejected == []

    def test_filters_translate_and_merge(self):
        schema = _project(_DESC.schema(), "id", "payload")
        filters = [
            EqualTo(("id",), "42"),  # point id → has_id, NOT a field match
            In(("id",), ("a", "b")),
            EqualTo(("payload", "city"), "berlin"),
            GreaterThanOrEqual(("payload", "price"), 10),
            LessThan(("payload", "price"), 100),
            In(("payload", "tag"), ("a", "b")),
            # all of these differ semantically remotely → stay local:
            IsNotNull(("payload", "score")),   # remote is_null ≠ Spark null
            IsNull(("payload", "score")),
            EqualTo(("payload",), "{}"),       # whole-JSON string compare
            StringContains(("payload", "city"), "ber"),
        ]
        req, rejected = build_query_request("req", schema, filters=filters)
        assert req["filter"]["must"] == [
            {"has_id": ["42"]},
            {"has_id": ["a", "b"]},
            {"key": "city", "match": {"value": "berlin"}},
            {"key": "tag", "match": {"any": ["a", "b"]}},
            {"key": "price", "range": {"gte": 10, "lt": 100}},
        ]
        assert "must_not" not in req["filter"]
        # untranslatable filters come back for local evaluation, not dropped
        assert rejected == [
            IsNotNull(("payload", "score")),
            IsNull(("payload", "score")),
            EqualTo(("payload",), "{}"),
            StringContains(("payload", "city"), "ber"),
        ]

    def test_value_types_outside_remote_subset_stay_local(self):
        """Qdrant match has no float variant (gRPC would stringify 3.5 into
        a keyword that matches nothing) and Range is double-valued (string
        datetime bounds are a different condition type with non-Spark
        ordering) — those filters must come back for local eval, while
        float RANGE bounds still push."""
        filters = [
            EqualTo(("payload", "price"), 3.5),            # float match: local
            In(("payload", "price"), (1.5, 2.5)),          # float IN: local
            GreaterThan(("payload", "created"), "2024-01-01"),  # str range: local
            GreaterThanOrEqual(("payload", "score"), 0.25),     # float range: push
        ]
        req, rejected = build_query_request("req", _DESC.schema(), filters=filters)
        assert req["filter"]["must"] == [
            {"key": "score", "range": {"gte": 0.25}},
        ]
        assert rejected == filters[:3]

    def test_no_filters_no_filter_key(self):
        req, rejected = build_query_request("req", _DESC.schema())
        assert "filter" not in req and "limit" not in req
        assert req["with_vectors"] == {"names": ["img_emb", "sparse_f", "text_emb"]}
        assert req["with_payload"] is True
