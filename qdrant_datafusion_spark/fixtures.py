"""The reference's e2e test collections as deterministic DataFrames.

Point values copied from the reference's e2e tests so its assertions carry
over verbatim (FIXTURES.md; reference tests/e2e.rs:163-208 and :360-365).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from qdrant_datafusion_spark.collections import CollectionDescriptor, VectorField

SIMPLE = CollectionDescriptor(
    name="simple", unnamed=True, fields=(VectorField("vector", 2, "cosine"),)
)

HETERO = CollectionDescriptor(
    name="hetero",
    fields=(
        VectorField("test_embedding", 2, "cosine"),
        VectorField("text_embedding", 3, "cosine"),
        VectorField("image_embedding", 4, "dot"),
        VectorField("audio_embedding", 2, "euclid"),
        VectorField("multi_embeddings", 2, "dot", kind="multi"),
        VectorField("keywords", 0, "dot", kind="sparse"),
    ),
)

UNNAMED = CollectionDescriptor(
    name="unnamed", unnamed=True, fields=(VectorField("vector", 3, "cosine"),)
)


def simple_df(spark: SparkSession) -> DataFrame:
    """Fixture 1 (reference tests/e2e.rs:48-107): 1 point, unnamed dim-2."""
    rows = [("1", json.dumps({"title": "Test Point"}), [0.1, 0.2])]
    return spark.createDataFrame(rows, SIMPLE.schema())


def hetero_df(spark: SparkSession) -> DataFrame:
    """Fixture 2 (reference tests/e2e.rs:111-332): 3 points, heterogeneous
    named vectors — each point carries a different subset (NULL = absent)."""
    rows = [
        (
            "1",
            json.dumps({"title": "Point 1"}),
            [0.1, 0.2], None, None, None,
            [[0.7, 0.8], [0.9, 0.1]],
            [0, 5], [0.1, 0.9],
        ),
        (
            "2",
            json.dumps({"title": "Point 2"}),
            None, [0.3, 0.4, 0.5], [0.6, 0.7, 0.8, 0.9], None,
            None,
            [1, 3], [0.7, 0.4],
        ),
        (
            "3",
            json.dumps({"title": "Point 3"}),
            None, [0.11, 0.12, 0.13], None, [0.14, 0.15],
            None,
            [2, 4, 6], [0.2, 0.6, 0.8],
        ),
    ]
    return spark.createDataFrame(rows, HETERO.schema())


def unnamed_df(spark: SparkSession) -> DataFrame:
    """Fixture 3 (reference tests/e2e.rs:335-479): 3 points, unnamed dim-3."""
    rows = [
        ("1", json.dumps({"title": "Unnamed Point 1"}), [0.1, 0.2, 0.3]),
        ("2", json.dumps({"title": "Unnamed Point 2"}), [0.4, 0.5, 0.6]),
        ("3", json.dumps({"title": "Unnamed Point 3"}), [0.7, 0.8, 0.9]),
    ]
    return spark.createDataFrame(rows, UNNAMED.schema())


CORPUS_COLL = CollectionDescriptor(
    name="collection_name",
    fields=(
        VectorField("text_embedding", 2, "cosine"),
        VectorField("image_embedding", 3, "dot"),
        VectorField("sparse_text", 0, "dot", "sparse"),
        VectorField("colbert_vectors", 3, "dot", "multi"),
    ),
)

#: the by-id search target in tests/bin/tests.sql:22
CORPUS_POINT_ID = "43cf51e2-8777-4f52-bc74-c2cbde0c8b04"


def corpus_df(spark: SparkSession) -> DataFrame:
    """The corpus's ``collection_name``, covering EVERY field and payload
    key the corpus file touches: named text/image vectors, the
    ``sparse_text`` pair, ``colbert_vectors`` multi-vectors, the filter
    keys (language/has_thumbnail/verified/status — tests.sql:350-383),
    the payload surfaces its statements read (description, address, tags,
    author, category, tag, geo.location, price — tests.sql:210-303), the
    exact by-id uuid (tests.sql:22), and the example ids the recommend /
    discover statements name (id1-4, img_id1-3, ctx_id1/2, valid_id —
    tests.sql:83-137, 395)."""
    def payload(language, thumb, verified, status, *, author="author_1",
                category="books", tag="p", country="USA",
                description="machine learning with spark"):
        return json.dumps(
            {
                "language": language,
                "has_thumbnail": thumb,
                "verified": verified,
                "status": status,
                "author": author,
                "category": category,
                "tag": tag,
                "tags": ["electronics", "sale"],
                "price": 42.5,
                "description": description,
                "address": {"city": "Berlin", "country": country},
                "geo": {"location": {"lat": 52.52, "lon": 13.405}},
            }
        )

    base = [
        (CORPUS_POINT_ID, payload("en", True, True, "published"),
         [0.1, 0.9], [0.3, 0.1, 0.5]),
        ("doc-2", payload("en", True, False, "published", tag="h1"),
         [0.8, 0.2], [0.1, 0.7, 0.2]),
        ("doc-3", payload("en", False, True, "published", author="author_2"),
         [0.5, 0.5], [0.9, 0.2, 0.4]),
        ("doc-4", payload("de", True, True, "published", country="DE"),
         [0.2, 0.7], [0.4, 0.4, 0.1]),
        ("doc-5", payload("en", True, True, "draft", tag="li"),
         [0.9, 0.1], [0.2, 0.8, 0.6]),
    ]
    named = ["id1", "id2", "id3", "id4", "img_id1", "img_id2", "img_id3",
             "ctx_id1", "ctx_id2", "valid_id"]
    rows = []
    for i, (pid, pl, t, im) in enumerate(base):
        rows.append(
            (pid, pl, t, im,
             [1, 42, 100 + i], [0.2, 0.8, 0.1 * (i + 1)],
             [[0.1, 0.2, 0.3], [0.5 + 0.1 * i, 0.1, 0.2]])
        )
    for i, pid in enumerate(named):
        rows.append(
            (pid, payload("en", True, True, "published"),
             [round(0.1 * (i + 1), 2), round(1.0 - 0.1 * i, 2)],
             [round(0.1 * i, 2), 0.5, round(1.0 - 0.05 * i, 2)],
             [10, 20, 30], [0.5, 0.3, 0.7],
             [[0.2, 0.1, 0.35], [0.8, 0.9, 0.53]])
        )
    return spark.createDataFrame(rows, CORPUS_COLL.schema())
