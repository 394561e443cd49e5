"""End-to-end connector tests against the in-process fake Qdrant server.

The sandbox analogue of the reference's e2e suite (tests/e2e.rs:48-107
coverage smoke + :13-19's three live runs): seed collections over REST
PUT, derive the schema from ``GET /collections/{name}`` exactly like the
reference's TableProvider does from ``get_collection_info``
(src/table.rs:60-74), scan through ``QdrantRestClient`` →
``points_to_dataframe``, and check server-side nearest search against
the repo's own ``v_search`` on the same data.  Every request crosses a
real 127.0.0.1 socket — no mocking below the HTTP layer.
"""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from qdrant_datafusion_spark.collections import (
    descriptor_from_collection_info,
)
from qdrant_datafusion_spark.functions.distance import v_search
from qdrant_datafusion_spark.sources.client import QdrantRestClient
from qdrant_datafusion_spark.sources.request import build_query_request
from qdrant_datafusion_spark.sources.wire import points_to_dataframe
from qdrant_datafusion_spark.test_utils import FakeQdrantServer

N_DOCS = 20


def _put(base: str, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        f"{base}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="PUT",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read().decode())


def _get(base: str, path: str) -> dict:
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read().decode())


@pytest.fixture(scope="module")
def server():
    """A running fake server seeded with one named + one unnamed
    collection (the reference's heterogeneous-fields scenario:
    different points carry different vector fields, e2e.rs:110+)."""
    srv = FakeQdrantServer()
    with srv as url:
        _put(
            url,
            "/collections/docs",
            {
                "vectors": {
                    "text_emb": {"size": 4, "distance": "Dot"},
                    "colbert": {
                        "size": 4,
                        "distance": "Cosine",
                        "multivector_config": {"comparator": "max_sim"},
                    },
                },
                "sparse_vectors": {"kw": {}},
            },
        )
        points = []
        for i in range(N_DOCS):
            vec: dict = {
                "text_emb": [float(i % 7), float(i % 3), 1.0, float(i) / 10.0]
            }
            if i % 3 == 0:  # heterogeneous: only every 3rd has multi
                vec["colbert"] = [[1.0, 0.0, 0.0, float(i)], [0.0, 1.0, 0.0, 0.0]]
            if i % 4 == 0:  # ... and every 4th a sparse vector
                vec["kw"] = {"indices": [i, i + 100], "values": [0.5, 1.5]}
            points.append(
                {
                    "id": i,
                    "vector": vec,
                    "payload": {
                        "rank": i,
                        "lang": "en" if i % 2 == 0 else "de",
                        "meta": {"src": f"s{i % 3}"},
                    },
                }
            )
        _put(url, "/collections/docs/points?wait=true", {"points": points})
        _put(
            url,
            "/collections/flat",
            {"vectors": {"size": 2, "distance": "Cosine"}},
        )
        _put(
            url,
            "/collections/flat/points?wait=true",
            {
                "points": [
                    {
                        "id": i,
                        "vector": [float(i), 1.0],
                        "payload": {"rank": i},
                    }
                    for i in range(8)
                ]
            },
        )
        yield url


class TestSchemaFromLiveInfo:
    def test_named_collection_schema(self, server):
        desc = descriptor_from_collection_info(
            "docs", _get(server, "/collections/docs")
        )
        assert [f.name for f in desc.schema().fields] == [
            "id",
            "payload",
            "colbert",
            "text_emb",
            "kw_indices",
            "kw_values",
        ]
        assert desc.metric_for("text_emb") == "dot"
        assert desc.metric_for("colbert") == "cosine"
        assert not desc.unnamed
        multi = desc.schema()["colbert"].dataType.simpleString()
        assert multi == "array<array<float>>"

    def test_unnamed_collection_schema(self, server):
        desc = descriptor_from_collection_info(
            "flat", _get(server, "/collections/flat")
        )
        assert desc.unnamed
        assert [f.name for f in desc.schema().fields] == [
            "id",
            "payload",
            "vector",
        ]
        assert desc.metric_for() == "cosine"


class TestScanRoundtrip:
    def test_full_scan_to_dataframe(self, spark, server):
        desc = descriptor_from_collection_info(
            "docs", _get(server, "/collections/docs")
        )
        schema = desc.schema()
        request, rejected = build_query_request("docs", schema, limit=N_DOCS)
        assert rejected == []
        df = points_to_dataframe(
            spark, QdrantRestClient(server).query_points(request), schema
        )
        rows = {r["id"]: r for r in df.collect()}
        assert len(rows) == N_DOCS
        # heterogeneous fields: multi/sparse NULL where the point lacks them
        assert rows["5"]["colbert"] is None
        assert rows["6"]["colbert"] == [[1.0, 0.0, 0.0, 6.0], [0.0, 1.0, 0.0, 0.0]]
        assert rows["4"]["kw_indices"] == [4, 104]
        assert rows["5"]["kw_values"] is None
        assert json.loads(rows["7"]["payload"])["meta"]["src"] == "s1"

    def test_metadata_only_projection(self, spark, server):
        desc = descriptor_from_collection_info(
            "docs", _get(server, "/collections/docs")
        )
        sub = type(desc.schema())(
            [f for f in desc.schema().fields if f.name in ("id", "payload")]
        )
        request, _ = build_query_request("docs", sub)
        assert request["with_vectors"] is False
        points = QdrantRestClient(server).query_points(request)
        assert all(p["vectors"] is None for p in points)
        df = points_to_dataframe(spark, points, sub)
        assert df.count() == N_DOCS

    def test_pushed_filters_hold_remotely(self, spark, server):
        desc = descriptor_from_collection_info(
            "docs", _get(server, "/collections/docs")
        )
        schema = desc.schema()
        request, rejected = build_query_request(
            "docs",
            schema,
            filters=[
                EqualTo(("payload", "lang"), "en"),
                GreaterThan(("payload", "rank"), 5),
            ],
        )
        assert rejected == []
        points = QdrantRestClient(server).query_points(request)
        ids = sorted(int(p["id"]["num"]) for p in points)
        assert ids == [i for i in range(N_DOCS) if i % 2 == 0 and i > 5]

    def test_has_id_filter(self, server):
        desc = descriptor_from_collection_info(
            "flat", _get(server, "/collections/flat")
        )
        request, rejected = build_query_request(
            "flat", desc.schema(), filters=[In(("id",), (1, 3, 5))]
        )
        assert rejected == []
        points = QdrantRestClient(server).query_points(request)
        assert sorted(p["id"]["num"] for p in points) == [1, 3, 5]

    def test_upsert_overwrites_by_id(self, spark, server):
        _put(
            server,
            "/collections/flat/points?wait=true",
            {
                "points": [
                    {"id": 0, "vector": [9.0, 9.0], "payload": {"rank": 99}}
                ]
            },
        )
        desc = descriptor_from_collection_info(
            "flat", _get(server, "/collections/flat")
        )
        request, _ = build_query_request("flat", desc.schema())
        points = QdrantRestClient(server).query_points(request)
        assert len(points) == 8  # overwrite, not append
        p0 = next(p for p in points if p["id"]["num"] == 0)
        assert p0["payload"]["rank"] == 99
        # restore for other tests (module fixture is shared)
        _put(
            server,
            "/collections/flat/points?wait=true",
            {"points": [{"id": 0, "vector": [0.0, 1.0], "payload": {"rank": 0}}]},
        )


class TestServerSideSearchParity:
    def test_nearest_matches_local_v_search(self, spark, server):
        """Server-side Query-API nearest top-k == the repo's own
        ``v_search`` top-k over the scanned DataFrame — the two
        execution paths agree on ids AND order."""
        desc = descriptor_from_collection_info(
            "docs", _get(server, "/collections/docs")
        )
        schema = desc.schema()
        query = [1.0, 2.0, 0.5, 3.0]
        k = 5

        # path 1: the fake server ranks under the collection metric (Dot)
        request, _ = build_query_request("docs", schema, limit=k)
        request["query"] = {"nearest": query}
        request["using"] = "text_emb"
        remote = QdrantRestClient(server).query_points(request)
        remote_ids = [int(p["id"]["num"]) for p in remote]

        # path 2: full scan -> local v_search (metric from the descriptor)
        full, _ = build_query_request("docs", schema, limit=N_DOCS)
        df = points_to_dataframe(
            spark, QdrantRestClient(server).query_points(full), schema
        )
        local = (
            df.where(F.col("text_emb").isNotNull())
            .select(
                F.col("id").cast("int").alias("id"),
                v_search(
                    F.col("text_emb"),
                    F.array(*[F.lit(x) for x in query]),
                    descriptor=desc,
                    field="text_emb",
                ).alias("score"),
            )
            .orderBy(F.desc("score"), "id")
            .limit(k)
            .collect()
        )
        assert [r["id"] for r in local] == remote_ids

    def test_unnamed_search_cosine(self, spark, server):
        desc = descriptor_from_collection_info(
            "flat", _get(server, "/collections/flat")
        )
        request, _ = build_query_request("flat", desc.schema(), limit=3)
        request["query"] = {"nearest": [1.0, 0.0]}
        remote_ids = [
            int(p["id"]["num"])
            for p in QdrantRestClient(server).query_points(request)
        ]
        full, _ = build_query_request("flat", desc.schema())
        df = points_to_dataframe(
            spark, QdrantRestClient(server).query_points(full), desc.schema()
        )
        local = (
            df.select(
                F.col("id").cast("int").alias("id"),
                v_search(
                    F.col("vector"), F.array(F.lit(1.0), F.lit(0.0))
                ).alias("s"),
            )
            .orderBy(F.desc("s"), "id")
            .limit(3)
            .collect()
        )
        assert [r["id"] for r in local] == remote_ids


class TestMutationsLive:
    """The write path over a LIVE server: point-delete and set-payload
    round-trips through the REST endpoints (the remote mirror of
    test_fixtures_parity.TestCollectionMutations, which exercises the
    same semantics against the parquet catalog).  A dedicated collection
    keeps the module-shared fixtures untouched."""

    @pytest.fixture()
    def mut(self, server):
        _put(
            server,
            "/collections/mut",
            {"vectors": {"size": 2, "distance": "Cosine"}},
        )
        _put(
            server,
            "/collections/mut/points?wait=true",
            {
                "points": [
                    {
                        "id": i,
                        "vector": [float(i), 1.0],
                        "payload": {"rank": i, "lang": "en" if i % 2 == 0 else "de"},
                    }
                    for i in range(6)
                ]
            },
        )
        return "mut"

    def _all_points(self, server, name):
        desc = descriptor_from_collection_info(
            name, _get(server, f"/collections/{name}")
        )
        request, _ = build_query_request(name, desc.schema())
        return QdrantRestClient(server).query_points(request)

    def test_delete_by_ids_removes_only_matches(self, server, mut):
        QdrantRestClient(server).delete_points(mut, ids=[1, 3])
        ids = sorted(p["id"]["num"] for p in self._all_points(server, mut))
        assert ids == [0, 2, 4, 5]
        assert _get(server, f"/collections/{mut}")["result"]["points_count"] == 4

    def test_delete_by_filter(self, server, mut):
        flt = {"must": [{"key": "lang", "match": {"value": "de"}}]}
        QdrantRestClient(server).delete_points(mut, flt=flt)
        pts = self._all_points(server, mut)
        assert sorted(p["id"]["num"] for p in pts) == [0, 2, 4]
        assert all(p["payload"]["lang"] == "en" for p in pts)

    def test_set_payload_merges_typed_values(self, server, mut):
        QdrantRestClient(server).set_payload(
            mut, {"boosted": True, "score": 3}, ids=[2]
        )
        by_id = {p["id"]["num"]: p["payload"] for p in self._all_points(server, mut)}
        assert by_id[2]["boosted"] is True and by_id[2]["score"] == 3  # typed
        assert by_id[2]["rank"] == 2  # merge keeps unpatched keys
        for i, payload in by_id.items():
            if i != 2:
                assert "boosted" not in payload

    def test_set_payload_by_filter_counts_and_scopes(self, server, mut):
        flt = {"must": [{"key": "lang", "match": {"value": "en"}}]}
        QdrantRestClient(server).set_payload(mut, {"vetted": 1}, flt=flt)
        by_id = {p["id"]["num"]: p["payload"] for p in self._all_points(server, mut)}
        for i, payload in by_id.items():
            assert ("vetted" in payload) == (i % 2 == 0)

    def test_selector_contract(self, server, mut):
        with pytest.raises(ValueError):
            QdrantRestClient(server).delete_points(mut)
        with pytest.raises(ValueError):
            QdrantRestClient(server).set_payload(mut, {"x": 1}, ids=[1], flt={})
