"""Optional live Qdrant dispatch for the connector seam.

The reference's runtime read path is a network query: assemble
QueryPoints from the projected schema and send it over a tonic gRPC
channel (reference src/table.rs:269-320).  This repo implements full
parity at the seam — request construction (``sources.request``) and wire
deserialization (``sources.wire``) — and this module closes the loop
when a live server is reachable: it dispatches the built request over
Qdrant's REST API (stdlib ``urllib`` — the sandbox has no gRPC stack or
qdrant-client package, and the REST Query API carries the identical
request surface) and normalizes response points into the protobuf-JSON
wire shape ``sources.wire.points_to_rows`` already handles, so the same
decode path serves both the mock-server tests and a real server.

Env-gated by design: nothing here runs unless ``QDRANT_URL`` is set
(``QDRANT_API_KEY`` optional).  The integration test in
``tests/test_client.py`` runs iff the env var is present and skips
cleanly in the sandbox; the translation + HTTP layers are covered
unconditionally by an in-process mock HTTP server.

Scale: the client is a per-page fetch primitive.  In a distributed scan
each executor partition dispatches its own page window (the reader seam
in ``collection_source.CollectionReader.read``), so the driver never
funnels point traffic; request construction stays O(schema) per scan.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
from typing import Any

__all__ = [
    "QdrantGrpcClient",
    "QdrantRestClient",
    "live_client_from_env",
    "rest_point_to_wire",
]

_ENV_URL = "QDRANT_URL"
_ENV_KEY = "QDRANT_API_KEY"


def _vector_output(v: Any) -> dict:
    """One REST vector value → protobuf-JSON ``VectorOutput``
    (the current-generation forms of reference deserialize.rs:74-108)."""
    if isinstance(v, dict) and "indices" in v and "values" in v:
        return {
            "vector": {
                "sparse": {"indices": list(v["indices"]), "values": list(v["values"])}
            }
        }
    if isinstance(v, list) and v and isinstance(v[0], list):
        return {"vector": {"multi_dense": {"vectors": [{"data": list(r)} for r in v]}}}
    return {"vector": {"dense": {"data": list(v or [])}}}


def rest_point_to_wire(point: dict) -> dict:
    """REST response point → the wire-shaped dict ``points_to_rows``
    consumes: numeric ids under ``num``, uuids under ``uuid``; an unnamed
    vector under the single-``vector`` form, a named map under
    ``vectors``; sparse pairs and multi-vectors normalized."""
    pid = point.get("id")
    wire: dict = {
        "id": {"num": pid} if isinstance(pid, int) else {"uuid": str(pid)},
        "payload": point.get("payload") or None,
    }
    v = point.get("vector")
    if v is None:
        wire["vectors"] = None
    elif isinstance(v, dict) and not ("indices" in v and "values" in v):
        wire["vectors"] = {
            "vectors": {name: _vector_output(val) for name, val in v.items()}
        }
    else:
        wire["vectors"] = {"vector": _vector_output(v)}
    return wire


class QdrantRestClient:
    """Minimal stdlib client for the Query API.

    Accepts the request dicts :func:`sources.request.build_query_request`
    produces (gRPC-JSON field names) and translates them to the REST
    body — the two surfaces differ only in ``with_vectors`` spelling and
    the collection name living in the URL path.
    """

    def __init__(self, base_url: str, api_key: str | None = None, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def _post(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                **({"api-key": self.api_key} if self.api_key else {}),
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    @staticmethod
    def _rest_body(request: dict) -> dict:
        body: dict = {}
        wv = request.get("with_vectors", False)
        body["with_vector"] = wv["names"] if isinstance(wv, dict) else bool(wv)
        body["with_payload"] = bool(request.get("with_payload", False))
        if "limit" in request:
            body["limit"] = request["limit"]
        if "filter" in request:
            body["filter"] = request["filter"]
        if "query" in request:
            body["query"] = request["query"]
        return body

    def query_points(self, request: dict) -> list[dict]:
        """Dispatch one built request; return wire-shaped points ready
        for ``points_to_rows`` / ``points_to_dataframe``."""
        collection = request["collection_name"]
        data = self._post(
            f"/collections/{collection}/points/query", self._rest_body(request)
        )
        points = (data.get("result") or {}).get("points") or []
        return [rest_point_to_wire(p) for p in points]


class QdrantGrpcClient:
    """gRPC transport variant behind the same seam — letter-for-letter
    parity with the reference's dispatch (tonic gRPC,
    reference src/table.rs:301-302, Cargo.toml:31).

    Requires the public ``qdrant-client`` package (its generated protobuf
    stubs + grpcio); neither ships in this sandbox, so construction is
    lazy and raises ImportError with guidance when the stack is absent —
    the REST client stays the sandbox-testable default.

    No hand-written field numbers anywhere: ``sources.request`` already
    emits gRPC-JSON field names, so ``google.protobuf.json_format
    .ParseDict`` materializes the exact ``QueryPoints`` message the
    reference sends, straight from the same request dict the REST path
    translates.  Responses funnel through ``MessageToDict`` back into the
    protobuf-JSON wire shape ``sources.wire.points_to_rows`` decodes —
    one decode path for mock HTTP, live REST, and live gRPC.
    """

    def __init__(self, url: str, api_key: str | None = None, timeout: float = 30.0):
        try:
            import grpc  # noqa: F401
            from google.protobuf.json_format import MessageToDict, ParseDict
            from qdrant_client.grpc import PointsStub, QueryPoints
        except ImportError as e:  # pragma: no cover - sandbox has no grpc stack
            raise ImportError(
                "gRPC transport needs the public qdrant-client package "
                "(generated stubs + grpcio); install it or unset "
                f"{_ENV_GRPC_URL} to use the REST transport"
            ) from e
        self._parse_dict = ParseDict
        self._to_dict = MessageToDict
        self._msg_cls = QueryPoints
        self.timeout = timeout
        channel = grpc.insecure_channel(url.removeprefix("http://"))
        if api_key:
            channel = grpc.intercept_channel(channel)  # pragma: no cover
        self._stub = PointsStub(channel)

    def build_message(self, request: dict):
        """request dict (gRPC-JSON names) → the QueryPoints protobuf."""
        return self._parse_dict(request, self._msg_cls(), ignore_unknown_fields=False)

    def query_points(self, request: dict) -> list[dict]:
        resp = self._stub.Query(self.build_message(request), timeout=self.timeout)
        out = self._to_dict(resp, preserving_proto_field_name=True)
        return list(out.get("result") or [])


_ENV_GRPC_URL = "QDRANT_GRPC_URL"


def live_client_from_env() -> QdrantRestClient | QdrantGrpcClient | None:
    """A client iff an endpoint env var is set — the sandbox (no network)
    returns None and every live path skips.  ``QDRANT_GRPC_URL`` selects
    the gRPC transport (needs qdrant-client installed); ``QDRANT_URL``
    the stdlib REST transport."""
    grpc_url = os.environ.get(_ENV_GRPC_URL)
    if grpc_url:
        return QdrantGrpcClient(grpc_url, os.environ.get(_ENV_KEY))
    url = os.environ.get(_ENV_URL)
    if not url:
        return None
    return QdrantRestClient(url, os.environ.get(_ENV_KEY))
