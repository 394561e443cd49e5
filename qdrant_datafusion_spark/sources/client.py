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
    "grpc_point_to_wire",
    "grpc_query_body",
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
        if "using" in request:  # named-collection search target field
            body["using"] = request["using"]
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

    @staticmethod
    def _selector(ids: list | None, flt: dict | None) -> dict:
        """Qdrant PointsSelector: exactly one of an ids list / a filter."""
        if (ids is None) == (flt is None):
            raise ValueError("pass exactly one of ids / flt")
        return {"points": list(ids)} if ids is not None else {"filter": flt}

    def delete_points(
        self,
        collection: str,
        ids: list | None = None,
        flt: dict | None = None,
    ) -> dict:
        """``POST /collections/{c}/points/delete`` — the remote form of
        the catalog's ``delete_where`` (the write path the reference
        leaves ``todo!()``, src/table.rs:186-193)."""
        return self._post(
            f"/collections/{collection}/points/delete",
            self._selector(ids, flt),
        )

    def set_payload(
        self,
        collection: str,
        payload: dict,
        ids: list | None = None,
        flt: dict | None = None,
    ) -> dict:
        """``POST /collections/{c}/points/payload`` — merge ``payload``
        keys into the selected points (set-payload semantics; the remote
        form of the catalog's ``update_payload``)."""
        return self._post(
            f"/collections/{collection}/points/payload",
            {"payload": payload, **self._selector(ids, flt)},
        )


def grpc_query_body(request: dict) -> dict:
    """Builder request dict → protobuf-JSON for ``QueryPoints``.

    ``build_query_request`` emits the REST-leaning shapes (bare bools for
    the selectors, ``{"has_id": [ids]}`` / ``{"key", "match"}`` filter
    conditions); the gRPC message needs the protobuf-JSON of qdrant's
    public ``points.proto``: selector messages with explicit oneof arms
    (``{"enable": bool}`` / ``{"include": {...}}``), ``Condition`` arms
    (``field`` / ``has_id``), and *typed* ``Match`` variants (``keyword``
    / ``integer`` / ``boolean`` / ``keywords`` / ``integers``) instead of
    REST's type-inferring ``value`` / ``any``.  Pure dict→dict, so the
    translation is pinned by unit tests even where the grpc stack (and
    hence ParseDict) can't run.
    """
    body: dict = {"collection_name": request["collection_name"]}
    wv = request.get("with_vectors", False)
    body["with_vectors"] = (
        {"include": {"names": list(wv["names"])}} if isinstance(wv, dict)
        else {"enable": bool(wv)}
    )
    body["with_payload"] = {"enable": bool(request.get("with_payload", False))}
    if "limit" in request:
        body["limit"] = int(request["limit"])
    if "filter" in request:
        body["filter"] = {
            side: [_grpc_condition(c) for c in conds]
            for side, conds in request["filter"].items()
        }
    if "query" in request:  # pre-shaped by the caller; pass through
        body["query"] = request["query"]
    return body


def _grpc_point_id(v) -> dict:
    return {"num": v} if isinstance(v, int) else {"uuid": str(v)}


def _grpc_condition(cond: dict) -> dict:
    """One REST filter condition → protobuf-JSON ``Condition``."""
    if "has_id" in cond:
        return {"has_id": {"has_id": [_grpc_point_id(v) for v in cond["has_id"]]}}
    field: dict = {"key": cond["key"]}
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            v = m["value"]
            if isinstance(v, bool):
                field["match"] = {"boolean": v}
            elif isinstance(v, int):
                field["match"] = {"integer": v}
            else:
                field["match"] = {"keyword": str(v)}
        else:  # {"any": [...]} — homogeneous by pushFilters contract
            vals = list(m["any"])
            if vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
                field["match"] = {"integers": {"integers": vals}}
            else:
                field["match"] = {"keywords": {"strings": [str(v) for v in vals]}}
    if "range" in cond:
        field["range"] = {k: float(v) for k, v in cond["range"].items()}
    return {"field": field}


def _grpc_value(v) -> object:
    """qdrant ``Value`` (own oneof, int64-as-string under proto-JSON) →
    plain JSON value, recursively."""
    if not isinstance(v, dict):
        return v
    if "null_value" in v:
        return None
    if "integer_value" in v:
        return int(v["integer_value"])
    if "double_value" in v:
        return float(v["double_value"])
    if "string_value" in v:
        return v["string_value"]
    if "bool_value" in v:
        return bool(v["bool_value"])
    if "struct_value" in v:
        return {
            k: _grpc_value(x)
            for k, x in (v["struct_value"].get("fields") or {}).items()
        }
    if "list_value" in v:
        return [_grpc_value(x) for x in (v["list_value"].get("values") or [])]
    return v


def _grpc_vector_output(vo: dict) -> dict:
    """``VectorOutput`` under MessageToDict: the current-generation oneof
    arm (``dense`` / ``sparse`` / ``multi_dense``) appears at the TOP
    level (proto-JSON flattens oneofs); the repo's wire shape carries it
    under a ``vector`` wrapper.  Legacy deprecated fields (bare ``data``
    / ``indices``) pass through — ``sources.wire`` decodes both
    generations already."""
    for arm in ("dense", "sparse", "multi_dense"):
        if arm in vo:
            return {"vector": {arm: vo[arm]}}
    return vo


def grpc_point_to_wire(point: dict) -> dict:
    """One ``ScoredPoint`` from ``MessageToDict(preserving_proto_field_name
    =True)`` → the wire-shaped dict ``points_to_rows`` consumes: uint64
    ids arrive as JSON strings (proto-JSON rule) and payload values as
    qdrant ``Value`` wrappers; both normalize here."""
    pid = dict(point.get("id") or {})
    if "num" in pid:
        pid["num"] = int(pid["num"])
    payload = point.get("payload") or None
    if payload:
        payload = {k: _grpc_value(v) for k, v in payload.items()}
    wire: dict = {"id": pid, "payload": payload}
    vecs = point.get("vectors")
    if not vecs:
        wire["vectors"] = None
    elif "vector" in vecs:
        wire["vectors"] = {"vector": _grpc_vector_output(vecs["vector"])}
    else:  # named map: NamedVectorsOutput adds one more "vectors" level
        named = (vecs.get("vectors") or {}).get("vectors") or {}
        wire["vectors"] = {
            "vectors": {name: _grpc_vector_output(vo) for name, vo in named.items()}
        }
    return wire


class QdrantGrpcClient:
    """gRPC transport variant behind the same seam — transport parity
    with the reference's dispatch (tonic gRPC, reference
    src/table.rs:301-302, Cargo.toml:31).

    Requires the public ``qdrant-client`` package (its generated protobuf
    stubs + grpcio); neither ships in this sandbox, so construction is
    lazy and raises ImportError with guidance when the stack is absent —
    the REST client stays the sandbox-testable default.  The
    dict-level translation (:func:`grpc_query_body` request-side,
    :func:`grpc_point_to_wire` response-side) is pure and unit-tested
    unconditionally; only the ParseDict/stub dispatch needs the stack.
    ``https://`` targets get a TLS channel; the api key rides as
    ``api-key`` call metadata (same header the REST client sends).
    """

    def __init__(self, url: str, api_key: str | None = None, timeout: float = 30.0):
        try:
            import grpc
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
        self._metadata = (("api-key", api_key),) if api_key else ()
        secure = url.startswith("https://")
        target = url.removeprefix("https://").removeprefix("http://")
        channel = (
            grpc.secure_channel(target, grpc.ssl_channel_credentials())
            if secure
            else grpc.insecure_channel(target)
        )
        self._stub = PointsStub(channel)

    def build_message(self, request: dict):
        """Builder request dict → the QueryPoints protobuf message."""
        return self._parse_dict(
            grpc_query_body(request), self._msg_cls(), ignore_unknown_fields=False
        )

    def query_points(self, request: dict) -> list[dict]:
        resp = self._stub.Query(
            self.build_message(request),
            timeout=self.timeout,
            metadata=self._metadata,
        )
        out = self._to_dict(resp, preserving_proto_field_name=True)
        return [grpc_point_to_wire(p) for p in out.get("result") or []]


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
