"""In-process fake Qdrant server for end-to-end connector tests.

The reference's e2e suite runs against a real Dockerized Qdrant spun up
by ``src/test_utils.rs:93-159`` (``QdrantContainer``); this sandbox has
no Docker, so the analogue is an in-process stdlib ``http.server``
speaking the exact REST surface the connector uses:

- ``PUT /collections/{name}`` — create a collection from a vectors
  config (unnamed params, a named map, and ``sparse_vectors``);
- ``PUT /collections/{name}/points`` — upsert points (the seeding
  helper ``UpsertPointsBuilder`` plays in e2e.rs:78);
- ``GET /collections/{name}`` — collection info in the REST response
  shape (``result.config.params``), which
  :func:`collections.descriptor_from_collection_info` turns into a
  schema exactly like the reference's ``collection_to_arrow_schema``
  consumes ``get_collection_info`` (reference src/table.rs:60-74);
- ``POST /collections/{name}/points/query`` — the Query API:
  ``filter`` (must / must_not / should over match / range / has_id
  conditions), ``query.nearest`` scoring under the collection metric,
  ``limit``, ``with_payload`` and ``with_vector`` selectors.

Everything is deterministic and socket-real: requests go through
``urllib`` over 127.0.0.1, so the client, JSON translation, and decode
path are exercised end-to-end without a network dependency.  Pure test
infrastructure — nothing here runs in a production plan.
"""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any

__all__ = ["FakeQdrantServer"]


def _score(metric: str, q: list[float], v: list[float]) -> float:
    """One query/vector pair → Qdrant-convention score (higher = closer
    for similarity metrics; distances are negated so one DESC sort
    serves all four metrics)."""
    if metric == "dot":
        return sum(a * b for a, b in zip(q, v))
    if metric == "cosine":
        nq = math.sqrt(sum(a * a for a in q)) or 1.0
        nv = math.sqrt(sum(a * a for a in v)) or 1.0
        return sum(a * b for a, b in zip(q, v)) / (nq * nv)
    if metric == "euclid":
        return -math.sqrt(sum((a - b) ** 2 for a, b in zip(q, v)))
    if metric == "manhattan":
        return -sum(abs(a - b) for a, b in zip(q, v))
    raise ValueError(f"unknown metric {metric!r}")


def _match_condition(point: dict, cond: dict) -> bool:
    """Evaluate one REST filter condition against a stored point."""
    if "has_id" in cond:
        return point["id"] in cond["has_id"]
    payload = point.get("payload") or {}
    key = cond.get("key")
    # dotted path into nested payload objects, like the real server
    val: Any = payload
    for part in (key or "").split("."):
        if not isinstance(val, dict) or part not in val:
            val = None
            break
        val = val[part]
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            return val == m["value"]
        if "any" in m:
            return val in m["any"]
        return False
    if "range" in cond:
        if not isinstance(val, (int, float)) or isinstance(val, bool):
            return False
        r = cond["range"]
        return (
            ("gt" not in r or val > r["gt"])
            and ("gte" not in r or val >= r["gte"])
            and ("lt" not in r or val < r["lt"])
            and ("lte" not in r or val <= r["lte"])
        )
    if "is_null" in cond:
        return key in payload and payload[key] is None
    if "is_empty" in cond:
        return val in (None, [], {})
    return False


def _apply_filter(point: dict, flt: dict | None) -> bool:
    if not flt:
        return True
    must = flt.get("must") or []
    must_not = flt.get("must_not") or []
    should = flt.get("should") or []
    if any(not _match_condition(point, c) for c in must):
        return False
    if any(_match_condition(point, c) for c in must_not):
        return False
    if should and not any(_match_condition(point, c) for c in should):
        return False
    return True


class FakeQdrantServer:
    """A tiny in-memory Qdrant over a real TCP socket.

    Usage::

        with FakeQdrantServer() as url:
            client = QdrantRestClient(url)
            ...

    State lives on the instance (``collections``: name → {"config":
    params-dict, "points": ordered list}); the handler class is built
    per-instance so concurrent servers never share state.
    """

    def __init__(self) -> None:
        self.collections: dict[str, dict] = {}
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 — silence test noise
                pass

            def _reply(self, code: int, result: Any) -> None:
                body = json.dumps(
                    {"result": result, "status": "ok", "time": 0.0}
                ).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n).decode() or "{}")

            def _parts(self) -> list[str]:
                return [p for p in self.path.split("?")[0].split("/") if p]

            def do_PUT(self):  # noqa: N802 — http.server API
                parts = self._parts()
                if len(parts) == 2 and parts[0] == "collections":
                    outer.create_collection(parts[1], self._body())
                    return self._reply(200, True)
                if (
                    len(parts) == 3
                    and parts[0] == "collections"
                    and parts[2] == "points"
                ):
                    outer.upsert_points(
                        parts[1], self._body().get("points") or []
                    )
                    return self._reply(
                        200, {"operation_id": 0, "status": "completed"}
                    )
                return self._reply(404, None)

            def do_GET(self):  # noqa: N802
                parts = self._parts()
                if len(parts) == 2 and parts[0] == "collections":
                    info = outer.collection_info(parts[1])
                    if info is None:
                        return self._reply(404, None)
                    return self._reply(200, info)
                return self._reply(404, None)

            def do_POST(self):  # noqa: N802
                parts = self._parts()
                if (
                    len(parts) == 4
                    and parts[0] == "collections"
                    and parts[2:] == ["points", "query"]
                ):
                    pts = outer.query_points(parts[1], self._body())
                    if pts is None:
                        return self._reply(404, None)
                    return self._reply(200, {"points": pts})
                if (
                    len(parts) == 4
                    and parts[0] == "collections"
                    and parts[2:] == ["points", "delete"]
                ):
                    n = outer.delete_points(parts[1], self._body())
                    if n is None:
                        return self._reply(404, None)
                    return self._reply(
                        200, {"operation_id": 0, "status": "completed"}
                    )
                if (
                    len(parts) == 4
                    and parts[0] == "collections"
                    and parts[2:] == ["points", "payload"]
                ):
                    n = outer.set_payload(parts[1], self._body())
                    if n is None:
                        return self._reply(404, None)
                    return self._reply(
                        200, {"operation_id": 0, "status": "completed"}
                    )
                return self._reply(404, None)

        self._srv = HTTPServer(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )

    # -- lifecycle ----------------------------------------------------------

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self._srv.server_port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    # -- in-memory operations (callable directly in unit tests) -------------

    def create_collection(self, name: str, body: dict) -> None:
        self.collections[name] = {
            "params": {
                "vectors": body.get("vectors") or {},
                **(
                    {"sparse_vectors": body["sparse_vectors"]}
                    if body.get("sparse_vectors")
                    else {}
                ),
            },
            "points": [],
        }

    def upsert_points(self, name: str, points: list[dict]) -> None:
        coll = self.collections[name]
        by_id = {p["id"]: i for i, p in enumerate(coll["points"])}
        for p in points:
            if p["id"] in by_id:
                coll["points"][by_id[p["id"]]] = dict(p)
            else:
                coll["points"].append(dict(p))

    def _selected(self, name: str, body: dict) -> list[dict] | None:
        """Points selected by a points-list OR a filter — the two
        selector forms Qdrant's delete-points / set-payload APIs accept
        (https://api.qdrant.tech/: PointsSelector)."""
        coll = self.collections.get(name)
        if coll is None:
            return None
        if "points" in body:
            ids = set(body["points"])
            return [p for p in coll["points"] if p["id"] in ids]
        return [
            p for p in coll["points"] if _apply_filter(p, body.get("filter"))
        ]

    def delete_points(self, name: str, body: dict) -> int | None:
        """``POST /collections/{c}/points/delete`` — remove by ids list
        or by filter."""
        victims = self._selected(name, body)
        if victims is None:
            return None
        drop = {id(p) for p in victims}
        coll = self.collections[name]
        before = len(coll["points"])
        coll["points"] = [p for p in coll["points"] if id(p) not in drop]
        return before - len(coll["points"])

    def set_payload(self, name: str, body: dict) -> int | None:
        """``POST /collections/{c}/points/payload`` — MERGE ``payload``
        keys into the selected points (Qdrant set-payload semantics:
        unpatched keys keep their values)."""
        targets = self._selected(name, body)
        if targets is None:
            return None
        patch = body.get("payload") or {}
        for p in targets:
            merged = dict(p.get("payload") or {})
            merged.update(patch)
            p["payload"] = merged
        return len(targets)

    def collection_info(self, name: str) -> dict | None:
        coll = self.collections.get(name)
        if coll is None:
            return None
        return {
            "status": "green",
            "points_count": len(coll["points"]),
            "config": {"params": coll["params"]},
        }

    def _metric_for(self, name: str, using: str | None) -> str:
        vectors = self.collections[name]["params"]["vectors"]
        cfg = vectors if "size" in vectors else vectors.get(using or "", {})
        return str(cfg.get("distance", "Cosine")).lower()

    def query_points(self, name: str, body: dict) -> list[dict] | None:
        coll = self.collections.get(name)
        if coll is None:
            return None
        pts = [
            p for p in coll["points"] if _apply_filter(p, body.get("filter"))
        ]
        query = body.get("query")
        scored: list[tuple[float, dict]] | None = None
        if isinstance(query, dict) and "nearest" in query:
            q = [float(x) for x in query["nearest"]]
            metric = self._metric_for(name, body.get("using"))
            scored = []
            for p in pts:
                v = p.get("vector")
                if isinstance(v, dict):
                    v = v.get(body.get("using") or "")
                if not isinstance(v, list) or (v and isinstance(v[0], list)):
                    continue  # absent / sparse / multi: not dense-searchable
                scored.append((_score(metric, q, [float(x) for x in v]), p))
            # stable: ties keep insertion order, like a scroll
            scored.sort(key=lambda t: -t[0])
            pts = [p for _s, p in scored]
        limit = body.get("limit")
        if limit is not None:
            pts = pts[: int(limit)]
            if scored is not None:
                scored = scored[: int(limit)]
        wv = body.get("with_vector", False)
        wp = body.get("with_payload", False)
        out = []
        scores = {id(p): s for s, p in scored or []}
        for p in pts:
            row: dict = {"id": p["id"]}
            if wp and p.get("payload") is not None:
                row["payload"] = p["payload"]
            v = p.get("vector")
            if wv is True:
                row["vector"] = v
            elif isinstance(wv, list) and isinstance(v, dict):
                row["vector"] = {k: v[k] for k in wv if k in v}
            if id(p) in scores:
                row["score"] = scores[id(p)]
            out.append(row)
        return out
