"""Remote query construction: projected schema + pushdown → Qdrant request.

The outbound half of the connector seam (``sources.wire`` is the inbound
half).  The reference derives what to fetch from the *projected* Arrow
schema — vector selector from the non-metadata field names
(``src/utils.rs:53-83``), payload flag from the presence of the
``payload`` column (``src/utils.rs:85-110``) — then assembles a
QueryPoints request with those selectors and the plan's limit
(``src/table.rs:269-320``).  This module reproduces that derivation
against the Spark ``StructType`` the DataSource reader is handed after
Catalyst's column pruning, and emits the request as a plain dict shaped
like the QueryPoints JSON any Python Qdrant client accepts.

One deliberate improvement: the reference receives the pushed filters and
silently ignores them (``src/table.rs:174-175``, ``:276`` binds them as
``_filters``).  Here the same pyspark ``Filter`` objects the reader's
``pushFilters`` accepts are translated into the Qdrant filter DSL —
point-id equality/IN to ``has_id``, nested ``payload.<key>`` refs to
``match``/merged-``range`` field conditions — and anything whose remote
semantics would differ from Spark's (null checks on possibly-absent
keys, whole-payload string ops) is returned for local evaluation: the
same accept/reject contract ``pushFilters`` itself uses, so no filter
is ever dropped and every accepted one holds exactly.

Scale: request construction is O(schema) on the driver once per scan;
what matters at 100 TB is what it *removes* from the wire — unprojected
vector columns, unrequested payload, rows past the limit, and rows the
remote can filter server-side.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.datasource import (
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

#: scalar types Qdrant ``match`` can carry EXACTLY: keyword / integer /
#: boolean.  float is deliberately absent — Qdrant has no float match
#: (REST rejects it; the gRPC Match oneof would stringify it), so float
#: equality stays local.  Ranges are double-valued and accept int/float.
_MATCH_VALUE = (int, str, bool)

_METADATA_COLUMNS = ("id", "payload")


def build_vector_selector(schema: StructType) -> bool | list[str]:
    """Projected schema → vector selector (utils.rs:53-83).

    ``False`` = fetch no vectors (metadata-only projection), ``True`` =
    fetch all (unnamed-vector collection), else the sorted list of named
    vectors to fetch.  Sparse column pairs (``f_indices``/``f_values``)
    collapse to their base field name.
    """
    names = set()
    for field in schema.fields:
        name = field.name
        if name in _METADATA_COLUMNS:
            continue
        for suffix in ("_indices", "_values"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        names.add(name)
    if not names:
        return False
    names.discard("vector")  # the unnamed-collection column
    if not names:
        return True
    return sorted(names)


def build_payload_selector(schema: StructType) -> bool:
    """Projected schema → with_payload flag (utils.rs:85-110)."""
    return any(f.name == "payload" for f in schema.fields)


def _filter_conditions(
    filters: list[Filter],
) -> tuple[list[dict], list[dict], list[Filter]]:
    """Spark Filters → (must, must_not, rejected-for-local-eval).

    Only filters with an EXACT remote equivalent translate — a pushed
    filter the reader accepts must hold remotely with Spark semantics:

    - top-level ``id`` equality / IN → ``has_id`` (a field condition on a
      key literally named "id" would match a *payload* field, not the
      point id);
    - nested ``payload.<key>`` refs (a connector exposing payload as a
      struct) → field conditions; comparisons on one key merge into a
      single ``range``;
    - everything else — whole-payload string ops, IsNull/IsNotNull (the
      remote is_null ≠ Spark null semantics for absent keys), Not() —
      comes back for local evaluation.  No filter is ever dropped.
    """
    must: list[dict] = []
    must_not: list[dict] = []
    rejected: list[Filter] = []
    ranges: dict[str, dict[str, Any]] = {}
    _RANGE_OPS = {
        GreaterThan: "gt",
        GreaterThanOrEqual: "gte",
        LessThan: "lt",
        LessThanOrEqual: "lte",
    }
    for f in filters:
        attr = getattr(f, "attribute", None)
        if attr is not None and len(attr) == 1 and attr[0] == "id":
            if isinstance(f, EqualTo) and isinstance(f.value, (str, int)):
                must.append({"has_id": [f.value]})
            elif isinstance(f, In) and all(
                isinstance(v, (str, int)) for v in f.value
            ):
                must.append({"has_id": list(f.value)})
            else:
                rejected.append(f)
            continue
        if attr is None or len(attr) != 2 or attr[0] != "payload":
            rejected.append(f)
            continue
        key = attr[1]
        # exact-only remote subset per value type: Qdrant match supports
        # keyword/integer/bool but NOT float (REST rejects it; the gRPC
        # Match oneof would coerce it to a keyword string and silently
        # match nothing), and Range is double-valued — string bounds
        # (datetimes) belong to a different condition type whose ordering
        # is not Spark's string comparison.  Anything outside the subset
        # is rejected to local evaluation, never dropped.
        if isinstance(f, EqualTo) and isinstance(f.value, _MATCH_VALUE):
            must.append({"key": key, "match": {"value": f.value}})
        elif (
            type(f) in _RANGE_OPS
            and isinstance(f.value, (int, float))
            and not isinstance(f.value, bool)
        ):
            op = _RANGE_OPS[type(f)]
            if op in ranges.setdefault(key, {}):  # contradictory duplicate
                rejected.append(f)
            else:
                ranges[key][op] = f.value
        elif isinstance(f, In) and all(
            isinstance(v, _MATCH_VALUE) for v in f.value
        ):
            must.append({"key": key, "match": {"any": list(f.value)}})
        else:
            rejected.append(f)  # null checks / string ops: semantics differ
    for key in sorted(ranges):
        must.append({"key": key, "range": ranges[key]})
    return must, must_not, rejected


def build_query_request(
    collection: str,
    schema: StructType,
    limit: int | None = None,
    filters: list[Filter] | None = None,
) -> tuple[dict, list[Filter]]:
    """Assemble the QueryPoints request the scan would dispatch
    (table.rs:269-320) and the filters that must stay local.

    The request carries exactly what the projected plan needs: the
    derived vector/payload selectors, the plan limit, and the
    translatable filter conditions.
    """
    selector = build_vector_selector(schema)
    request: dict[str, Any] = {
        "collection_name": collection,
        "with_vectors": {"names": selector} if isinstance(selector, list) else selector,
        "with_payload": build_payload_selector(schema),
    }
    if limit is not None:
        request["limit"] = int(limit)
    must, must_not, rejected = _filter_conditions(list(filters or []))
    if must or must_not:
        request["filter"] = {}
        if must:
            request["filter"]["must"] = must
        if must_not:
            request["filter"]["must_not"] = must_not
    return request, rejected
