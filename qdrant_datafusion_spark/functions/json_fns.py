"""JSON payload surface.

The reference's only implemented function code registers an external JSON
suite over the ``payload`` Utf8 column (reference src/udfs.rs:13-16 →
datafusion-functions-json: json_get, ->/->> rewrites, json_contains, ...).
Spark has the same surface natively (`get_json_object`, `json_tuple`,
`from_json`), so these helpers are thin, codegen-friendly wrappers that
match the corpus call shapes:

- ``payload_get(col, 'address.city')``  ↔  ``payload->'address'->'city'``
  (tests/bin/tests.sql:217-226 nested chaining)
- ``has_field``                         ↔  ``HAS_FIELD(payload, 'field')``
  (tests/bin/tests.sql:203-207)
- ``payload_contains``                  ↔  ``payload->'tags' @> '["x"]'``
  (tests/bin/tests.sql:224)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.distance import _as_col, ColumnOrName


def _path(field_path: str) -> str:
    """'address.city' -> '$.address.city' (already-$ paths pass through)."""
    return field_path if field_path.startswith("$") else "$." + field_path


def payload_get(payload: ColumnOrName, field_path: str) -> Column:
    """String value at a (possibly nested) JSON path; NULL if absent."""
    return F.get_json_object(_as_col(payload), _path(field_path))


def payload_get_float(payload: ColumnOrName, field_path: str) -> Column:
    """Numeric value at a JSON path (the `payload->'price' > 100` shape,
    tests/bin/tests.sql:56-59)."""
    return payload_get(payload, field_path).cast("double")


def has_field(payload: ColumnOrName, field_path: str) -> Column:
    """JSON key existence — ``HAS_FIELD`` (tests/bin/tests.sql:203-207).

    NULL payload → false (a missing document has no fields).  Note: a key
    explicitly set to JSON null reads as absent, same as the reference's
    json_get-based existence idiom.
    """
    return payload_get(payload, field_path).isNotNull()


def payload_contains(payload: ColumnOrName, field_path: str, value) -> Column:
    """JSON array containment — the ``@>`` operator shape
    (``payload->'tags' @> '["electronics"]'``, tests/bin/tests.sql:224).

    Parses the array at ``field_path`` and checks membership of ``value``.
    """
    arr = F.from_json(payload_get(payload, field_path), "array<string>")
    return F.array_contains(arr, value)


def json_length(payload: ColumnOrName) -> Column:
    """Element count of a JSON array, or key count of a JSON object —
    the datafusion-functions-json ``json_length`` semantics the reference
    registers wholesale (reference src/udfs.rs:13-16).  Scalar / invalid
    JSON → NULL.  Composed from two Spark natives, so it stays inside
    codegen: ``json_array_length`` answers arrays (NULL on objects) and
    ``size(json_object_keys(...))`` answers objects (NULL on arrays under
    ANSI null-size semantics)."""
    c = _as_col(payload)
    return F.coalesce(F.json_array_length(c), F.size(F.json_object_keys(c)))


def json_keys(payload: ColumnOrName) -> Column:
    """Top-level key list of a JSON object (``json_object_keys`` in both
    the reference's registered suite and Spark natively); NULL for
    non-objects."""
    return F.json_object_keys(_as_col(payload))


# ---------------------------------------------------------------------------
# Spark 4 VariantType path — the modern engine-native encoding for the
# reference's JSON payload surface (SURVEY.md §1.4/§2.8).  parse_json
# produces a binary variant; variant_get extracts typed values with path
# semantics matching the -> / json_get chains.  Prefer this at scale: a
# variant parses the JSON once, while get_json_object re-parses per call.
# ---------------------------------------------------------------------------


def payload_variant(payload: ColumnOrName) -> Column:
    """Parse the JSON payload string into a Spark 4 VARIANT value."""
    return F.parse_json(_as_col(payload))


def variant_get_float(payload: ColumnOrName, field_path: str) -> Column:
    """Numeric value at a JSON path via the variant encoding; NULL if the
    path is absent or non-numeric (try_variant_get, not ANSI error)."""
    return F.try_variant_get(payload_variant(payload), _path(field_path), "double")


def variant_get_string(payload: ColumnOrName, field_path: str) -> Column:
    """String value at a JSON path via the variant encoding."""
    return F.try_variant_get(payload_variant(payload), _path(field_path), "string")


def variant_has_field(payload: ColumnOrName, field_path: str) -> Column:
    """HAS_FIELD over the variant encoding (NULL payload → false).

    Unlike the string-path :func:`has_field`, a key explicitly set to
    JSON null reads as PRESENT here: the variant extraction yields a
    non-null variant encoding JSON null, so existence and value-null are
    distinguishable (pinned in test_functions.py).
    """
    return F.try_variant_get(
        payload_variant(payload), _path(field_path), "variant"
    ).isNotNull()
