"""Wire-format point deserialization: gRPC ``ScoredPoint`` → columnar rows.

The reference's live read path deserializes Qdrant query responses into
Arrow batches (reference ``src/arrow/deserialize.rs``): normalize each
point's vectors out of BOTH protobuf generations (``:74-108``), then run
one schema-driven extraction pass per point with one extractor per output
field (``:121-287``).  This module is that converter for the Spark
connector seam: wire points are modeled as plain dicts shaped like the
protobuf JSON mapping (what any Python gRPC/REST Qdrant client yields),
and the output rows match :meth:`CollectionDescriptor.schema` exactly, so
a live connector can feed pages straight into
``sources.collection_source.CollectionReader.read``.

Semantics mirrored 1:1 (each cites deserialize.rs):

- vector normalization precedence (``:76-108``): current-format
  dense/sparse/multidense first; then deprecated ``data+vectors_count``
  (multi), ``data+indices`` (sparse), bare ``data`` (dense); empty → none
- deprecated multi-vector splitting validates divisibility (``:41-58``)
- unnamed vectors land under the literal key ``vector`` (``:322-327``)
- id: numeric ids render as strings, uuid passes through, an id message
  with no options renders ``""`` (``:222-236``).  A wholly missing id
  also renders ``""``: the schema declares ``id`` non-nullable
  (schema.rs:61 / collections.py:87), so the reference's
  ``append_null`` there would fail its own ``RecordBatch::try_new``
  validation — coercing to the sentinel keeps the declared contract
- payload: non-empty map → one JSON string column, empty → null
  (``:238-246``); keys are sorted for cross-run determinism (the
  reference serializes a HashMap, i.e. makes no order promise)
- per-field extraction by schema: ``id`` / ``payload`` by name,
  ``*_indices`` / ``*_values`` rebind to the sparse vector of the base
  field name, ``array<array<float>>`` fields take multi-vectors, other
  array fields take dense vectors; a missing/mismatched vector is null
  (``:124-148``, ``:243-284``)

Scale: a live connector calls :func:`points_to_rows` per gRPC page (the
reference builds one RecordBatch per query response the same way) inside
``DataSourceReader.read`` — per-partition on executors, never on the
driver.
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "convert_to_multi_vector",
    "vector_from_output",
    "vector_lookup",
    "points_to_rows",
    "points_to_dataframe",
]


def convert_to_multi_vector(
    data: Sequence[float], vectors_count: int
) -> list[list[float]]:
    """Split a deprecated-format flat buffer into ``vectors_count`` rows
    (reference deserialize.rs:41-58, incl. the divisibility error)."""
    if vectors_count <= 0 or len(data) % vectors_count != 0:
        raise ValueError(
            f"Malformed multi vector: data length {len(data)} is not "
            f"divisible by vectors count {vectors_count}"
        )
    chunk = len(data) // vectors_count
    return [list(data[i : i + chunk]) for i in range(0, len(data), chunk)]


def vector_from_output(vo: Mapping[str, Any] | None) -> tuple[str, Any] | None:
    """Normalize one ``VectorOutput`` into ``(kind, content)`` where kind is
    ``dense`` / ``sparse`` / ``multi`` — the Python analogue of the
    reference's ``Vector::from_vector_output`` (deserialize.rs:74-108),
    same precedence order across both protobuf generations."""
    if not vo:
        return None
    current = vo.get("vector")
    if current:
        if "dense" in current:
            return ("dense", list(current["dense"]["data"]))
        if "sparse" in current:
            sp = current["sparse"]
            return ("sparse", (list(sp["indices"]), list(sp["values"])))
        if "multi_dense" in current:
            return (
                "multi",
                [list(v["data"]) for v in current["multi_dense"]["vectors"]],
            )
    data = vo.get("data") or []
    vectors_count = vo.get("vectors_count")
    if vectors_count is not None:
        try:
            return ("multi", convert_to_multi_vector(data, vectors_count))
        except ValueError:
            pass  # fall through, as the reference's `if let Ok(..)` does
    indices = vo.get("indices")
    if indices is not None:
        return ("sparse", (list(indices["data"]), list(data)))
    if not data:
        return None
    return ("dense", list(data))


def vector_lookup(vectors: Mapping[str, Any] | None) -> dict[str, tuple[str, Any]]:
    """Flatten a ``VectorsOutput`` into name → normalized vector; the
    unnamed form keys under the literal ``vector``
    (deserialize.rs:316-340)."""
    out: dict[str, tuple[str, Any]] = {}
    if not vectors:
        return out
    if "vector" in vectors:  # unnamed single vector
        norm = vector_from_output(vectors["vector"])
        if norm is not None:
            out["vector"] = norm
    elif "vectors" in vectors:  # named map
        for name, vo in vectors["vectors"].items():
            norm = vector_from_output(vo)
            if norm is not None:
                out[name] = norm
    return out


def _point_id(pid: Mapping[str, Any] | None) -> str:
    if pid is None:
        return ""  # see module docstring: id is declared non-nullable
    if "num" in pid:
        return str(pid["num"])
    if "uuid" in pid:
        return pid["uuid"]
    return ""  # id message present but no options (deserialize.rs:230)


def _is_multi_field(field: T.StructField) -> bool:
    return isinstance(field.dataType, T.ArrayType) and isinstance(
        field.dataType.elementType, T.ArrayType
    )


def points_to_rows(
    points: Sequence[Mapping[str, Any]], schema: T.StructType
) -> list[tuple]:
    """Schema-driven single-pass extraction: one output cell per schema
    field per point, in schema order (deserialize.rs:121-287)."""
    rows: list[tuple] = []
    for point in points:
        lookup = vector_lookup(point.get("vectors"))
        payload = point.get("payload")
        cells: list[Any] = []
        for field in schema.fields:
            name = field.name
            if name == "id":
                cells.append(_point_id(point.get("id")))
            elif name == "payload":
                cells.append(
                    json.dumps(payload, sort_keys=True) if payload else None
                )
            elif name.endswith("_indices"):
                norm = lookup.get(name[: -len("_indices")])
                cells.append(norm[1][0] if norm and norm[0] == "sparse" else None)
            elif name.endswith("_values"):
                norm = lookup.get(name[: -len("_values")])
                cells.append(norm[1][1] if norm and norm[0] == "sparse" else None)
            elif _is_multi_field(field):
                norm = lookup.get(name)
                cells.append(norm[1] if norm and norm[0] == "multi" else None)
            else:
                norm = lookup.get(name)
                cells.append(norm[1] if norm and norm[0] == "dense" else None)
        rows.append(tuple(cells))
    return rows


def points_to_dataframe(
    spark: SparkSession,
    points: Sequence[Mapping[str, Any]],
    schema: T.StructType,
) -> DataFrame:
    """Wire points → DataFrame with the collection's exact schema — the
    driver-side convenience; a live connector uses :func:`points_to_rows`
    per page inside the reader instead."""
    return spark.createDataFrame(points_to_rows(points, schema), schema)
