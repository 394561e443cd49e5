"""Corpus SQL dialect → Spark SQL resolver.

The reference's SQL front-end accepts call shapes Spark's parser can't
take verbatim (reference tests/bin/tests.sql):

- ``V_SEARCH('text_embedding', [0.1, 0.2])`` — the *field name is a
  string* resolved against the collection config, and the metric is the
  field's configured metric (reference src/utils.rs field resolution;
  tests.sql:16,30-31,355,364)
- ``V_SEARCH('43cf51e2-...')`` — search by point id (tests.sql:22)
- ``V_SEARCH([0.1, 0.2])`` — unnamed/default-field search (tests.sql:10)
- ``[0.1, 0.2]`` bracket array literals (everywhere)
- ``payload->'key'`` / ``payload->>'key'`` JSON access (tests.sql:357,366)

:func:`corpus_sql` resolves these against a
:class:`~qdrant_datafusion_spark.collections.CollectionDescriptor` at
*registration level* — the same resolution the reference does when it
builds the query plan — producing plain Spark SQL that runs through
Catalyst with the inlined SQL-defined V_* kernels (no Python boundary).
Scores keep the Qdrant convention (higher = better): distance metrics are
emitted negated.
"""

from __future__ import annotations

import re

from qdrant_datafusion_spark.collections import CollectionDescriptor

#: metric → SQL score expression template over (column_expr, query_expr);
#: V_SEARCH is the cosine kernel, V_DISTANCE handles the distance metrics
_SCORE_TEMPLATES = {
    "cosine": "V_SEARCH({c}, {q})",
    "dot": "(-V_DISTANCE({c}, {q}, 'dot'))",
    "euclid": "(-V_DISTANCE({c}, {q}, 'euclid'))",
    "manhattan": "(-V_DISTANCE({c}, {q}, 'manhattan'))",
}

#: array literal: ``[`` not preceded by an identifier char / ``]`` / ``)``
#: (those are indexing), spanning non-bracket content
_ARRAY_LIT = re.compile(r"(?<![\w\]\)])\[([^\[\]]*)\]")

#: ``expr->'key'`` / ``expr->>'key'`` (qualified identifiers allowed)
_ARROW_BOOL = re.compile(r"->\s*'(\w+)'\s*=\s*(true|false)\b", re.IGNORECASE)
_ARROW = re.compile(r"(\w+(?:\.\w+)*)\s*->>?\s*'(\w+)'")


def _score_expr(descriptor: CollectionDescriptor, field, query_sql: str) -> str:
    col = "vector" if descriptor.unnamed else field.name
    c = f"CAST({col} AS ARRAY<DOUBLE>)"
    return _SCORE_TEMPLATES[field.metric].format(c=c, q=query_sql)


def _find_call(text: str, name: str, start: int = 0) -> tuple[int, int, str] | None:
    """Locate ``name( ... )`` with balanced parens; returns
    (call_start, call_end_exclusive, args_text)."""
    m = re.compile(rf"\b{name}\s*\(", re.IGNORECASE).search(text, start)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(text) and depth:
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(f"unbalanced parens in {name} call")
    return m.start(), i, text[m.end() : i - 1]


def _split_top_level(args: str) -> list[str]:
    """Split call arguments on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def corpus_sql(
    text: str, descriptor: CollectionDescriptor, view: str = "collection_name"
) -> str:
    """Resolve one corpus-dialect statement to executable Spark SQL.

    ``view`` is the temp-view name the collection is registered under
    (the corpus writes ``FROM collection_name``).  Resolution order:
    arrow-JSON access, bracket array literals, then V_SEARCH call-shape
    dispatch (named field / by-id / default field) with the metric taken
    from the descriptor — mirroring the reference's config-driven scoring
    (tests/e2e.rs:127-148).
    """
    text = text.strip().rstrip(";")
    # JSON arrows: boolean compares first (JSON scalars read back as text)
    text = _ARROW_BOOL.sub(lambda m: f"->'{m.group(1)}' = '{m.group(2).lower()}'", text)
    text = _ARROW.sub(lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')", text)
    # bracket array literals -> array(...)
    text = _ARRAY_LIT.sub(lambda m: f"array({m.group(1)})", text)

    fields = {f.name: f for f in descriptor.fields}
    default_field = descriptor.fields[0]
    pos = 0
    while True:
        found = _find_call(text, "V_SEARCH", pos)
        if not found:
            break
        start, end, args_text = found
        args = _split_top_level(args_text)
        first = args[0] if args else ""
        quoted = re.fullmatch(r"'([^']*)'", first)
        if quoted and len(args) == 2 and quoted.group(1) in fields:
            # named-field form: column + metric from collection config
            repl = _score_expr(descriptor, fields[quoted.group(1)], args[1])
        elif quoted and len(args) == 1:
            # by-id form: score against the point's own default vector
            f = default_field
            col = "vector" if descriptor.unnamed else f.name
            sub = (
                f"(SELECT first(CAST({col} AS ARRAY<DOUBLE>)) FROM {view}"
                f" WHERE id = '{quoted.group(1)}')"
            )
            repl = _score_expr(descriptor, f, sub)
        elif len(args) == 1:
            # default-field form: V_SEARCH([..]) / V_SEARCH(expr)
            repl = _score_expr(descriptor, default_field, args[0])
        else:
            # already-resolved two-arg (column, query) form: leave as-is
            pos = end
            continue
        text = text[:start] + repl + text[end:]
        pos = start + len(repl)
    return text
