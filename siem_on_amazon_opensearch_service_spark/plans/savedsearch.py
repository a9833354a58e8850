"""Saved-search compiler: OpenSearch Dashboards saved-object filters ->
this engine's DQL.

The reference ships its entire query surface as Dashboards saved objects
(/root/reference/source/saved_objects/**/*.ndjson): each saved search's
``attributes.kibanaSavedObjectMeta.searchSourceJSON`` holds a kuery query
string plus a ``filter`` array of typed filter metas — 77 ``phrase``, 15
``phrases`` (is one of), 3 negated phrase, 1 negated phrases, 1 ``exists``
across the shipped dashboards.  This module compiles that JSON shape into
the engine's DQL string, so a user can carry their saved searches over:

    phrase            key:value                  (negate -> NOT key:value)
    phrases           key:(v1 OR v2)             (negate -> NOT key:(...))
    exists            key:*                      (negate -> NOT key:*)
    query string      passed through (the DQL grammar is the kuery subset
                      the saved objects use: terms, AND/OR/NOT, phrases,
                      field:value, wildcards)

Unsupported metas (``custom`` DSL blobs, scripted fields) raise loudly —
silently dropping a filter would change what a dashboard shows.
"""

from __future__ import annotations

import json

#: filter meta types the compiler understands
_SUPPORTED = ("phrase", "phrases", "exists")


def _atom(ftype: str, field: str, params) -> str:
    if ftype == "exists":
        return f"{field}:*"
    if ftype == "phrase":
        value = params.get("query") if isinstance(params, dict) else params
        if value is None:
            raise ValueError(f"phrase filter on {field!r} has no value")
        return f"{field}:{_render_value(str(value), field)}"
    # phrases: list of values -> is-one-of group
    values = [str(v) for v in (params or [])]
    if not values:
        raise ValueError(f"phrases filter on {field!r} has no values")
    rendered = sorted({_render_value(v, field) for v in values})
    if len(rendered) == 1:
        return f"{field}:{rendered[0]}"
    return f"{field}:({' OR '.join(rendered)})"


def _render_value(v: str, field: str) -> str:
    """Values that are not a single bare token render quoted
    (field:"security hub" — the kuery quoted exact-match form)."""
    if not v:
        raise ValueError(f"empty filter value on {field!r}")
    if '"' in v:
        raise ValueError(f"filter value {v!r} on {field!r} contains a quote")
    if any(c.isspace() for c in v) or "(" in v or ")" in v or ":" in v:
        return f'"{v}"'
    return v


def compile_search_source(
    ss: dict, field_map: dict[str, str] | None = None
) -> str:
    """searchSourceJSON dict -> one DQL string (query ANDed with every
    enabled filter, negated filters wrapped in NOT).

    ``field_map`` translates saved-object field names (ECS paths like
    ``event.outcome``) to engine fields; a filter on an unmapped field
    raises — refusing is safer than silently filtering on nothing.  A
    filters-only source compiles to a pure-filter DQL string, which the
    scoring engine rejects at execution (no scoring clause) but
    ``match_count``-style callers may still reject/handle themselves."""
    field_map = field_map or {}
    parts: list[str] = []
    q = (ss.get("query") or {}).get("query") or ""
    if q.strip():
        parts.append(f"({q.strip()})")
    for f in ss.get("filter", []):
        meta = f.get("meta", {})
        if meta.get("disabled"):
            continue
        ftype = meta.get("type")
        if ftype not in _SUPPORTED:
            raise ValueError(
                f"unsupported filter type {ftype!r} (supported: {_SUPPORTED}); "
                "rewrite the filter as a kuery query string"
            )
        key = meta.get("key")
        if key is None:
            raise ValueError(f"filter meta has no key: {meta!r}")
        field = field_map.get(key, key)
        atom = _atom(ftype, field, meta.get("params"))
        parts.append(f"NOT {atom}" if meta.get("negate") else atom)
    if not parts:
        raise ValueError("saved search has no query and no enabled filters")
    return " AND ".join(parts)


def compile_ndjson_line(line: str, field_map: dict[str, str] | None = None) -> str:
    """One saved-object ndjson line -> DQL (digs out
    attributes.kibanaSavedObjectMeta.searchSourceJSON)."""
    obj = json.loads(line)
    meta = obj.get("attributes", {}).get("kibanaSavedObjectMeta", {})
    ss = meta.get("searchSourceJSON")
    if ss is None:
        raise ValueError("line has no searchSourceJSON")
    return compile_search_source(json.loads(ss), field_map)
