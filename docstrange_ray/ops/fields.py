"""Schema-driven field extraction: ``extract_fields(ds,
specified_fields=[...])`` / ``extract_with_schema(ds, json_schema={...})``.

The reference's most-used structured-output API
(``ConversionResult.extract_data(specified_fields=..., json_schema=...)``,
result.py:940-1018; CLI surface cli.py:281-289) sends the document and
the field list to an LLM (Ollama/cloud). No LLM runs in this engine, so
this is the DETERMINISTIC rules-based analogue with the same API shape —
field values are recovered from the typed spans directly:

  1. table spans: a 2-column row whose first cell matches the field
     name, or a header column matching the field name (value = the
     first data row's cell in that column);
  2. text/list spans: a ``key: value`` / ``key = value`` / ``key - value``
     line whose key matches the field name;

with field-name matching normalized (case-insensitive, underscores /
hyphens / spaces equivalent). A real LLM backend would slot behind the
same (ds, fields) -> rows contract as an actor-pool stage (the A4-A6
seam in SURVEY.md §2.3).

Scale shape: stateless ``map_batches`` over the extracted corpus, no
shuffle; the field list is tiny and closure-captured.
"""

from __future__ import annotations

import re

import pyarrow as pa

from docstrange_ray.projections import parse_table_text

_NORM = re.compile(r"[^a-z0-9]+")


def _norm(name: str) -> str:
    return _NORM.sub(" ", str(name).lower()).strip()


def _kv_patterns(field_norm: str):
    # 'total amount' matches 'Total Amount: 12', 'total_amount = 12', ...
    words = [re.escape(w) for w in field_norm.split()]
    key = r"[\s_\-]*".join(words)
    return re.compile(rf"^\W*{key}\s*[:=\-]\s*(.+)$", re.IGNORECASE)


def extract_fields_from_spans(spans: list[dict], fields: list[str]) -> dict:
    """{field: value-or-None} for one document's extracted spans."""
    out: dict[str, str | None] = {f: None for f in fields}
    norms = {f: _norm(f) for f in fields}
    patterns = {f: _kv_patterns(n) for f, n in norms.items()}

    tables = [parse_table_text(s.get("text", "")) for s in spans if s["kind"] == "table"]
    lines: list[str] = []
    for s in spans:
        if s["kind"] in ("text", "list_item", "blockquote"):
            lines.extend(s.get("text", "").split("\n"))

    for field in fields:
        want = norms[field]
        # 1a. two-column table rows: first cell is the key (skip the
        # header row — a field matching a HEADER cell is the column
        # rule's job, 1b)
        for grid in tables:
            for row in grid[1:] if len(grid) > 1 else grid:
                if len(row) >= 2 and _norm(row[0]) == want and row[1].strip():
                    out[field] = row[1].strip()
                    break
            if out[field] is not None:
                break
        if out[field] is not None:
            continue
        # 1b. header column match: value from the first data row
        for grid in tables:
            if len(grid) >= 2:
                for ci, header in enumerate(grid[0]):
                    if _norm(header) == want and ci < len(grid[1]):
                        val = grid[1][ci].strip()
                        if val:
                            out[field] = val
                            break
            if out[field] is not None:
                break
        if out[field] is not None:
            continue
        # 2. key: value lines in prose/list/quote spans
        pat = patterns[field]
        for line in lines:
            m = pat.match(line.strip().lstrip("->•* "))
            if m:
                out[field] = m.group(1).strip()
                break
    return out


_FIELDS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("field", pa.string()),
        ("value", pa.string()),
        ("found", pa.bool_()),
    ]
)


def extract_fields(ds, specified_fields: list[str]):
    """Dataset op: extracted (doc_id, spans) -> one row per (doc, field)
    with the recovered value ('' when absent, found=False). Mirrors the
    reference's ``extract_data(specified_fields=...)`` contract
    (result.py:961-969)."""
    fields = list(specified_fields)

    def extract(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            got = extract_fields_from_spans(list(spans or []), fields)
            for f in fields:
                rows.append(
                    {
                        "doc_id": did,
                        "field": f,
                        "value": got[f] or "",
                        "found": got[f] is not None,
                    }
                )
        return pa.Table.from_pylist(rows, schema=_FIELDS_SCHEMA)

    return ds.map_batches(extract, batch_format="pyarrow")


def _cast(value: str | None, typ: str):
    if value is None:
        return None
    try:
        if typ == "integer":
            return int(float(value.replace(",", "")))
        if typ == "number":
            return float(value.replace(",", ""))
        if typ == "boolean":
            return value.strip().lower() in ("true", "yes", "1", "y")
    except (ValueError, AttributeError):
        return None
    return value


def _collect_all(spans: list[dict], field: str) -> list[str]:
    """Every value for ``field``: all matching two-column table rows,
    all cells of a matching header column, all key:value lines — the
    scalar-array rule (``{"type": "array", "items": {scalar}}``)."""
    want = _norm(field)
    pat = _kv_patterns(want)
    out: list[str] = []
    for s in spans:
        if s["kind"] == "table":
            grid = parse_table_text(s.get("text", ""))
            for row in grid[1:] if len(grid) > 1 else grid:
                if len(row) >= 2 and _norm(row[0]) == want and row[1].strip():
                    out.append(row[1].strip())
            if len(grid) >= 2:
                for ci, header in enumerate(grid[0]):
                    if _norm(header) == want:
                        out.extend(
                            r[ci].strip()
                            for r in grid[1:]
                            if ci < len(r) and r[ci].strip()
                        )
        elif s["kind"] in ("text", "list_item", "blockquote"):
            for line in s.get("text", "").split("\n"):
                m = pat.match(line.strip().lstrip("->•* "))
                if m:
                    out.append(m.group(1).strip())
    return out


def _table_records(spans: list[dict], props: dict) -> list[dict]:
    """Array-of-object rule: the first table whose (normalized) headers
    cover every property name yields one object per data row, cells
    cast to the declared types."""
    wants = {_norm(p): p for p in props}
    for s in spans:
        if s["kind"] != "table":
            continue
        grid = parse_table_text(s.get("text", ""))
        if len(grid) < 2:
            continue
        col_of = {}
        for ci, header in enumerate(grid[0]):
            hn = _norm(header)
            if hn in wants and wants[hn] not in col_of:
                col_of[wants[hn]] = ci
        if len(col_of) == len(props):
            recs = []
            for row in grid[1:]:
                rec = {}
                for p, ci in col_of.items():
                    typ = props[p].get("type", "string") if isinstance(props[p], dict) else "string"
                    val = row[ci].strip() if ci < len(row) else ""
                    rec[p] = _cast(val or None, typ)
                recs.append(rec)
            return recs
    return []


def _extract_node(spans: list[dict], name: str, node: dict, path: list[str]):
    """Recursive schema walk (nested objects / arrays — VERDICT r4 #10,
    reference contract result.py:971-977 where the LLM conforms output
    to an arbitrary JSON schema; here the deterministic rules recurse):

    * scalar type -> first match; the dotted path name ('address city')
      is tried before the bare leaf name, so nested keys can
      disambiguate ('billing city' vs 'shipping city');
    * object -> recurse into properties;
    * array of scalars -> EVERY match, each cast;
    * array of objects -> the first table whose headers cover the item
      properties, one object per data row.
    """
    typ = node.get("type", "string") if isinstance(node, dict) else "string"
    if typ == "object":
        props = node.get("properties", {})
        return {
            p: _extract_node(spans, p, sub, path + [name])
            for p, sub in props.items()
        }
    if typ == "array":
        items = node.get("items", {"type": "string"})
        it = items.get("type", "string") if isinstance(items, dict) else "string"
        if it == "object":
            return _table_records(spans, items.get("properties", {}))
        return [_cast(v, it) for v in _collect_all(spans, name)]
    # scalar: dotted-path first, then the bare leaf name
    for candidate in ([" ".join(path + [name])] if path else []) + [name]:
        got = extract_fields_from_spans(spans, [candidate])[candidate]
        if got is not None:
            return _cast(got, typ)
    return None


def extract_schema_from_spans(spans: list[dict], json_schema: dict) -> dict:
    """One document's spans -> a dict conforming to ``json_schema``
    (``{"properties": {...}}`` or the flat ``{name: {"type": ...}}``
    shorthand; nested objects and arrays supported)."""
    props = json_schema.get("properties", json_schema)
    return {p: _extract_node(spans, p, node, []) for p, node in props.items()}


def extract_with_schema(ds, json_schema: dict):
    """Dataset op for the ``json_schema`` variant (result.py:971-977):
    values cast to declared types, nested objects recursed, arrays
    collected (scalar arrays = every match; object arrays = table rows
    under covering headers); uncastable/missing values surface as null.
    Output: one row per doc with a JSON string column conforming to the
    schema (free-form typed columns would vary per call)."""
    import json as _json

    def extract(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            data = extract_schema_from_spans(list(spans or []), json_schema)
            rows.append(
                {"doc_id": did, "extracted": _json.dumps(data, sort_keys=True)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("doc_id", pa.string()), ("extracted", pa.string())]),
        )

    return ds.map_batches(extract, batch_format="pyarrow")
