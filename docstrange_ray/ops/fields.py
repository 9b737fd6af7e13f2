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


def extract_with_schema(ds, json_schema: dict):
    """Dataset op for the ``json_schema`` variant
    (result.py:971-977): schema ``{"properties": {name: {"type": ...}}}``
    (or the flat ``{name: {"type": ...}}`` shorthand); values are cast
    to the declared type, uncastable/missing values surface as null.
    Output: one row per doc with a JSON string column conforming to the
    schema (free-form typed columns would vary per call)."""
    import json as _json

    props = json_schema.get("properties", json_schema)
    fields = list(props)
    types = {f: (props[f].get("type", "string") if isinstance(props[f], dict) else "string") for f in fields}

    def extract(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            got = extract_fields_from_spans(list(spans or []), fields)
            data = {f: _cast(got[f], types[f]) for f in fields}
            rows.append(
                {"doc_id": did, "extracted": _json.dumps(data, sort_keys=True)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("doc_id", pa.string()), ("extracted", pa.string())]),
        )

    return ds.map_batches(extract, batch_format="pyarrow")
