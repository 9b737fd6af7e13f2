"""Output-format projections: spans → markdown / JSON tree / HTML / CSV.

The reference re-derives every output format from its markdown IR with
regex parsers (result.py:704-1106). Our IR is typed spans, so each
projection is a trivial per-row walk — exposed both as plain functions
(for tests/oracle) and as vectorized ``map_batches`` UDFs adding a
column to the extracted Dataset.

  * spans_to_markdown — the markdown serialization (the reference's
    ``ConversionResult.content``, result.py:704-710)
  * spans_to_json     — hierarchical section tree built from heading
    levels with a level stack (result.py:31-108, :325-353 — M1)
  * spans_to_html     — per-kind HTML rendering with escaping
    (result.py:356-686 — M2)
  * spans_to_csv      — table spans serialized via csv.writer with
    ``=== Table N ===`` separators (result.py:1028-1106 — M3)
"""

from __future__ import annotations

import csv
import html as _html
import io
import json
import re

import pyarrow as pa

_TABLE_LINE = re.compile(r"^\|(.+)\|$")
_SEP_LINE = re.compile(r"^\|[-\s|:]+\|$")
_HEADING_LEVEL = re.compile(r"^(#{1,6})\s+")
# inline [text](url) links (reference link_pattern, result.py:25; images
# are separate spans in this engine so no negative lookbehind needed)
_LINK = re.compile(r"\[([^\]]+)\]\(([^)]+)\)")


def _heading_level(text: str) -> int:
    m = _HEADING_LEVEL.match(text)
    return len(m.group(1)) if m else 1


def _heading_title(text: str) -> str:
    return _HEADING_LEVEL.sub("", text).strip()


def parse_table_text(text: str) -> list[list[str]]:
    """Markdown table text -> grid (header + body, separator dropped) —
    the span-level equivalent of the reference's table regex
    (result.py:26 — M4)."""
    grid: list[list[str]] = []
    for line in text.split("\n"):
        line = line.strip()
        if not _TABLE_LINE.match(line) or _SEP_LINE.match(line):
            continue
        # split on unescaped pipes only, then unescape
        cells = [
            c.strip().replace("\\|", "|")
            for c in re.split(r"(?<!\\)\|", line.strip("|"))
        ]
        grid.append(cells)
    return grid


# --- markdown ---------------------------------------------------------------


def spans_to_markdown(spans: list[dict]) -> str:
    parts: list[str] = []
    for s in spans:
        kind = s["kind"]
        if kind == "image-ref":
            parts.append(f"![{s.get('text', '')}]({s.get('media_ref', '')})")
        else:
            parts.append(s.get("text", ""))
    return "\n\n".join(p for p in parts if p)


# --- JSON tree --------------------------------------------------------------


def spans_to_json(spans: list[dict]) -> dict:
    """Build the reference-shaped document tree: sections keyed by heading
    level with content buckets, conditionally-present keys
    (result.py:115-146), plus the per-doc stats the reference computes
    (result.py:99-106 — G1)."""
    root: dict = {"title": None, "level": 0, "content": {}, "subsections": []}
    stack = [root]
    counts = {"sections": 0, "max_level": 0}

    def bucket(name: str) -> list:
        cur = stack[-1]["content"]
        return cur.setdefault(name, [])

    for s in spans:
        kind = s["kind"]
        text = s.get("text", "")
        if kind == "heading":
            level = _heading_level(text)
            sec = {
                "title": _heading_title(text),
                "level": level,
                "content": {},
                "subsections": [],
            }
            while len(stack) > 1 and stack[-1]["level"] >= level:
                stack.pop()
            stack[-1]["subsections"].append(sec)
            stack.append(sec)
            counts["sections"] += 1
            counts["max_level"] = max(counts["max_level"], level)
        elif kind == "text":
            bucket("paragraphs").append(text)
            for m in _LINK.finditer(text):
                # per-section links bucket (reference result.py:289-302)
                bucket("links").append({"text": m.group(1), "url": m.group(2)})
        elif kind == "list_item":
            bucket("lists").append(text)
        elif kind == "code":
            bucket("code_blocks").append(text)
        elif kind == "table":
            grid = parse_table_text(text)
            bucket("tables").append(
                {
                    "type": "structured_table",
                    "grid": grid,
                    "num_rows": len(grid),
                    "num_cols": max((len(r) for r in grid), default=0),
                }
            )
        elif kind == "image-ref":
            bucket("images").append(
                {"alt": text, "src": s.get("media_ref", "")}
            )
        elif kind == "blockquote":
            # reference extracts the quote text with '>' prefixes stripped
            # (result.py:304-312)
            for line in text.split("\n"):
                stripped = re.sub(r"^>\s?", "", line).strip()
                if stripped:
                    bucket("blockquotes").append(stripped)
        # 'hr' has no JSON-tree presence (the reference's parser drops it)

    def strip_empty(sec: dict) -> dict:
        out = {"title": sec["title"], "level": sec["level"]}
        if sec["content"]:
            out["content"] = sec["content"]
        if sec["subsections"]:
            out["subsections"] = [strip_empty(x) for x in sec["subsections"]]
        return out

    return {
        "document": {
            "sections": [strip_empty(x) for x in root["subsections"]],
            **({"content": root["content"]} if root["content"] else {}),
            "metadata": {
                "section_count": counts["sections"],
                "max_heading_level": counts["max_level"],
                "has_tables": any(s["kind"] == "table" for s in spans),
                "has_code": any(s["kind"] == "code" for s in spans),
                "has_lists": any(s["kind"] == "list_item" for s in spans),
                "has_images": any(s["kind"] == "image-ref" for s in spans),
            },
        }
    }


# --- HTML -------------------------------------------------------------------

_INLINE_RULES = (
    (re.compile(r"\*\*([^*]+)\*\*"), r"<strong>\1</strong>"),
    (re.compile(r"\*([^*]+)\*"), r"<em>\1</em>"),
    (re.compile(r"`([^`]+)`"), r"<code>\1</code>"),
    (re.compile(r"\[([^\]]*)\]\(([^)]+)\)"), r'<a href="\2">\1</a>'),
)


def _inline_html(text: str) -> str:
    out = _html.escape(text, quote=False)
    for pat, repl in _INLINE_RULES:
        out = pat.sub(repl, out)
    return out


def spans_to_html(spans: list[dict]) -> str:
    """Per-kind HTML rendering in the reference's pass order semantics
    (code → tables → blockquotes → headers → lists → inline → paragraphs,
    result.py:382-408) — here a single walk since spans are typed."""
    parts: list[str] = []
    list_open = False

    def close_list() -> None:
        nonlocal list_open
        if list_open:
            parts.append("</ul>")
            list_open = False

    for s in spans:
        kind = s["kind"]
        text = s.get("text", "")
        if kind == "heading":
            close_list()
            lvl = _heading_level(text)
            parts.append(f"<h{lvl}>{_inline_html(_heading_title(text))}</h{lvl}>")
        elif kind == "code":
            close_list()
            body = re.sub(r"^```[^\n]*\n?|\n?```$", "", text)
            parts.append(f"<pre><code>{_html.escape(body, quote=False)}</code></pre>")
        elif kind == "table":
            close_list()
            grid = parse_table_text(text)
            if grid:
                rows = ["<tr>" + "".join(f"<th>{_inline_html(c)}</th>" for c in grid[0]) + "</tr>"]
                rows += [
                    "<tr>" + "".join(f"<td>{_inline_html(c)}</td>" for c in row) + "</tr>"
                    for row in grid[1:]
                ]
                parts.append("<table>" + "".join(rows) + "</table>")
        elif kind == "list_item":
            if not list_open:
                parts.append("<ul>")
                list_open = True
            item = re.sub(r"^([-*+]|\d+\.|[a-zA-Z]\.)\s+", "", text)
            parts.append(f"<li>{_inline_html(item)}</li>")
        elif kind == "image-ref":
            close_list()
            parts.append(
                f'<img src="{_html.escape(s.get("media_ref", ""))}" alt="{_html.escape(text)}">'
            )
        elif kind == "blockquote":
            close_list()
            body = re.sub(r"^>\s?", "", text, flags=re.M)
            parts.append(f"<blockquote>{_inline_html(body)}</blockquote>")
        elif kind == "hr":
            close_list()
            parts.append("<hr>")  # reference result.py:510-512
        else:
            close_list()
            if text.startswith(">"):
                body = re.sub(r"^>\s?", "", text, flags=re.M)
                parts.append(f"<blockquote>{_inline_html(body)}</blockquote>")
            else:
                parts.append(f"<p>{_inline_html(text)}</p>")
    close_list()
    return "\n".join(parts)


# --- CSV --------------------------------------------------------------------


def spans_to_csv(spans: list[dict], include_separators: bool = True) -> str:
    """All table spans as CSV, '=== Table N ===' separators between
    multiple tables (result.py:1028-1106)."""
    tables = [parse_table_text(s["text"]) for s in spans if s["kind"] == "table"]
    tables = [g for g in tables if g]
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    for i, grid in enumerate(tables):
        if include_separators and len(tables) > 1:
            buf.write(f"=== Table {i + 1} ===\n")
        writer.writerows(grid)
        if include_separators and len(tables) > 1 and i < len(tables) - 1:
            buf.write("\n")
    return buf.getvalue()


# --- Section chunking (MCP navigation surface) ------------------------------


def spans_to_chunks(spans: list[dict], token_budget: int = 4000) -> list[dict]:
    """Greedy token-budget section packing — the span-level rebuild of the
    reference MCP server's chunking (mcp_server_module/server.py:183-220):
    markdown is split into header-delimited sections, token counts are
    estimated (len//4, the reference's tiktoken fallback,
    server.py:78-86), and consecutive sections pack into chunks while the
    budget holds; an oversize section becomes its own chunk.

    Tokenizer-parity bound: chunk boundaries match the reference's
    FALLBACK path (no tiktoken installed) exactly. Against a
    cl100k_base-equipped reference they diverge where len//4 misprices
    the text: cl100k averages ~4 chars/token on English prose (the
    estimate is tight there), ~3.2 on punctuation/code-heavy text
    (chunks overshoot the true budget by up to ~4/3.2 = 1.25x), and
    ~1-2 TOKENS per CHAR on CJK (overshoot up to ~8x — budget-sensitive
    CJK deployments must bound by bytes, not len//4). The cl100k vocab
    is a downloadable artifact, not public source, so exact parity
    needs a real tokenizer dropped in behind the A10 seam
    (ops/textstats token counting) — the packing loop itself is
    tokenizer-agnostic."""
    sections: list[tuple[str, str]] = []
    cur_title = ""
    cur_parts: list[str] = []

    def close_section() -> None:
        if cur_parts or cur_title:
            sections.append((cur_title, "\n\n".join(p for p in cur_parts if p)))

    for s in spans:
        kind = s["kind"]
        if kind == "heading":
            close_section()
            cur_title = s.get("text", "")
            cur_parts = [cur_title]
        elif kind == "image-ref":
            cur_parts.append(f"![{s.get('text', '')}]({s.get('media_ref', '')})")
        else:
            cur_parts.append(s.get("text", ""))
    close_section()

    chunks: list[dict] = []
    buf: list[tuple[str, str]] = []
    buf_tokens = 0

    def flush_chunk() -> None:
        nonlocal buf, buf_tokens
        if buf:
            chunks.append(
                {
                    "chunk_id": len(chunks),
                    "n_sections": len(buf),
                    "n_tokens_est": buf_tokens,
                    "first_section": buf[0][0],
                    "text": "\n\n".join(t for _, t in buf),
                }
            )
        buf, buf_tokens = [], 0

    for title, text in sections:
        t = max(1, len(text) // 4)
        if buf and buf_tokens + t > token_budget:
            flush_chunk()
        buf.append((title, text))
        buf_tokens += t
    flush_chunk()
    return chunks


CHUNKS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_id", pa.int64()),
        ("n_sections", pa.int64()),
        ("n_tokens_est", pa.int64()),
        ("first_section", pa.string()),
        ("text", pa.string()),
    ]
)


def chunk_documents(ds, token_budget: int = 4000):
    """Dataset op: extracted (doc_id, spans) -> one row per chunk.
    Stateless flat map (no shuffle; chunking is per-document)."""

    def explode_chunks(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for c in spans_to_chunks(list(spans or []), token_budget):
                rows.append({"doc_id": did, **c})
        return pa.Table.from_pylist(rows, schema=CHUNKS_SCHEMA)

    return ds.map_batches(explode_chunks, batch_format="pyarrow")


# --- Search (MCP navigation surface) ----------------------------------------

SEARCH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("line_no", pa.int32()),
        ("snippet", pa.string()),
    ]
)


def search_documents(ds, needle: str, context_lines: int = 2):
    """Substring search over each document's markdown rendering with
    +-``context_lines`` of context — the batch rebuild of the reference
    MCP server's search tool (mcp_server_module/server.py:265-296;
    case-insensitive substring, line numbers 1-based). Stateless
    map_batches; search is per-document, no shuffle."""
    low = needle.lower()

    def search(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            lines = spans_to_markdown(list(spans or [])).split("\n")
            for i, line in enumerate(lines):
                if low in line.lower():
                    lo = max(0, i - context_lines)
                    hi = min(len(lines), i + context_lines + 1)
                    rows.append(
                        {
                            "doc_id": did,
                            "line_no": i + 1,
                            "snippet": "\n".join(lines[lo:hi]),
                        }
                    )
        return pa.Table.from_pylist(rows, schema=SEARCH_SCHEMA)

    return ds.map_batches(search, batch_format="pyarrow")


# --- Section navigation (MCP surface: headers / sections / summaries /
# hierarchy — mcp_server_module/server.py:346-509) ---------------------------


def parse_sections(spans: list[dict]) -> list[dict]:
    """Header-delimited sections over the markdown rendering — the span
    rebuild of the reference's ``_parse_markdown_sections``
    (server.py:94-144): each section runs from its header line to the
    line before the next header; token counts use the len//4 fallback
    (server.py:78-86); a header-less document becomes one level-0
    'Document Content' section."""
    md = spans_to_markdown(spans)
    lines = md.split("\n")
    sections: list[dict] = []
    current: dict | None = None

    def close(end_line: int) -> None:
        if current is not None:
            content = "\n".join(lines[current["start_line"] : end_line + 1])
            current["end_line"] = end_line
            current["content"] = content
            current["token_count"] = max(1, len(content) // 4) if content else 0
            sections.append(current)

    for i, line in enumerate(lines):
        m = _HEADING_LEVEL.match(line)
        if m:
            close(i - 1)
            current = {
                "level": len(m.group(1)),
                "title": line[m.end() :].strip(),
                "start_line": i,
                "end_line": i,
            }
    close(len(lines) - 1)
    if not sections and md:
        sections.append(
            {
                "level": 0,
                "title": "Document Content",
                "start_line": 0,
                "end_line": len(lines) - 1,
                "content": md,
                "token_count": max(1, len(md) // 4),
            }
        )
    return sections


_SECTION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("start_line", pa.int32()),
        ("end_line", pa.int32()),
        ("token_count", pa.int64()),
        ("content", pa.string()),
    ]
)


def document_sections(ds, section_title: str | None = None):
    """Dataset op: one row per section (the 'get_section' /
    'get_headers' data, server.py:346-446). ``section_title`` filters to
    matching sections (case-insensitive exact title match — the
    reference's get_section lookup). Stateless, no shuffle."""
    want = section_title.lower() if section_title else None

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sec in parse_sections(list(spans or [])):
                if want is not None and sec["title"].lower() != want:
                    continue
                rows.append({"doc_id": did, **sec})
        return pa.Table.from_pylist(rows, schema=_SECTION_SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow")


def document_headers(ds, max_level: int = 6):
    """Dataset op: the 'get_headers' projection — (doc_id, level, title,
    start_line, token_count) for headers up to ``max_level``
    (server.py:360-377)."""
    secs = document_sections(ds)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.less_equal(batch.column("level"), max_level),
            pc.greater(batch.column("level"), 0),
        )
        return batch.filter(mask).select(
            ["doc_id", "level", "title", "start_line", "token_count"]
        )

    return secs.map_batches(keep, batch_format="pyarrow")


def section_summaries(ds, max_length: int = 200):
    """Dataset op: 'get_section_summaries' — first ``max_length`` chars
    of each section's content with '...' past the cap
    (server.py:298-305)."""
    secs = document_sections(ds)

    def summarize(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            content = r["content"].strip()
            summary = (
                content if len(content) <= max_length else content[:max_length] + "..."
            )
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "level": r["level"],
                    "title": r["title"],
                    "token_count": r["token_count"],
                    "summary": summary,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("level", pa.int32()),
                    ("title", pa.string()),
                    ("token_count", pa.int64()),
                    ("summary", pa.string()),
                ]
            ),
        )

    return secs.map_batches(summarize, batch_format="pyarrow")


def _context_recommendation(total_tokens: int) -> str:
    """The reference's context-window recommendation tiers
    (server.py:307-337)."""
    if total_tokens < 8000:
        return "full_document"
    if total_tokens < 32000:
        return "full_document_or_chunked"
    if total_tokens < 128000:
        return "chunked_processing"
    return "hierarchical_navigation"


def hierarchical_structure(ds):
    """Dataset op: 'get_hierarchical_structure' — one row per doc with
    the section tree (level-nested by a header-level stack,
    server.py:147-181) as a JSON string, total token count, and the
    processing recommendation tier."""

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            secs = parse_sections(list(spans or []))
            root: list = []
            stack: list[tuple[int, list]] = [(0, root)]
            for sec in secs:
                node = {
                    "title": sec["title"],
                    "level": sec["level"],
                    "token_count": sec["token_count"],
                    "children": [],
                }
                while stack and stack[-1][0] >= sec["level"] and len(stack) > 1:
                    stack.pop()
                stack[-1][1].append(node)
                stack.append((sec["level"], node["children"]))
            total = sum(s["token_count"] for s in secs)
            rows.append(
                {
                    "doc_id": did,
                    "n_sections": len(secs),
                    "total_tokens": total,
                    "recommendation": _context_recommendation(total),
                    "structure": json.dumps(root, sort_keys=True),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("n_sections", pa.int64()),
                    ("total_tokens", pa.int64()),
                    ("recommendation", pa.string()),
                    ("structure", pa.string()),
                ]
            ),
        )

    return ds.map_batches(build, batch_format="pyarrow")


# --- Dataset-level projections ---------------------------------------------


def add_projection(ds, fmt: str, column: str | None = None):
    """Append a projection column to an extracted Dataset:
    fmt in {'markdown','json','html','csv'}. Stateless map_batches."""
    fns = {
        "markdown": spans_to_markdown,
        "json": lambda s: json.dumps(spans_to_json(s), sort_keys=True),
        "html": spans_to_html,
        "csv": spans_to_csv,
    }
    fn = fns[fmt]
    col = column or fmt

    def project(batch: pa.Table) -> pa.Table:
        vals = [fn(spans or []) for spans in batch.column("spans").to_pylist()]
        return batch.append_column(col, pa.array(vals, type=pa.string()))

    return ds.map_batches(project, batch_format="pyarrow")
