"""Specification oracle for the synthetic corpus: generation structure →
EXPECTED extracted spans / chunks, written as parquet fixtures the driver's
DuckDB oracle can read.

Why this exists (VERDICT r4 "Next round" #1): the extraction family was the
only query family the driver could never confirm — its semantics are not
SQL-expressible from the raw payloads. But the corpus is deterministic and
every non-paged population's extracted output is a CLOSED-FORM function of
the generator's pre-serialization structure (the headings / paragraphs /
list items / table grids / image refs each ``_gen_*`` constructs BEFORE
serializing them to HTML / markdown / CSV / JSON payloads). This module maps
that structure to the expected span sequence — independently of the
``extract/`` parsers, which must recover the same structure from the
serialized bytes — so the driver's rows+schema+hash comparison becomes a
genuine end-to-end check:

    structure --serialize--> payload --engine parse+extract--> spans
        ==  structure --spec mapping (this module)--> expected spans

Shared knowledge between the two sides is only the CONTRACT (e.g. how a
table renders as canonical markdown — reference excel_processor.py:150-180;
how the DOCX row cap truncates — docx_processor.py:140-148). The paged
populations need no generator refactor — a 'page-src' payload IS its
structure (the JSON block descriptor standing in for the rasterized
page), so ``expected_spans_paged`` re-derives the documented layout
heuristics independently (see the paged section below), and the spec
oracle covers the FULL corpus.

Scale note: fixture generation is a pure per-index function (same property
as synth.gen_doc), so at real scale it would fan out with the same
``ray.data.range(n).map_batches`` shape as the corpus itself; at sandbox
sizes (n ≤ 2000) it runs inline in ~2 s once per corpus size and is cached
on disk.
"""

from __future__ import annotations

import csv
import html as _html
import io
import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from docstrange_ray.synth import gen_doc_full

# Populations whose extracted output is closed-form from the generator
# structure (everything except the backend-dependent paged populations).
ORACLEABLE_POPS = frozenset(
    {
        "html_page",
        "plain_text",
        "markdown_doc",
        "tabular",
        "docx_doc",
        "pptx_doc",
        "xlsx_doc",
    }
)

FIXTURE_DIR = "/tmp/dsray_expected_v2"
TABLE_ROW_CAP = 20  # contract: reference docx_processor.py:140-148

# --- independent renderers (contract re-derivations, NOT imports) -----------


def _md_table(grid: list[list[str]]) -> str:
    """Canonical markdown table per the serializer contract
    (excel_processor.py:150-180): header row, all-``---`` separator at the
    max row width, short rows padded with '', pipes escaped."""
    if not grid:
        return ""
    width = max(len(r) for r in grid)

    def line(row: list[str]) -> str:
        cells = [("" if c is None else str(c)).replace("|", "\\|") for c in row]
        cells += [""] * (width - len(cells))
        return "| " + " | ".join(cells) + " |"

    out = [line(grid[0]), "| " + " | ".join(["---"] * width) + " |"]
    out.extend(line(r) for r in grid[1:])
    return "\n".join(out)


def _capped_table(grid: list[list[str]]) -> list[tuple]:
    """Table span(s) with the row-cap contract: > TABLE_ROW_CAP data rows
    truncate and append a notice text span."""
    if not grid:
        return []
    n_data = len(grid) - 1
    spans = [("table", _md_table(grid[: TABLE_ROW_CAP + 1]), "")]
    if n_data > TABLE_ROW_CAP:
        spans.append(("text", f"... ({n_data - TABLE_ROW_CAP} more rows truncated)", ""))
    return spans


def expected_spans(pop: str, struct: dict, doc_id: str) -> list[dict]:
    """Map one document's generation structure to its expected extracted
    span sequence (kind, text, media_ref, offset)."""
    out: list[tuple] = []
    if pop == "plain_text":
        # TXT contract: one text span per blank-line paragraph, trailing
        # whitespace trimmed (txt_processor.py:80-105)
        out = [("text", p, "") for p in struct["paras"]]
    elif pop == "markdown_doc":
        for b in struct["blocks"]:
            tag = b[0]
            if tag == "heading":
                out.append(("heading", b[1], ""))
            elif tag == "p":
                out.append(("text", b[1], ""))
            elif tag == "list":
                out.extend(("list_item", item, "") for item in b[1])
            elif tag == "code":
                out.append(("code", b[1], ""))
            elif tag == "table":
                out.append(("table", b[1], ""))
            elif tag == "quote":
                out.append(("blockquote", b[1], ""))
            elif tag == "img":
                out.append(("image-ref", b[1], b[2]))
    elif pop == "html_page":
        # <title> → '#' H1 (url_processor.py:258-262); nav/header/footer and
        # the link-farm box are boilerplate-pruned so never enter the spec
        out.append(("heading", f"# {struct['title']}", ""))
        for b in struct["blocks"]:
            tag = b[0]
            if tag == "h1":
                out.append(("heading", f"# {b[1]}", ""))
            elif tag == "h2":
                out.append(("heading", f"## {b[1]}", ""))
            elif tag == "p":
                out.append(("text", b[1], ""))
            elif tag == "ul":
                out.extend(("list_item", f"- {item}", "") for item in b[1])
            elif tag == "table":
                out.append(("table", _md_table(b[1]), ""))
            elif tag == "img":
                out.append(("image-ref", b[1], b[2]))
    elif pop == "tabular":
        out.append(("heading", f"# CSV Data: {doc_id}.t1", ""))
        out.extend(_capped_table(struct["grid"]))
    elif pop == "docx_doc":
        for p in struct["paras"]:
            text, style = p["text"], p["style"]
            if style == "Title":
                out.append(("heading", f"# {text}", ""))
            elif style.startswith("Heading "):
                level = int(style.split()[1])
                out.append(("heading", "#" * level + " " + text, ""))
            elif style.startswith("List"):
                out.append(("list_item", f"- {text}", ""))
            else:
                out.append(("text", text, ""))
        for grid in struct["tables"]:
            out.extend(_capped_table(grid))
    elif pop == "pptx_doc":
        for i, slide in enumerate(struct["slides"], start=1):
            out.append(("heading", f"## Slide {i}", ""))
            out.extend(("text", t, "") for t in slide["texts"])
    elif pop == "xlsx_doc":
        out.append(("heading", f"# Excel Data: {doc_id}", ""))
        for sheet in struct["sheets"]:
            out.append(("heading", f"## Sheet: {sheet['name']}", ""))
            out.extend(_capped_table(sheet["grid"]))
    else:
        raise ValueError(f"population {pop!r} has no spec oracle")
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": j}
        for j, (k, t, m) in enumerate(out)
    ]


def expected_chunks(spans: list[dict], token_budget: int) -> list[dict]:
    """Independent re-derivation of the section-chunking contract
    (mcp_server_module/server.py:183-220): header-delimited sections,
    len//4 token estimate, greedy packing, oversize section = own chunk."""
    sections: list[tuple[str, str]] = []
    title, parts = "", []
    for s in spans:
        if s["kind"] == "heading":
            if parts or title:
                sections.append((title, "\n\n".join(p for p in parts if p)))
            title = s["text"]
            parts = [title]
        elif s["kind"] == "image-ref":
            parts.append(f"![{s['text']}]({s['media_ref']})")
        else:
            parts.append(s["text"])
    if parts or title:
        sections.append((title, "\n\n".join(p for p in parts if p)))

    chunks: list[dict] = []
    buf: list[tuple[str, str]] = []
    buf_tokens = 0
    for sec_title, sec_text in sections:
        t = max(1, len(sec_text) // 4)
        if buf and buf_tokens + t > token_budget:
            chunks.append((buf, buf_tokens))
            buf, buf_tokens = [], 0
        buf.append((sec_title, sec_text))
        buf_tokens += t
    if buf:
        chunks.append((buf, buf_tokens))
    return [
        {
            "chunk_id": ci,
            "n_sections": len(b),
            "n_tokens_est": toks,
            "first_section": b[0][0],
            "text": "\n\n".join(t for _, t in b),
        }
        for ci, (b, toks) in enumerate(chunks)
    ]


# --- paged-population spec oracle (page-descriptor contract mirrors) --------
#
# A 'page-src' payload IS its structure (the JSON block descriptor that
# stands in for the rasterized page), so the paged populations need no
# generator refactor — the spec oracle re-derives the documented layout
# heuristics (confidence floor, reading order, block classification,
# paragraph grouping, smart word join, lossy OCR cleanup, table-row
# merge, page assembly — reference layout_detector.py /
# pdf_processor.py citations in extract/page_extract.py) independently
# of the extract/ modules.

_OCR_SUBS = (("|", "I"), ("0", "o"), ("1", "l"))
_WS_RUN = re.compile(r"[ \t]+")
_SENT_SP = re.compile(r"([.!?])([A-Z])")
_LIST_PATS = (
    re.compile(r"^\d+\.\s+"),
    re.compile(r"^[•◦⁃∙]\s*"),
    re.compile(r"^[-*+]\s+"),
    re.compile(r"^[a-zA-Z]\.\s+"),
)
_MANY_BLANKS = re.compile(r"\n{3,}")
# contract constants (config.ExtractConfig defaults)
_CONF_FLOOR = 0.5
_DIRECT_TEXT = 50
_GAP_FACTOR = 1.5
_HEADING_MAX_WORDS = 5
_H1_MAX_WORDS = 3
_H2_MAX_WORDS = 5


def _exp_ocr_clean(text: str) -> str:
    for a, b in _OCR_SUBS:
        text = text.replace(a, b)
    text = _WS_RUN.sub(" ", text).strip()
    return _SENT_SP.sub(r"\1 \2", text)


def _exp_smart_join(words: list[str]) -> str:
    out: list[str] = []
    for w in words:
        if not w:
            continue
        if out and (
            w[0] in ".,;:!?)]}" or out[-1][-1] in "([{" or out[-1].endswith("-")
        ):
            out[-1] = out[-1] + w
        else:
            out.append(w)
    return " ".join(out)


def _exp_classify(t: str) -> str:
    for pat in _LIST_PATS:
        if pat.match(t):
            return "list_item"
    if "|" in t or "\t" in t:
        return "table_row"
    words = t.split()
    if len(words) >= 4 and "  " in t:
        return "table_row"
    if len(words) <= _HEADING_MAX_WORDS and (t.endswith(".") or t.isupper()):
        return "heading"
    return "text"


def _exp_cells(text: str) -> list[str]:
    if "|" in text:
        return [c for c in (c.strip() for c in text.split("|")) if c != ""]
    if "\t" in text:
        return [c.strip() for c in text.split("\t") if c.strip()]
    return [c for c in re.split(r"\s{2,}", text.strip()) if c]


def _exp_trim_paragraphs(text: str) -> list[str]:
    lines = [ln.rstrip() for ln in text.split("\n")]
    out = "\n".join(lines).strip("\n")
    out = _MANY_BLANKS.sub("\n\n", out)
    if not out:
        return []
    return [p.strip("\n") for p in out.split("\n\n") if p.strip("\n")]


def _exp_page(payload: str, page_no: int) -> list[tuple]:
    spans: list[tuple] = [("heading", f"## Page {page_no}", "")]
    try:
        page = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return spans
    embedded = (page.get("embedded_text") or "").strip()
    if len(embedded) > _DIRECT_TEXT:
        spans.extend(("text", p, "") for p in _exp_trim_paragraphs(embedded))
        return spans
    blocks = [
        b
        for b in page.get("blocks", [])
        if (b.get("text") or b.get("words"))
        and float(b.get("conf", 1.0)) > _CONF_FLOOR
    ]
    if not blocks:
        return spans
    blocks.sort(key=lambda b: (float(b.get("y", 0.0)), float(b.get("x", 0.0))))
    avg_h = sum(float(b.get("h", 0.0)) for b in blocks) / len(blocks)
    gap_limit = _GAP_FACTOR * avg_h

    para: list[str] = []
    para_bottom = None
    table_rows: list[list[str]] = []

    def flush_para() -> None:
        nonlocal para_bottom
        if para:
            spans.append(("text", _exp_ocr_clean(" ".join(para)), ""))
            para.clear()
        para_bottom = None

    def flush_table() -> None:
        if table_rows:
            spans.append(("table", _md_table(list(table_rows)), ""))
            table_rows.clear()

    for b in blocks:
        words = b.get("words")
        text = (
            _exp_smart_join([str(w) for w in words])
            if words
            else str(b.get("text", ""))
        ).strip()
        if not text:
            continue
        kind = _exp_classify(text)
        y = float(b.get("y", 0.0))
        h = float(b.get("h", 0.0))
        if kind == "table_row":
            flush_para()
            table_rows.append(_exp_cells(text))
            continue
        flush_table()
        if kind == "heading":
            flush_para()
            n = len(text.split())
            level = 1 if n <= _H1_MAX_WORDS else (2 if n <= _H2_MAX_WORDS else 3)
            spans.append(("heading", "#" * level + " " + text, ""))
        elif kind == "list_item":
            flush_para()
            spans.append(("list_item", text, ""))
        else:
            if para and para_bottom is not None and (y - para_bottom) > gap_limit:
                flush_para()
            para.append(text)
            para_bottom = y + h
    flush_para()
    flush_table()
    return spans


def expected_spans_paged(in_spans: list[dict], doc_id: str) -> list[dict]:
    """Expected extracted spans for a paged/giant document, from its
    input span sequence (page descriptors + interleaved image-refs)."""
    out: list[tuple] = []
    page_no = 0
    for s in sorted(in_spans, key=lambda x: int(x.get("offset", 0))):
        if s["kind"] == "page-src":
            page_no += 1
            out.extend(_exp_page(s.get("text", "") or "", page_no))
        elif s["kind"] == "image-ref":
            out.append(("image-ref", s.get("text", "") or "",
                        s.get("media_ref", "") or ""))
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": j}
        for j, (k, t, m) in enumerate(out)
    ]


# --- independent projection re-derivations (contract mirrors) ---------------
#
# Each function below re-derives one documented projection contract
# (reference: result.py / mcp_server_module/server.py — see
# docstrange_ray/projections.py's per-function citations) directly from
# expected spans, WITHOUT importing the projections module. The driver's
# oracle comparison then checks engine extraction + projection against
# this second implementation end-to-end.

_HEAD_RE = re.compile(r"^(#{1,6})\s+")
_TBL_LINE = re.compile(r"^\|(.+)\|$")
_TBL_SEP = re.compile(r"^\|[-\s|:]+\|$")


def exp_markdown(spans: list[dict]) -> str:
    parts = [
        f"![{s['text']}]({s['media_ref']})" if s["kind"] == "image-ref" else s["text"]
        for s in spans
    ]
    return "\n\n".join(p for p in parts if p)


def exp_sections(spans: list[dict]) -> list[dict]:
    """Header-delimited sections over markdown lines (server.py:94-144):
    section = header line .. line before next header; token = len//4
    fallback; header-less document => one level-0 'Document Content'."""
    md = exp_markdown(spans)
    lines = md.split("\n")
    out: list[dict] = []
    cur: dict | None = None

    def close(end: int) -> None:
        if cur is not None:
            content = "\n".join(lines[cur["start_line"] : end + 1])
            cur["end_line"] = end
            cur["content"] = content
            cur["token_count"] = max(1, len(content) // 4) if content else 0
            out.append(cur)

    for i, line in enumerate(lines):
        m = _HEAD_RE.match(line)
        if m:
            close(i - 1)
            cur = {
                "level": len(m.group(1)),
                "title": line[m.end() :].strip(),
                "start_line": i,
                "end_line": i,
            }
    close(len(lines) - 1)
    if not out and md:
        out.append(
            {
                "level": 0,
                "title": "Document Content",
                "start_line": 0,
                "end_line": len(lines) - 1,
                "content": md,
                "token_count": max(1, len(md) // 4),
            }
        )
    return out


def exp_headers(spans: list[dict], max_level: int = 6) -> list[dict]:
    return [
        {
            "level": s["level"],
            "title": s["title"],
            "start_line": s["start_line"],
            "token_count": s["token_count"],
        }
        for s in exp_sections(spans)
        if 0 < s["level"] <= max_level
    ]


def exp_summaries(spans: list[dict], max_length: int = 200) -> list[dict]:
    out = []
    for s in exp_sections(spans):
        content = s["content"].strip()
        summary = (
            content if len(content) <= max_length else content[:max_length] + "..."
        )
        out.append(
            {
                "level": s["level"],
                "title": s["title"],
                "token_count": s["token_count"],
                "summary": summary,
            }
        )
    return out


def exp_structure(spans: list[dict]) -> dict:
    """Section tree by header-level stack + context-tier recommendation
    (server.py:147-181, :307-337)."""
    secs = exp_sections(spans)
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
    if total < 8000:
        rec = "full_document"
    elif total < 32000:
        rec = "full_document_or_chunked"
    elif total < 128000:
        rec = "chunked_processing"
    else:
        rec = "hierarchical_navigation"
    return {
        "n_sections": len(secs),
        "total_tokens": total,
        "recommendation": rec,
        "structure": json.dumps(root, sort_keys=True),
    }


def exp_search(spans: list[dict], needle: str, context_lines: int = 2) -> list[dict]:
    """Case-insensitive substring search with +-context over markdown
    lines, 1-based line numbers (server.py:265-296)."""
    low = needle.lower()
    lines = exp_markdown(spans).split("\n")
    out = []
    for i, line in enumerate(lines):
        if low in line.lower():
            lo = max(0, i - context_lines)
            hi = min(len(lines), i + context_lines + 1)
            out.append({"line_no": i + 1, "snippet": "\n".join(lines[lo:hi])})
    return out


_INLINE = (
    (re.compile(r"\*\*([^*]+)\*\*"), r"<strong>\1</strong>"),
    (re.compile(r"\*([^*]+)\*"), r"<em>\1</em>"),
    (re.compile(r"`([^`]+)`"), r"<code>\1</code>"),
    (re.compile(r"\[([^\]]*)\]\(([^)]+)\)"), r'<a href="\2">\1</a>'),
)


def _inline(text: str) -> str:
    out = _html.escape(text, quote=False)
    for pat, repl in _INLINE:
        out = pat.sub(repl, out)
    return out


def _parse_md_table(text: str) -> list[list[str]]:
    grid = []
    for line in text.split("\n"):
        line = line.strip()
        if not _TBL_LINE.match(line) or _TBL_SEP.match(line):
            continue
        grid.append(
            [c.strip().replace("\\|", "|") for c in re.split(r"(?<!\\)\|", line.strip("|"))]
        )
    return grid


def exp_html(spans: list[dict]) -> str:
    """Per-kind HTML rendering with escaping (result.py:356-686)."""
    parts: list[str] = []
    in_list = False

    def close_list() -> None:
        nonlocal in_list
        if in_list:
            parts.append("</ul>")
            in_list = False

    for s in spans:
        kind, text = s["kind"], s["text"]
        if kind == "heading":
            close_list()
            m = _HEAD_RE.match(text)
            lvl = len(m.group(1)) if m else 1
            title = _HEAD_RE.sub("", text).strip()
            parts.append(f"<h{lvl}>{_inline(title)}</h{lvl}>")
        elif kind == "code":
            close_list()
            body = re.sub(r"^```[^\n]*\n?|\n?```$", "", text)
            parts.append(f"<pre><code>{_html.escape(body, quote=False)}</code></pre>")
        elif kind == "table":
            close_list()
            grid = _parse_md_table(text)
            if grid:
                rows = [
                    "<tr>" + "".join(f"<th>{_inline(c)}</th>" for c in grid[0]) + "</tr>"
                ]
                rows += [
                    "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in r) + "</tr>"
                    for r in grid[1:]
                ]
                parts.append("<table>" + "".join(rows) + "</table>")
        elif kind == "list_item":
            if not in_list:
                parts.append("<ul>")
                in_list = True
            item = re.sub(r"^([-*+]|\d+\.|[a-zA-Z]\.)\s+", "", text)
            parts.append(f"<li>{_inline(item)}</li>")
        elif kind == "image-ref":
            close_list()
            parts.append(
                f'<img src="{_html.escape(s["media_ref"])}" alt="{_html.escape(text)}">'
            )
        elif kind == "blockquote":
            close_list()
            body = re.sub(r"^>\s?", "", text, flags=re.M)
            parts.append(f"<blockquote>{_inline(body)}</blockquote>")
        elif kind == "hr":
            close_list()
            parts.append("<hr>")
        else:
            close_list()
            if text.startswith(">"):
                body = re.sub(r"^>\s?", "", text, flags=re.M)
                parts.append(f"<blockquote>{_inline(body)}</blockquote>")
            else:
                parts.append(f"<p>{_inline(text)}</p>")
    close_list()
    return "\n".join(parts)


def exp_csv(spans: list[dict]) -> str:
    """Table spans as CSV with '=== Table N ===' separators
    (result.py:1028-1106)."""
    tables = [g for g in (_parse_md_table(s["text"]) for s in spans if s["kind"] == "table") if g]
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    for i, grid in enumerate(tables):
        if len(tables) > 1:
            buf.write(f"=== Table {i + 1} ===\n")
        w.writerows(grid)
        if len(tables) > 1 and i < len(tables) - 1:
            buf.write("\n")
    return buf.getvalue()


# --- fixture writer ---------------------------------------------------------

_SPANS_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("offset", pa.int64()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

_CHUNKS_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("chunk_id", pa.int64()),
        ("n_sections", pa.int64()),
        ("n_tokens_est", pa.int64()),
        ("first_section", pa.string()),
        ("text", pa.string()),
    ]
)

# dtypes mirror the Ray projection ops' arrow schemas exactly, so the
# driver's schema comparison sees identical columns on both sides
_DOCPROJ_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("html", pa.string()),
        ("csv", pa.string()),
        ("n_sections", pa.int64()),
        ("total_tokens", pa.int64()),
        ("recommendation", pa.string()),
        ("structure", pa.string()),
    ]
)

_HEADERS_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("start_line", pa.int32()),
        ("token_count", pa.int64()),
    ]
)

_SUMMARIES_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("token_count", pa.int64()),
        ("summary", pa.string()),
    ]
)

_SEARCH_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("line_no", pa.int32()),
        ("snippet", pa.string()),
    ]
)

SEARCH_NEEDLE = "shuffle"  # the search_docs query's needle, shared contract


def write_expected_fixtures(
    n: int, seed: int = 42, token_budget: int = 512, out_dir: str = FIXTURE_DIR
) -> tuple[str, str]:
    """Write the expected flat-span and chunk fixtures for corpus size ``n``
    (idempotent: atomic rename, skipped if present). Each file carries a
    constant ``n`` column so one DuckDB glob + filter serves every corpus
    size."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "spans": os.path.join(out_dir, f"spans_n{n}_s{seed}.parquet"),
        "chunks": os.path.join(
            out_dir, f"chunks_n{n}_s{seed}_b{token_budget}.parquet"
        ),
        "docproj": os.path.join(out_dir, f"docproj_n{n}_s{seed}.parquet"),
        "headers": os.path.join(out_dir, f"headers_n{n}_s{seed}.parquet"),
        "summaries": os.path.join(out_dir, f"summaries_n{n}_s{seed}.parquet"),
        "search": os.path.join(out_dir, f"search_n{n}_s{seed}.parquet"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths["spans"], paths["chunks"]
    rows_by_kind: dict[str, list[dict]] = {k: [] for k in paths}
    for i in range(n):
        row, pop, struct = gen_doc_full(seed, i)
        did = row["doc_id"]
        if pop in ORACLEABLE_POPS and struct is not None:
            spans = expected_spans(pop, struct, did)
        else:  # paged/giant: the payload IS the structure
            spans = expected_spans_paged(row["spans"], did)
        rows_by_kind["spans"].extend({"n": n, "doc_id": did, **s} for s in spans)
        rows_by_kind["chunks"].extend(
            {"n": n, "doc_id": did, **c} for c in expected_chunks(spans, token_budget)
        )
        rows_by_kind["docproj"].append(
            {
                "n": n,
                "doc_id": did,
                "html": exp_html(spans),
                "csv": exp_csv(spans),
                **exp_structure(spans),
            }
        )
        rows_by_kind["headers"].extend(
            {"n": n, "doc_id": did, **h} for h in exp_headers(spans)
        )
        rows_by_kind["summaries"].extend(
            {"n": n, "doc_id": did, **s} for s in exp_summaries(spans)
        )
        rows_by_kind["search"].extend(
            {"n": n, "doc_id": did, **s} for s in exp_search(spans, SEARCH_NEEDLE)
        )
    schemas = {
        "spans": _SPANS_FIXTURE_SCHEMA,
        "chunks": _CHUNKS_FIXTURE_SCHEMA,
        "docproj": _DOCPROJ_FIXTURE_SCHEMA,
        "headers": _HEADERS_FIXTURE_SCHEMA,
        "summaries": _SUMMARIES_FIXTURE_SCHEMA,
        "search": _SEARCH_FIXTURE_SCHEMA,
    }
    for kind, path in paths.items():
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(
            pa.Table.from_pylist(rows_by_kind[kind], schema=schemas[kind]), tmp
        )
        os.replace(tmp, path)
    return paths["spans"], paths["chunks"]


def oracleable_doc_ids(n: int, seed: int = 42) -> set[str]:
    """doc_ids of the spec-oracle subset. Since the paged populations
    gained their own spec oracle (``expected_spans_paged``), EVERY
    document is covered — the set is the full corpus (kept as a
    function so the query-side filter stays general if a future
    population is ever excluded)."""
    return {f"doc-{i:08d}" for i in range(n)}
