"""Office-document payloads → spans: DOCX / PPTX / XLSX semantics.

The reference parses binary Office files with python-docx / python-pptx /
pandas and reduces them to markdown (SURVEY.md S4-S9). In the interleaved
data model the parsed document STRUCTURE arrives as a JSON payload (the
stand-in for the library parse, exactly as 'page-src' stands in for a
rasterized page), and these extractors re-implement the reference's
markdown-emission semantics over it:

  * 'docx-src' — ``{"paragraphs": [{"text", "style"}], "tables": [grid]}``:
    headings from paragraph style names ("Heading N" -> '#'*N, "Title" ->
    '#'), list styles -> list_item spans, body text -> text spans, tables
    appended after the body with the 20-row cap + truncation notice
    (docx_processor.py:86-174, cap :140-148).
  * 'pptx-src' — ``{"slides": [{"texts": [str]}]}``: per-slide
    '## Slide N' heading + one text span per non-empty shape text
    (pptx_processor.py:90-133).
  * 'xlsx-src' — ``{"sheets": [{"name", "grid"}]}``: '# Excel Data:
    <name>' heading, then per sheet a '## Sheet: <name>' heading + one
    markdown table, empty cells rendered '' (excel_processor.py:98-148,
    serializer :150-180).
"""

from __future__ import annotations

import json
import re

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.cleaners import clean_whitespace
from docstrange_ray.extract.table_extract import grid_to_markdown

_HEADING_STYLE = re.compile(r"^Heading (\d)$")
_LIST_STYLE = re.compile(r"^List")


def _capped_table_spans(grid: list[list], cfg: ExtractConfig) -> list[dict]:
    """Markdown table span(s) with the reference's DOCX row-cap behavior:
    > cfg.table_row_cap data rows truncate with a notice
    (docx_processor.py:140-148)."""
    if not grid:
        return []
    n_data = len(grid) - 1
    spans = [
        {
            "kind": "table",
            "text": grid_to_markdown(grid[: cfg.table_row_cap + 1]),
            "media_ref": "",
        }
    ]
    if n_data > cfg.table_row_cap:
        spans.append(
            {
                "kind": "text",
                "text": f"... ({n_data - cfg.table_row_cap} more rows truncated)",
                "media_ref": "",
            }
        )
    return spans


def docx_src_to_spans(payload: str, cfg: ExtractConfig = DEFAULT) -> list[dict]:
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return []
    if not isinstance(doc, dict):
        return []
    spans: list[dict] = []
    for p in doc.get("paragraphs", []):
        text = clean_whitespace(str(p.get("text", ""))).strip()
        if not text:
            continue
        style = str(p.get("style", "") or "")
        m = _HEADING_STYLE.match(style)
        if style == "Title":
            spans.append({"kind": "heading", "text": f"# {text}", "media_ref": ""})
        elif m:
            level = min(6, max(1, int(m.group(1))))
            spans.append(
                {"kind": "heading", "text": "#" * level + " " + text, "media_ref": ""}
            )
        elif _LIST_STYLE.match(style):
            spans.append({"kind": "list_item", "text": f"- {text}", "media_ref": ""})
        else:
            spans.append({"kind": "text", "text": text, "media_ref": ""})
    for grid in doc.get("tables", []):
        spans.extend(_capped_table_spans(grid, cfg))
    return spans


def pptx_src_to_spans(payload: str) -> list[dict]:
    try:
        deck = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return []
    if not isinstance(deck, dict):
        return []
    spans: list[dict] = []
    for i, slide in enumerate(deck.get("slides", []), start=1):
        spans.append({"kind": "heading", "text": f"## Slide {i}", "media_ref": ""})
        for t in slide.get("texts", []):
            text = clean_whitespace(str(t)).strip()
            if text:
                spans.append({"kind": "text", "text": text, "media_ref": ""})
    return spans


def xlsx_src_to_spans(
    payload: str, name: str, cfg: ExtractConfig = DEFAULT
) -> list[dict]:
    try:
        book = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return []
    if not isinstance(book, dict):
        return []
    spans: list[dict] = [
        {"kind": "heading", "text": f"# Excel Data: {name}", "media_ref": ""}
    ]
    for sheet in book.get("sheets", []):
        sheet_name = str(sheet.get("name", ""))
        spans.append(
            {"kind": "heading", "text": f"## Sheet: {sheet_name}", "media_ref": ""}
        )
        spans.extend(_capped_table_spans(sheet.get("grid", []), cfg))
    return spans
