"""Markdown → span-sequence parser.

Re-implements the reference's regex-driven markdown→structure parser
(result.py:13-353 — SURVEY.md M1; patterns result.py:19-29, the table
regex result.py:26 — M4) as a single line-scan that emits typed spans
instead of a nested JSON tree (the tree is a downstream projection, see
``projections.spans_to_json``).

Emission rules (all text kept verbatim so projections are lossless):
  * ``#{1,6} ...``                      -> 'heading' span (ATX line verbatim)
  * fenced ``` block                    -> 'code' span (with fences)
  * pipe table (header + separator)     -> 'table' span
  * list-item lines (-, *, +, 1., a.)   -> one 'list_item' span per item
  * standalone ``![alt](src)`` line     -> 'image-ref' span (media_ref=src)
  * blockquote run                      -> 'blockquote' span ('>' prefixes
    kept verbatim; projections strip them — reference result.py:27, :514)
  * ``---`` rule line                   -> 'hr' span (reference
    horizontal_rule_pattern ``^---+$``, result.py:370, rendered <hr> :510-512)
  * other contiguous lines              -> 'text' paragraph span
"""

from __future__ import annotations

import re

_HEADING = re.compile(r"^(#{1,6})\s+\S")
_FENCE = re.compile(r"^```")
_TABLE_SEP = re.compile(r"^\|[-\s|:]+\|$")
_TABLE_ROW = re.compile(r"^\|(.+)\|$")
_LIST_ITEM = re.compile(r"^(\s*)([-*+]|\d+\.|[a-zA-Z]\.)\s+\S")
_IMAGE_LINE = re.compile(r"^!\[([^\]]*)\]\(([^)]+)\)\s*$")
_BLOCKQUOTE = re.compile(r"^>\s?")
_HR = re.compile(r"^---+$")


def markdown_to_spans(payload: str) -> list[dict]:
    lines = payload.split("\n")
    spans: list[dict] = []
    para: list[str] = []
    quote: list[str] = []

    def flush_para() -> None:
        if para:
            spans.append({"kind": "text", "text": " ".join(para), "media_ref": ""})
            para.clear()

    def flush_quote() -> None:
        if quote:
            spans.append(
                {"kind": "blockquote", "text": "\n".join(quote), "media_ref": ""}
            )
            quote.clear()

    i, n = 0, len(lines)
    while i < n:
        raw = lines[i]
        line = raw.rstrip()
        stripped = line.strip()

        if not stripped:
            flush_para()
            flush_quote()
            i += 1
            continue

        if _FENCE.match(stripped):
            flush_para()
            flush_quote()
            block = [stripped]
            i += 1
            while i < n:
                block.append(lines[i].rstrip())
                if _FENCE.match(lines[i].strip()):
                    i += 1
                    break
                i += 1
            spans.append({"kind": "code", "text": "\n".join(block), "media_ref": ""})
            continue

        m = _HEADING.match(stripped)
        if m:
            flush_para()
            flush_quote()
            spans.append({"kind": "heading", "text": stripped, "media_ref": ""})
            i += 1
            continue

        if _HR.match(stripped):
            flush_para()
            flush_quote()
            spans.append({"kind": "hr", "text": stripped, "media_ref": ""})
            i += 1
            continue

        # Pipe table: current line is a row and the NEXT line is a separator
        # (the reference's table regex shape, result.py:26).
        if (
            _TABLE_ROW.match(stripped)
            and i + 1 < n
            and _TABLE_SEP.match(lines[i + 1].strip())
        ):
            flush_para()
            flush_quote()
            rows = [stripped, lines[i + 1].strip()]
            i += 2
            while i < n and _TABLE_ROW.match(lines[i].strip()):
                rows.append(lines[i].strip())
                i += 1
            spans.append({"kind": "table", "text": "\n".join(rows), "media_ref": ""})
            continue

        m = _IMAGE_LINE.match(stripped)
        if m:
            flush_para()
            flush_quote()
            spans.append(
                {"kind": "image-ref", "text": m.group(1), "media_ref": m.group(2)}
            )
            i += 1
            continue

        if _LIST_ITEM.match(line):
            flush_para()
            flush_quote()
            spans.append({"kind": "list_item", "text": stripped, "media_ref": ""})
            i += 1
            continue

        if _BLOCKQUOTE.match(stripped):
            flush_para()
            quote.append(stripped)
            i += 1
            continue

        flush_quote()
        para.append(stripped)
        i += 1

    flush_para()
    flush_quote()
    return spans
