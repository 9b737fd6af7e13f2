"""Arrow schemas for the interleaved-document data model.

The input/output shape comes from BASELINE.json ``input_hint``::

    (doc_id: string,
     spans: list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>)

Input span kinds (raw, interleaved source material):
    'html'      — a raw HTML page payload in ``text``
    'text'      — plain text payload
    'md'        — markdown payload
    'table-src' — CSV-like grid payload
    'page-src'  — one scanned "page": JSON block descriptors (the
                  deterministic stand-in for a rasterized PDF page; see
                  FIXTURES.md §5)
    'docx-src'  — parsed DOCX structure as JSON (paragraphs+styles,
                  tables) — stand-in for the python-docx parse
    'pptx-src'  — parsed PPTX structure as JSON (slides/shape texts)
    'xlsx-src'  — parsed workbook as JSON (named sheets of grids)
    'image-ref' — media pointer in ``media_ref`` (no text payload)

Output span kinds (extracted):
    'heading' | 'text' | 'list_item' | 'table' | 'code' | 'image-ref'

The per-row invariant vs the oracle is span-sequence equality over
``(kind, text, media_ref, order)`` where ``order`` is the output
``offset`` field (0-based position of the span in the document).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Flat (exploded) span rows — used when a span sequence crosses a stage
# boundary as rows rather than a list cell (page explode, final flat sink).
FLAT_SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

INPUT_KINDS = (
    "html",
    "text",
    "md",
    "table-src",
    "page-src",
    "docx-src",
    "pptx-src",
    "xlsx-src",
    "image-ref",
)
OUTPUT_KINDS = (
    "heading",
    "text",
    "list_item",
    "table",
    "code",
    "image-ref",
    "blockquote",  # '>'-prefixed run, verbatim (reference result.py:27)
    "hr",  # horizontal rule line (reference result.py:370)
)


def spans_from_pylist(spans: list[dict]) -> list[dict]:
    """Normalize a list of span dicts to the canonical field set/order."""
    return [
        {
            "kind": s["kind"],
            "text": s.get("text", "") or "",
            "media_ref": s.get("media_ref", "") or "",
            "offset": int(s.get("offset", i)),
        }
        for i, s in enumerate(spans)
    ]


def make_doc(doc_id: str, spans: list[dict]) -> dict:
    return {"doc_id": doc_id, "spans": spans_from_pylist(spans)}
