"""Page (scanned/rasterized) → spans: the layout/OCR path.

This is the deterministic, model-free re-implementation of the
reference's neural page pipeline
(neural_document_processor.py:309-396 + layout_detector.py). A
'page-src' span's ``text`` payload is a JSON page descriptor::

    {"embedded_text": "<digital text layer, may be empty>",
     "blocks": [{"text": str, "x": f, "y": f, "w": f, "h": f,
                 "conf": f, "words": [str, ...]?}, ...]}

which stands in for the rasterized page image: the "layout model" and
"OCR reader" of the reference predict exactly these block descriptors
(FIXTURES.md §5 mock-model determinism requirement), so every downstream
heuristic — confidence floor, reading-order sort, block classification,
paragraph grouping, table-row merge, lossy OCR cleanup — runs unchanged
and reproducibly with or without real model weights.

Reference semantics implemented here:
  * direct-text threshold: >50 chars embedded text skips OCR
    (pdf_processor.py:97 — S2)
  * confidence floor 0.5 (neural_document_processor.py:300,:337 — M19)
  * reading-order sort by (y, x), stable (layout_detector.py:60 — M13/O1)
  * block classification (layout_detector.py:188-239 — M10)
  * heading level by word count (layout_detector.py:206-216 — M11)
  * paragraph grouping at gap <= 1.5 x avg height (layout_detector.py:98 — M12)
  * smart word join (layout_detector.py:121-170 — M9)
  * lossy OCR post-processing on text paragraphs (layout_detector.py:172-186 — M8)
  * '## Page N' page assembly (pdf_processor.py:156-163 — M14)
"""

from __future__ import annotations

import json
import re

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.cleaners import ocr_postprocess, smart_join
from docstrange_ray.extract.classify import classify_block, heading_level_by_words
from docstrange_ray.extract.table_extract import grid_to_markdown
from docstrange_ray.extract.text_extract import text_to_spans


_CELL_SPLIT = re.compile(r"\s{2,}")


def _split_table_cells(text: str) -> list[str]:
    if "|" in text:
        cells = [c.strip() for c in text.split("|")]
        return [c for c in cells if c != ""]
    if "\t" in text:
        return [c.strip() for c in text.split("\t") if c.strip()]
    return [c for c in _CELL_SPLIT.split(text.strip()) if c]


def page_to_spans(
    payload: str, page_no: int, cfg: ExtractConfig = DEFAULT
) -> list[dict]:
    """Extract one page descriptor into an ordered span list, starting with
    the '## Page N' heading (pdf_processor.py:156-163)."""
    spans: list[dict] = [
        {"kind": "heading", "text": f"## Page {page_no}", "media_ref": ""}
    ]
    try:
        page = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return spans

    embedded = (page.get("embedded_text") or "").strip()
    if len(embedded) > cfg.direct_text_threshold:
        # Digital page: direct text extraction, no OCR (pdf_processor.py:83-110).
        spans.extend(text_to_spans(embedded))
        return spans

    blocks = [
        b
        for b in page.get("blocks", [])
        if (b.get("text") or b.get("words"))
        and float(b.get("conf", 1.0)) > cfg.ocr_confidence_floor
    ]
    if not blocks:
        return spans

    # Reading order: stable sort on (y, x) (layout_detector.py:60).
    blocks.sort(key=lambda b: (float(b.get("y", 0.0)), float(b.get("x", 0.0))))
    avg_h = sum(float(b.get("h", 0.0)) for b in blocks) / len(blocks)
    gap_limit = cfg.paragraph_gap_factor * avg_h

    para: list[str] = []
    para_bottom = None
    table_rows: list[list[str]] = []

    def flush_para() -> None:
        nonlocal para_bottom
        if para:
            spans.append(
                {
                    "kind": "text",
                    "text": ocr_postprocess(" ".join(para)),
                    "media_ref": "",
                }
            )
            para.clear()
        para_bottom = None

    def flush_table() -> None:
        if table_rows:
            spans.append(
                {"kind": "table", "text": grid_to_markdown(table_rows), "media_ref": ""}
            )
            table_rows.clear()

    for b in blocks:
        words = b.get("words")
        text = smart_join([str(w) for w in words]) if words else str(b.get("text", ""))
        text = text.strip()
        if not text:
            continue
        kind = classify_block(text, cfg)
        y = float(b.get("y", 0.0))
        h = float(b.get("h", 0.0))

        if kind == "table_row":
            flush_para()
            table_rows.append(_split_table_cells(text))
            continue
        flush_table()

        if kind == "heading":
            flush_para()
            level = heading_level_by_words(text, cfg)
            spans.append(
                {"kind": "heading", "text": "#" * level + " " + text, "media_ref": ""}
            )
        elif kind == "list_item":
            flush_para()
            spans.append({"kind": "list_item", "text": text, "media_ref": ""})
        else:
            # Paragraph grouping: merge when the vertical gap to the previous
            # text block is within 1.5 x avg height (layout_detector.py:85-119).
            if para and para_bottom is not None and (y - para_bottom) > gap_limit:
                flush_para()
            para.append(text)
            para_bottom = y + h

    flush_para()
    flush_table()
    return spans
