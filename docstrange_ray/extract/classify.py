"""Block-kind and heading-level classification.

Re-implements the reference's paragraph classifier
(layout_detector.py:188-239, patterns :47-52 — SURVEY.md M10) and the
word-count heading-level heuristic (layout_detector.py:206-216 — M11).
These assign the output span ``kind`` for OCR/layout-path blocks.
"""

from __future__ import annotations

import re

from docstrange_ray.config import DEFAULT, ExtractConfig

# List-item patterns (reference: layout_detector.py:47-52).
_LIST_PATTERNS = (
    re.compile(r"^\d+\.\s+"),        # 1. numbered
    re.compile(r"^[•◦⁃∙]\s*"),  # bullets
    re.compile(r"^[-*+]\s+"),        # dash/star/plus bullets
    re.compile(r"^[a-zA-Z]\.\s+"),   # a. lettered
)

def classify_block(text: str, cfg: ExtractConfig = DEFAULT) -> str:
    """'heading' | 'list_item' | 'table_row' | 'text' for one OCR block.

    Reference rules AND check order (layout_detector.py:188-239:
    _classify_paragraph checks list, then table, then heading):
      * list regexes -> list_item
      * '|' or tab anywhere -> table_row (no word-count gate);
        else >=4 words with a double space -> table_row
        (_is_table_row, layout_detector.py:224-237)
      * <=5 words AND (ends with '.' OR all-caps) -> heading
      * else text
    """
    t = text.strip()
    if not t:
        return "text"
    for pat in _LIST_PATTERNS:
        if pat.match(t):
            return "list_item"
    if "|" in t or "\t" in t:
        return "table_row"
    words = t.split()
    if len(words) >= 4 and "  " in t:
        return "table_row"
    if len(words) <= cfg.heading_max_words and (t.endswith(".") or t.isupper()):
        return "heading"
    return "text"


def heading_level_by_words(text: str, cfg: ExtractConfig = DEFAULT) -> int:
    """Heading level from word count: <=3 -> 1, <=5 -> 2, else 3
    (reference: layout_detector.py:206-216)."""
    n = len(text.split())
    if n <= cfg.h1_max_words:
        return 1
    if n <= cfg.h2_max_words:
        return 2
    return 3


def heading_level_by_geometry(y: float, height: float) -> int:
    """Heading level from geometry: y<100 -> 1, height>30 -> 2, else 3
    (reference: neural_document_processor.py:613-621)."""
    if y < 100:
        return 1
    if height > 30:
        return 2
    return 3
