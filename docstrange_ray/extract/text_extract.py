"""Plain-text span extraction.

Re-implements the reference's TXT path: multi-encoding decode happens at
ingest (txt_processor.py:49-61 — M16; our corpus is already decoded),
then whitespace trim (txt_processor.py:80-105 — M6), then the text is
split into paragraph spans on blank lines.
"""

from __future__ import annotations

from docstrange_ray.extract.cleaners import trim_text

ENCODING_CANDIDATES = ("utf-8", "latin-1", "cp1252", "iso-8859-1")


def decode_bytes(data: bytes) -> str:
    """Multi-encoding fallback decode (reference: txt_processor.py:49-61)."""
    for enc in ENCODING_CANDIDATES:
        try:
            return data.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace")


def text_to_spans(payload: str) -> list[dict]:
    """Trim, then one 'text' span per blank-line-separated paragraph."""
    cleaned = trim_text(payload)
    if not cleaned:
        return []
    spans = []
    for para in cleaned.split("\n\n"):
        para = para.strip("\n")
        if para:
            spans.append({"kind": "text", "text": para, "media_ref": ""})
    return spans
