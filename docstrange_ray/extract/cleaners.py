"""Text cleaners.

Re-implements the reference's whitespace-normalization behavior, which it
duplicates four times (docx_processor.py:176-202, excel_processor.py:182-207,
pptx_processor.py:135-159, url_processor.py:335-360 — SURVEY.md M5) and the
TXT trim rules (txt_processor.py:80-105 — M6), plus the deliberately lossy
OCR post-processor (layout_detector.py:172-186 — M8).
"""

from __future__ import annotations

import re

_WS_RUN = re.compile(r"[ \t]+")
_MANY_BLANKS = re.compile(r"\n{3,}")
_SENTENCE_SPACING = re.compile(r"([.!?])([A-Z])")

# The reference's OCR substitutions (layout_detector.py:175-177) are
# deliberately lossy: they "fix" common OCR confusions globally.
_OCR_SUBS = (("|", "I"), ("0", "o"), ("1", "l"))


def clean_whitespace(text: str) -> str:
    """Collapse intra-line whitespace, drop blank lines, keep headers on
    their own line (reference: url_processor.py:335-360 semantics)."""
    lines = []
    for line in text.split("\n"):
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def trim_text(text: str) -> str:
    """TXT trim: rstrip every line, strip leading/trailing blank lines,
    collapse runs of 3+ blank lines to one blank line
    (reference: txt_processor.py:80-105)."""
    lines = [ln.rstrip() for ln in text.split("\n")]
    out = "\n".join(lines).strip("\n")
    return _MANY_BLANKS.sub("\n\n", out)


def ocr_postprocess(text: str) -> str:
    """The reference's lossy OCR cleanup (layout_detector.py:172-186):
    char substitutions, whitespace collapse, sentence-spacing fix.

    Applied only to OCR-path plain-text blocks; known data-corruption
    behavior replicated for span-equality fidelity (SURVEY.md M8 note).
    """
    for a, b in _OCR_SUBS:
        text = text.replace(a, b)
    text = _WS_RUN.sub(" ", text).strip()
    text = _SENTENCE_SPACING.sub(r"\1 \2", text)
    return text


def smart_join(words: list[str]) -> str:
    """Join OCR word boxes without spaces before punctuation, after opening
    brackets, or across explicit hyphen-joins
    (reference: layout_detector.py:121-170, :255-293)."""
    out: list[str] = []
    for w in words:
        if not w:
            continue
        if out and (
            w[0] in ".,;:!?)]}"
            or out[-1][-1] in "([{"
            or out[-1].endswith("-")
        ):
            out[-1] = out[-1] + w
        else:
            out.append(w)
    return " ".join(out)


_BARE_KEY = re.compile(r"(\w+):")


def repair_json(text: str):
    """Tolerant JSON parse with the reference's repair ladder (M18;
    gpu_processor.py:176-189, duplicated in ollama_service.py:124-135):
    plain ``json.loads``; on failure wrap bare keys in double quotes and
    replace single quotes, retry; else fall back to
    ``{"raw_text": <text>}`` — the model-output salvage used by the
    VLM/LLM stages."""
    import json as _json

    try:
        return _json.loads(text)
    except (ValueError, TypeError):
        try:
            fixed = _BARE_KEY.sub(r'"\1":', text or "")
            fixed = fixed.replace("'", '"')
            return _json.loads(fixed)
        except (ValueError, TypeError):
            return {"raw_text": text}
