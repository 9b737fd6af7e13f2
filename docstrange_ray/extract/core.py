"""Per-document extraction dispatcher + sequential oracle.

``extract_spans`` is the single source of truth for extraction
semantics: the Ray pipeline calls it (directly for light documents,
piecewise via the page explode/reassemble path for paged documents) and
the oracle loops it sequentially. The routing mirrors the reference's
extension dispatch (extractor.py:336-372 — SURVEY.md S1) with span
``kind`` playing the role of the file extension.
"""

from __future__ import annotations

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.html_extract import html_to_spans
from docstrange_ray.extract.markdown_extract import markdown_to_spans
from docstrange_ray.extract.office_extract import (
    docx_src_to_spans,
    pptx_src_to_spans,
    xlsx_src_to_spans,
)
from docstrange_ray.extract.page_extract import page_to_spans
from docstrange_ray.extract.table_extract import table_src_to_spans
from docstrange_ray.extract.text_extract import text_to_spans


def finalize_spans(out: list[dict]) -> list[dict]:
    """Assign the output ``offset`` = 0-based span order (the north rule's
    ``order`` component) and normalize field presence."""
    return [
        {
            "kind": s["kind"],
            "text": s.get("text", "") or "",
            "media_ref": s.get("media_ref", "") or "",
            "offset": i,
        }
        for i, s in enumerate(out)
    ]


# One backend instance per (process, backend name): model/state loads
# once per worker regardless of how many units it extracts. Seeded by
# ExtractUnitActor.__init__ (warm load) and lazily here for the
# sequential oracle path.
_BACKEND_CACHE: dict[str, object] = {}


def _backend_for(cfg: ExtractConfig):
    name = getattr(cfg, "page_backend", "mock") or "mock"
    backend = _BACKEND_CACHE.get(name)
    if backend is None:
        from docstrange_ray.extract.backends import make_backend

        backend = make_backend(cfg)
        _BACKEND_CACHE[name] = backend
    return backend


def extract_unit(
    kind: str,
    text: str,
    media_ref: str,
    doc_id: str,
    page_no: int,
    table_idx: int,
    cfg: ExtractConfig = DEFAULT,
) -> list[dict]:
    """Extract ONE input span (an extraction unit). ``page_no`` /
    ``table_idx`` are the 1-based ordinals of this unit among the doc's
    page-src / table-src spans (page numbering mirrors the reference's
    page loop index, pdf_processor.py:135)."""
    if cfg.simulated_unit_cost_ms:
        import time as _time

        _time.sleep(cfg.simulated_unit_cost_ms / 1000.0)
    if kind == "html":
        return html_to_spans(text)
    if kind == "text":
        return text_to_spans(text)
    if kind == "md":
        return markdown_to_spans(text)
    if kind == "table-src":
        return table_src_to_spans(text, name=f"{doc_id}.t{table_idx}", cfg=cfg)
    if kind == "page-src":
        # ONE backend-application point shared by the sequential oracle
        # and every pipeline plan (span equality must hold for ANY
        # configured backend, not just the identity mock): the backend
        # turns the raw page payload into the canonical descriptor.
        return page_to_spans(_backend_for(cfg).analyze_page(text), page_no, cfg)
    if kind == "docx-src":
        return docx_src_to_spans(text, cfg)
    if kind == "pptx-src":
        return pptx_src_to_spans(text)
    if kind == "xlsx-src":
        return xlsx_src_to_spans(text, name=doc_id, cfg=cfg)
    if kind == "image-ref":
        return [{"kind": "image-ref", "text": text, "media_ref": media_ref}]
    # Unknown input kinds are skipped (reference raises for unsupported
    # formats, extractor.py:200-225; in a 10^12-doc corpus we record-and-drop
    # instead of failing the job).
    return []


def error_span(exc: BaseException) -> dict:
    """The swallow-and-continue error record: extraction failures surface
    as an error text span in the OUTPUT rather than failing the job —
    the reference's behavior for per-page errors
    (gpu_processor.py:412-417). Shared by the oracle and every pipeline
    path so span equality holds on poisoned documents too."""
    return {
        "kind": "text",
        "text": f"[extraction error: {type(exc).__name__}]",
        "media_ref": "",
    }


def extract_spans(
    doc_id: str, in_spans: list[dict], cfg: ExtractConfig = DEFAULT
) -> list[dict]:
    """Extract a whole document: process input spans in offset order,
    concatenate unit outputs, assign final span order. A unit that
    raises contributes an error span (see :func:`error_span`); a
    document whose span list itself is malformed reduces to a single
    error span."""
    out: list[dict] = []
    page_no = 0
    table_idx = 0
    try:
        ordered = sorted(in_spans, key=lambda s: int(s.get("offset", 0)))
    except (TypeError, ValueError, AttributeError) as e:
        return finalize_spans([error_span(e)])
    for s in ordered:
        kind = s.get("kind", "")
        if kind == "page-src":
            page_no += 1
        if kind == "table-src":
            table_idx += 1
        try:
            out.extend(
                extract_unit(
                    kind,
                    s.get("text", "") or "",
                    s.get("media_ref", "") or "",
                    doc_id,
                    page_no,
                    table_idx,
                    cfg,
                )
            )
        except Exception as e:  # noqa: BLE001 — job survival beats strictness
            out.append(error_span(e))
    return finalize_spans(out)


def extract_document(row: dict, cfg: ExtractConfig = DEFAULT) -> dict:
    """Oracle entry point: one input row -> one extracted row."""
    return {
        "doc_id": row["doc_id"],
        "spans": extract_spans(row["doc_id"], list(row["spans"]), cfg),
    }


def extract_corpus(rows: list[dict], cfg: ExtractConfig = DEFAULT) -> list[dict]:
    """The sequential oracle: the reference's one-document-at-a-time loop
    (cli.py:429-441) over a list of rows. Used by tests to verify the Ray
    pipeline under span-sequence equality."""
    return [extract_document(r, cfg) for r in rows]
