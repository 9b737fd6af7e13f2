"""Layout/OCR page backends: the real-weights seam behind
``ExtractUnitActor``.

The reference co-hosts three models in one processor — docling
``LayoutPredictor`` + ``TFPredictor`` (TableFormer) + ``easyocr.Reader``
(neural_document_processor.py:227-239, SURVEY.md A1-A3/A7) — loaded once
and reused across pages. In this engine a *backend* is an object with
one method::

    analyze_page(payload: str) -> str

taking the raw 'page-src' payload and returning the CANONICAL page
descriptor JSON that ``page_extract.page_to_spans`` consumes
(``{"embedded_text": ..., "blocks": [{text,x,y,w,h,conf,words?}]}``).
Backends load state in ``__init__`` (once per actor — the reference's
A7 sharing, pdf_processor.py:24-32) and are selected by
``ExtractConfig.page_backend`` (the A8 provider-factory analogue,
ocr_service.py:190-222).

``MockPageBackend`` (default) treats the payload as an already-predicted
descriptor — the deterministic model-free path every test runs.
``DoclingPageBackend`` is the real-weights drop-in: same interface, a
payload carrying an encoded page image, models resolved at construction
(import-gated; this sandbox ships no weights, so construction raises
with a clear message — the INTERFACE is the deliverable, conformance
tested in tests/test_pipeline.py)."""

from __future__ import annotations

from docstrange_ray.config import DEFAULT, ExtractConfig


class MockPageBackend:
    """Identity backend: the 'page-src' payload IS the page descriptor
    (FIXTURES.md §5 mock-model determinism). Holds no heavy state; the
    compiled-regex warmup in ExtractUnitActor.__init__ plays the role of
    model loading."""

    def analyze_page(self, payload: str) -> str:
        return payload


class DoclingPageBackend:
    """Real-weights adapter matching the reference's co-resident model
    bundle (neural_document_processor.py:227-239): docling layout
    predictor (A1), TableFormer table structure (A2), easyocr reader
    (A3) — all constructed ONCE here (per actor).

    ``analyze_page`` expects a payload of
    ``{"image_b64": <png>, "embedded_text": ...}``; it would rasterize
    nothing itself (pages arrive pre-rendered as binary columns), run
    layout+OCR+tables, and emit the canonical block descriptor. The
    heavy dependencies are absent in this sandbox, so construction
    raises NotImplementedError (the same gated-import policy as the
    multimodal decode stubs, ops/multimodal.py)."""

    def __init__(self, device: str = "cpu", num_threads: int = 4):
        try:
            # the reference's exact model stack
            # (neural_document_processor.py:227-239)
            from docling_ibm_models.layoutmodel.layout_predictor import (  # noqa: F401
                LayoutPredictor,
            )
            import easyocr  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "DoclingPageBackend needs docling-ibm-models + easyocr "
                "(not installed in this sandbox); MockPageBackend is the "
                "hermetic default — swap via ExtractConfig.page_backend"
            ) from e
        self.device = device
        self.num_threads = num_threads
        # real construction would follow neural_document_processor.py:227-239:
        #   self.layout = LayoutPredictor(artifact_path, device, num_threads)
        #   self.tables = TFPredictor(tm_config)
        #   self.ocr = easyocr.Reader(["en"])

    def analyze_page(self, payload: str) -> str:
        raise NotImplementedError("real-weights path: models unavailable here")


_BACKENDS = {
    "mock": MockPageBackend,
    "docling": DoclingPageBackend,
}


def make_backend(cfg: ExtractConfig = DEFAULT):
    """Provider factory (A8 analogue): ``cfg.page_backend`` ->
    constructed backend instance."""
    name = getattr(cfg, "page_backend", "mock") or "mock"
    try:
        cls = _BACKENDS[name]
    except KeyError:
        raise ValueError(
            f"unknown page backend {name!r}; known: {sorted(_BACKENDS)}"
        ) from None
    return cls()
