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


# The widest ink run any 5x7 font glyph produces is GLYPH_W = 5 px
# ('#'/'E' rows), so a horizontal run this long can only be a drawn rule.
_RULE_MIN_RUN = 12
# a rule column/row must be inked across this fraction of its span
_RULE_FILL = 0.9


def _runs(mask):
    """(start, end_exclusive) pairs of consecutive True in a 1-D bool mask."""
    import numpy as np

    idx = np.flatnonzero(np.diff(np.concatenate(([0], mask.astype(np.int8), [0]))))
    return list(zip(idx[::2], idx[1::2]))


def _rule_bars(dark):
    """Horizontal rule bars: maximal groups of consecutive rows whose
    longest dark run is >= max(_RULE_MIN_RUN, 30% of page width).
    Returns [(y0, y1, x0, x1)] with the x-extent of the qualifying runs.

    The relative floor is load-bearing for multi-scale pages: a table
    RULE spans its table (most of the page), while a glyph's horizontal
    stroke never does — but at integer zoom a stroke grows to
    scale*GLYPH_W px and crossed the absolute 12 px floor at 3x,
    turning scaled text into phantom table grids (found via the
    pixel_layout_extract golden). Narrow tables whose rules span under
    30% of the page fall back to text-line placeholders — documented
    contract bound."""
    import numpy as np

    min_run = max(_RULE_MIN_RUN, int(0.3 * dark.shape[1]))
    rule_rows = []
    for y in range(dark.shape[0]):
        long = [(a, b) for a, b in _runs(dark[y]) if b - a >= min_run]
        if long:
            rule_rows.append((y, min(a for a, _ in long), max(b for _, b in long)))
    bars = []
    for y, x0, x1 in rule_rows:
        if bars and y == bars[-1][1]:
            py0, _, px0, px1 = bars[-1]
            bars[-1] = (py0, y + 1, min(px0, x0), max(px1, x1))
        else:
            bars.append((y, y + 1, x0, x1))
    return bars


def _v_bars(dark, y0, y1, x0, x1):
    """Vertical rule bars inside a region: maximal groups of consecutive
    columns dark across >= _RULE_FILL of the region's rows. Returns
    [(cx0, cx1)] in absolute column coordinates."""
    if y1 <= y0 or x1 <= x0:
        return []
    region = dark[y0:y1, x0:x1]
    filled = region.sum(axis=0) >= _RULE_FILL * (y1 - y0)
    return [(x0 + a, x0 + b) for a, b in _runs(filled)]


def _detect_tables(dark, read_line):
    """Ruled-table structure recognition over a binarized page: find
    horizontal rule bars, chain vertically-connected ones into tables,
    cut the grid at rule intersections, and glyph-OCR every cell — the
    model-free analogue of the reference's TableFormer stage
    (neural_document_processor.py:317, SURVEY A2), which predicts this
    same row/col/cell structure from the same pixels with a transformer.

    Returns ``(blocks, consumed)``: one block per table ROW with
    '|'-joined cell text (page_to_spans classifies it table_row and
    reassembles the markdown grid) and a bool row mask covering the
    table regions so line segmentation skips them. A table whose cells
    the font can't read degrades to ONE geometry-only placeholder block
    (same contract as unreadable text lines). Empty cells read as ''
    and collapse downstream (_split_table_cells drops empties) —
    documented, matching the descriptor-path semantics."""
    bars = _rule_bars(dark)
    blocks: list[dict] = []
    consumed = [False] * dark.shape[0]
    i = 0
    while i < len(bars):
        chain = [bars[i]]
        j = i + 1
        while j < len(bars):
            prev, nxt = chain[-1], bars[j]
            ox0, ox1 = max(prev[2], nxt[2]), min(prev[3], nxt[3])
            if ox1 - ox0 < _RULE_MIN_RUN or len(
                _v_bars(dark, prev[1], nxt[0], ox0, ox1)
            ) < 2:
                break
            chain.append(nxt)
            j += 1
        if len(chain) < 2:
            i += 1
            continue
        i = j
        tx0 = min(b[2] for b in chain)
        tx1 = max(b[3] for b in chain)
        ty0, ty1 = chain[0][0], chain[-1][1]
        # one consistent column grid across the whole table interior
        vbars = _v_bars(dark, chain[0][1], chain[-1][0], tx0, tx1)
        strips = [(chain[k][1], chain[k + 1][0]) for k in range(len(chain) - 1)]
        cell_spans = [
            (vbars[k][1], vbars[k + 1][0]) for k in range(len(vbars) - 1)
        ]
        for y in range(ty0, ty1):
            consumed[y] = True
        grid: list[list[str]] | None = []
        for sy0, sy1 in strips:
            row: list[str] = []
            for cx0, cx1 in cell_spans:
                cell = dark[sy0:sy1, cx0:cx1]
                if not cell.any():
                    row.append("")
                    continue
                text = read_line(cell)
                if text is None:
                    grid = None
                    break
                row.append(text)
            if grid is None:
                break
            grid.append(row)
        if grid is None:
            blocks.append(
                {
                    "text": f"[table {len(strips)}x{len(cell_spans)}: "
                    f"{ty1 - ty0}px]",
                    "x": int(tx0),
                    "y": int(ty0),
                    "w": int(tx1 - tx0),
                    "h": int(ty1 - ty0),
                    "conf": 0.9,
                }
            )
            continue
        for (sy0, sy1), row in zip(strips, grid):
            blocks.append(
                {
                    "text": " | ".join(row),
                    "x": int(tx0),
                    "y": int(sy0),
                    "w": int(tx1 - tx0),
                    "h": int(sy1 - sy0),
                    "conf": 0.99,
                }
            )
    return blocks, consumed


class ProjectionProfileBackend:
    """REAL layout analysis without model weights: for payloads carrying
    an encoded page image (``{"image_b64": ...}`` — the S12 image route,
    binary_formats.file_bytes_to_input_spans), decode the pixels with
    the stdlib PNG/JPEG decoders, binarize at the mean intensity, and
    segment text lines by horizontal projection profile — the classic
    pre-neural layout technique (ink-row histograms). Each detected
    band becomes a block with REAL bbox geometry (y-range from the row
    profile, x-range from the column profile inside the band) in
    reading order. RECOGNITION runs the deterministic glyph-template
    matcher (extract/glyphs: nearest 5x7 bitmap template per
    column-profile cell — the pre-neural OCR-B approach, no weights):
    native-scale font pages read back their ACTUAL text from actual
    pixels; any band the font can't read keeps the geometry-only
    placeholder, so arbitrary scans degrade to round-3 behavior. A
    weights-bearing backend (DoclingPageBackend) OCRs the same pixels
    behind the same interface. Descriptor payloads without an image
    pass through untouched (mock semantics), so mixed corpora extract
    correctly."""

    # a row is "ink" when >= this fraction of its pixels are dark
    MIN_INK_FRACTION = 0.05

    def analyze_page(self, payload: str) -> str:
        import base64
        import json

        try:
            d = json.loads(payload)
        except (TypeError, ValueError):
            return payload
        if not isinstance(d, dict) or not d.get("image_b64"):
            return payload  # already a descriptor: pass through
        try:
            data = base64.b64decode(d["image_b64"])
            img = self._decode(data)
        except Exception:
            return payload  # undecodable image: fall back to descriptor path
        import numpy as np

        from docstrange_ray.extract.glyphs import read_line_multiscale

        dark = img.astype(np.float64) < max(1.0, float(img.mean()))
        # Ruled tables first: grid structure + per-cell OCR (A2 analogue);
        # their rows are excluded from line segmentation below.
        blocks, consumed = _detect_tables(dark, read_line_multiscale)
        rows = dark.sum(axis=1)
        thr = max(1.0, self.MIN_INK_FRACTION * img.shape[1])
        ink = rows >= thr
        y = 0
        h = img.shape[0]
        while y < h:
            if not ink[y] or consumed[y]:
                y += 1
                continue
            y0 = y
            while y < h and ink[y] and not consumed[y]:
                y += 1
            band = dark[y0:y]
            cols = np.where(band.any(axis=0))[0]
            x0, x1 = (int(cols[0]), int(cols[-1]) + 1) if cols.size else (0, img.shape[1])
            recognized = read_line_multiscale(band[:, x0:x1])
            blocks.append(
                {
                    "text": recognized
                    if recognized is not None
                    else f"[text line {len(blocks) + 1}: {y - y0}px]",
                    "x": x0,
                    "y": int(y0),
                    "w": x1 - x0,
                    "h": int(y - y0),
                    "conf": 0.99 if recognized is not None else 0.9,
                }
            )
        return json.dumps(
            {"embedded_text": d.get("embedded_text", "") or "", "blocks": blocks}
        )

    @staticmethod
    def _decode(data: bytes):
        from docstrange_ray.ops.media_meta import decode_jpeg_gray, decode_png

        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(data)
        if data[:2] == b"\xff\xd8":
            return decode_jpeg_gray(data)
        raise ValueError("unsupported image container")


_BACKENDS = {
    "mock": MockPageBackend,
    "pixels": ProjectionProfileBackend,
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
