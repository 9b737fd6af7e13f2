"""Engine configuration — every heuristic constant in one place.

Mirrors the role of the reference's ``InternalConfig``
(/root/reference/docstrange/config.py:3-15) plus the performance
constants catalogued in SURVEY.md §4.3. All stages read from here so
fidelity-critical thresholds are never duplicated.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractConfig:
    # --- reference-faithful heuristics -------------------------------------
    # OCR/layout confidence floor: regions at or below this are dropped
    # (reference: neural_document_processor.py:300, :337, :477).
    ocr_confidence_floor: float = 0.5
    # Paragraph grouping: merge vertically-adjacent text blocks when the gap
    # is <= this multiple of the average block height
    # (reference: layout_detector.py:98).
    paragraph_gap_factor: float = 1.5
    # Heading classification: <=5 words AND (ends '.' OR isupper) -> heading
    # (reference: layout_detector.py:201).
    heading_max_words: int = 5
    # Heading level by word count: <=3 -> H1, <=5 -> H2, else H3
    # (reference: layout_detector.py:206-216).
    h1_max_words: int = 3
    h2_max_words: int = 5
    # Table row cap with truncation notice (reference: docx_processor.py:140-148).
    table_row_cap: int = 20
    # Direct-text threshold: a "page" with more than this many chars of
    # embedded text skips the OCR path (reference: pdf_processor.py:97).
    direct_text_threshold: int = 50

    # --- engine knobs (scale-facing, not fidelity-facing) -------------------
    # Batch size for light stateless parse stages (rows per batch). 256
    # docs/batch ~ 0.4s of work with the mock backend: coarse enough
    # that per-task overhead is amortized (64-row tasks cost ~25% extra
    # wall at 16 CPUs), fine enough that the cost-gated inline plan
    # (documents above ~2s of work explode instead of riding a batch)
    # cannot straggle a task.
    parse_batch_size: int = 256
    # Batch size for the layout/OCR actor stage. Ray fuses the explode
    # task-map into the actor map, so this counts INPUT DOC rows and sets
    # both the stage's task count (parallelism: n_docs / batch_size tasks
    # must comfortably exceed the actor pool) and its output block
    # granularity (downstream hash shuffles pay per-block costs; 64-row
    # blocks made reassembly 4x slower, while 1024 left a 5k-doc corpus
    # at 5-way parallelism). 256 docs/batch -> ~3k unit rows per block.
    # A deployment with real OCR models (heavy per-unit compute, large
    # page images) should lower this and rely on block coalescing.
    layout_batch_size: int = 256
    # Actor pool size for the layout stage; None -> let Ray autoscale between
    # (2, available_parallelism).
    layout_concurrency: int | None = None
    # Number of deterministic output partitions for the resumable sink.
    # Partition id = hash(doc_id) % num_partitions — independent of the
    # parallelism level so a resume at a different cluster size still skips
    # finished partitions.
    num_output_partitions: int = 32
    # Cost model weights for est_cost (see stages.estimate_cost),
    # calibrated as approximate MICROSECONDS of single-core extraction
    # with the active backend. The deterministic mock backend runs
    # ~1us/char and ~2ms/page-descriptor; a real OCR/layout model is
    # ~1e6 us (1s) per page — a deployment swapping real weights in
    # must recalibrate cost_per_page accordingly.
    cost_per_char: float = 1.0
    cost_per_page: float = 2000.0
    cost_per_media_ref: float = 50.0
    # Cost-based explode gate (skew_threshold_units='auto'): a document
    # explodes into per-unit rows only when its estimated extraction cost
    # exceeds this (i.e. it would straggle a task). 2e6 us = ~2s of
    # single-core work. With mock-backend calibration no synthetic doc
    # qualifies (max ~0.7s) — everything extracts inline at full width;
    # with real-OCR calibration any multi-page scan qualifies.
    explode_cost_threshold: float = 2_000_000.0
    # Simulated per-unit backend cost (milliseconds) — models a real
    # layout/OCR model's inference time in benchmarks and scale demos
    # (scripts/skew_demo.py). 0.0 (default) = pure mock extraction. A
    # config using this should scale cost_per_page to match (~1000 us
    # per simulated ms) so the explode gate sees the true cost.
    simulated_unit_cost_ms: float = 0.0
    # Layout/OCR backend for 'page-src' units in the actor stage:
    # 'mock' (deterministic descriptor-passthrough; hermetic default) or
    # 'docling' (real-weights adapter, import-gated — extract/backends.py,
    # the A8 provider switch of ocr_service.py:190-222).
    page_backend: str = "mock"
    # Plan-time sample size for the 'auto' skew gate: extract_pipeline
    # probes this many documents; if none crosses the explode gate the
    # split-stream plan (second scan + actor pool + reassembly exchange,
    # ~5s of fixed cost per run) is elided for a pure inline plan. A
    # heavy doc the sample missed still extracts CORRECTLY inline — the
    # gate only trades straggler risk against fixed plan cost.
    plan_sample_docs: int = 1000


    def fingerprint(self) -> str:
        """md5 over the FIDELITY-facing fields (the ones that change
        extraction OUTPUT). Recorded in every partition manifest so a
        resume under different heuristics invalidates prior partitions;
        engine knobs (batch sizes, pool sizes, cost model) deliberately
        do NOT participate — retuning performance must not force a
        10^12-doc reprocess."""
        import hashlib

        parts = [
            f"{name}={getattr(self, name)!r}"
            for name in (
                "ocr_confidence_floor",
                "paragraph_gap_factor",
                "heading_max_words",
                "h1_max_words",
                "h2_max_words",
                "table_row_cap",
                "direct_text_threshold",
                # page_backend changes extraction OUTPUT for every
                # 'page-src' unit (ExtractUnitActor routes payloads
                # through backend.analyze_page) — a resume after
                # switching mock<->docling must invalidate partitions.
                "page_backend",
            )
        ]
        return hashlib.md5(";".join(parts).encode("utf-8")).hexdigest()


DEFAULT = ExtractConfig()

# Ray Data block-size target applied by shuffle.ensure_hash_shuffle().
# One block = one map task; Ray's 128 MiB default let a single
# heavy-doc-dense block straggle 13x behind its siblings (the 1M-doc
# headline ran 2.8x slower than linear until this was bounded —
# BASELINE.md §4c). 32 MiB keeps the straggler tail ~4x shorter while
# per-task fixed cost stays negligible (>100 rows/task at this
# corpus's row sizes). At 100 TB the same constant bounds per-task
# heap for span-heavy rows; revisit only with a measured A/B.
TARGET_BLOCK_BYTES = 32 * 1024 * 1024
