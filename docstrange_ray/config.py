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
    # Batch size for light stateless parse stages (rows per batch). Small
    # enough that a batch containing several giant documents doesn't
    # straggle the stage (load balance beats per-batch amortization here).
    parse_batch_size: int = 64
    # Batch size for the layout/OCR actor stage (unit rows per batch).
    # Large batches matter doubly here: they amortize per-batch overhead
    # AND set the stage's output block granularity — downstream hash
    # shuffles pay per-block costs, and thousands of 64-row blocks made
    # the reassembly shuffle 4x slower than ~1k-row blocks. A deployment
    # with real OCR models (heavy per-unit compute, large page images)
    # should lower this and rely on block coalescing instead.
    layout_batch_size: int = 1024
    # Actor pool size for the layout stage; None -> let Ray autoscale between
    # (2, available_parallelism).
    layout_concurrency: int | None = None
    # Number of deterministic output partitions for the resumable sink.
    # Partition id = hash(doc_id) % num_partitions — independent of the
    # parallelism level so a resume at a different cluster size still skips
    # finished partitions.
    num_output_partitions: int = 32
    # Cost model weights for est_cost (see stages.estimate_cost).
    cost_per_char: float = 1.0
    cost_per_page: float = 2000.0
    cost_per_media_ref: float = 50.0


DEFAULT = ExtractConfig()
