"""docstrange_ray — a Ray-Data-native document-extraction engine.

A brand-new, from-scratch rebuild of the *capabilities* of
smoab/docstrange (reference at /root/reference) expressed Ray-Data-first:
a streaming ``ray.data.Dataset`` pipeline over tables of interleaved
text+media documents ``(doc_id: string, spans: list<struct<kind, text,
media_ref, offset>>)``, ``map_batches`` over zero-copy Arrow batches,
actor pools for the stateful layout/OCR stage, explicit cost-based
repartitioning for skewed documents, and a resumable partitioned sink
with per-partition lineage manifests.

Nothing here is a port: the reference is a single-process,
one-file-at-a-time converter (see SURVEY.md); this package re-implements
the *semantics* (with file:line citations in docstrings) on a columnar,
batched, streaming substrate.
"""

__version__ = "0.1.0"

# Select Ray Data's hash-shuffle strategy process-wide at import time.
# Datasets snapshot the DataContext at creation, so this must run before
# any read_*/from_* call: key-based repartition (shuffle.grouped_blocks —
# the engine's core co-location primitive) is only available under
# HASH_SHUFFLE, and it also replaces sort-based shuffles in groupbys.
try:  # pragma: no cover - trivial
    from ray.data import DataContext as _DataContext
    from ray.data.context import ShuffleStrategy as _ShuffleStrategy

    _DataContext.get_current().shuffle_strategy = _ShuffleStrategy.HASH_SHUFFLE
except Exception:  # noqa: BLE001 - never block import on context tuning
    pass
