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
