"""File-corpus ingest: real file bytes → the interleaved corpus model.

``read_files`` is the bridge between a directory/list of real documents
(.docx/.xlsx/.pptx/.pdf/.csv/.txt/.html/.md) and the engine's
``(doc_id, spans)`` input shape: ``ray.data.read_binary_files`` streams
the bytes, and a stateless ``map_batches`` runs the extension dispatch +
stdlib binary parsers (`extract.binary_formats`). The result composes
with the unchanged adaptive ``extract_pipeline`` — the cost gate, page
explode and actor pool all apply to real files exactly as to synthetic
corpora (a 500-page PDF becomes 500 'page-src' input spans and crosses
the explode gate like any heavy document).

Scale notes: binary payloads stay inside the read tasks (never
collected); parsing is per-file CPU work in stateless tasks at full
width; `ray.data.read_binary_files` shards by file. For very large
single files, rely on the explode path downstream rather than splitting
the read.
"""

from __future__ import annotations

import os

import pyarrow as pa

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.schema import DOCUMENTS_SCHEMA


def read_files(paths, cfg: ExtractConfig = DEFAULT, doc_id_from: str = "name"):
    """Dataset[(doc_id, spans)] over real files. ``paths`` is a
    directory, file path, or list of either (``read_binary_files``
    semantics). ``doc_id_from``: 'name' (basename — the reference keys
    results by file name) or 'path' (full path, collision-proof across
    directories)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        from docstrange_ray.extract.binary_formats import file_bytes_to_input_spans

        rows = []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            doc_id = os.path.basename(path) if doc_id_from == "name" else path
            rows.append(
                {
                    "doc_id": doc_id,
                    "spans": file_bytes_to_input_spans(doc_id, data, cfg),
                }
            )
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow")


def extract_files(paths, cfg: ExtractConfig = DEFAULT, **pipeline_kwargs):
    """One-call convenience: ingest real files and run the full adaptive
    extraction pipeline. Returns Dataset[(doc_id, spans)] of extracted
    spans."""
    from docstrange_ray.pipeline import extract_pipeline

    return extract_pipeline(read_files(paths, cfg), cfg, **pipeline_kwargs)
