"""Corpus I/O: Lance-first with a parquet stand-in.

The production corpus format is Lance (BASELINE.json: "Lance tables of
interleaved text+media documents" — `ray.data.read_lance` /
`write_lance` are the intended entry points). The Lance package is not
installed in this sandbox, so readers/writers gate on an import-try and
fall back to partitioned parquet with the identical schema; every
pipeline in this repo is format-agnostic past the read.
"""

from __future__ import annotations


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_parquet_clean(path: str, columns: list[str] | None = None, filter=None):
    """``ray.data.read_parquet`` with the file's ``b'pandas'`` schema
    metadata stripped at the source (``schema=`` override). Pandas-written
    parquet carries metadata whose value Ray's schema-hash dedup cannot
    hash — every downstream re-batch and exchange then logs "Failed to
    hash the schemas (for deduplication)" and silently skips dedup.

    ``filter`` (a ``pyarrow.dataset`` expression) pushes the predicate
    INTO the scan: row groups whose statistics exclude the predicate are
    never read, and surviving fragments are filtered before the block is
    built — non-matching data never leaves storage (the read-pruning
    rule for selective scans at 100 TB)."""
    import pyarrow.parquet as pq
    import ray.data

    try:
        schema = pq.read_schema(path).remove_metadata()
    except (OSError, IsADirectoryError):  # directory input: let Ray infer
        import glob
        import os

        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        schema = pq.read_schema(files[0]).remove_metadata() if files else None
    if schema is not None and columns:
        import pyarrow as pa

        # the schema override must match the projected columns
        schema = pa.schema([schema.field(c) for c in columns])
    kwargs = {} if filter is None else {"filter": filter}
    return ray.data.read_parquet(path, schema=schema, columns=columns, **kwargs)


def read_corpus(path: str, columns: list[str] | None = None):
    """Dataset[(doc_id, spans, ...)] from a corpus directory — Lance when
    available, else parquet. Always pass ``columns`` for projection
    pushdown; both formats prune at the scan."""
    import ray.data

    if _have_lance():
        return ray.data.read_lance(path, columns=columns)
    return read_parquet_clean(path, columns=columns)


def write_corpus(ds, path: str):
    """Write a corpus directory in the preferred available format."""
    if _have_lance():
        return ds.write_lance(path)
    return ds.write_parquet(path)


def read_jsonl_docs(path: str, columns: list[str] | None = None,
                    compression: str | None = None):
    """Line-delimited JSON ingest — the de-facto web-corpus interchange
    format (Common Crawl derivatives, Dolma, RedPajama all ship JSONL,
    usually gzipped). ``compression`` must mirror how the shards were
    written (Ray's JSON writer does not add a codec extension, so
    auto-detection cannot engage — verified: gzip shards written via
    arrow_open_stream_args read back as 0x8b garbage without it).
    Schema metadata is stripped the same way as the parquet reader so
    a downstream exchange never sees pandas metadata (round-2 gotcha).
    ``columns`` prunes AFTER parse — JSON is row-major, so unlike
    parquet there is no column-skip at the byte level; prefer parquet
    for anything re-read more than once."""
    import ray.data

    from docstrange_ray.shuffle import _strip_schema_metadata

    kwargs = {}
    if compression is not None:
        kwargs["arrow_open_stream_args"] = {"compression": compression}
    ds = ray.data.read_json(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return _strip_schema_metadata(ds)


def write_jsonl_docs(ds, path: str, compression: str | None = None) -> None:
    """Write a Dataset as JSONL shards under ``path`` (one file per
    block — the resumable-output discipline; never one giant file).
    Pass the same ``compression`` to :func:`read_jsonl_docs`."""
    import ray.data  # noqa: F401

    if compression is not None:
        ds.write_json(path, arrow_open_stream_args={"compression": compression})
    else:
        ds.write_json(path)
