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


def read_corpus(path: str, columns: list[str] | None = None):
    """Dataset[(doc_id, spans, ...)] from a corpus directory — Lance when
    available, else parquet. Always pass ``columns`` for projection
    pushdown; both formats prune at the scan."""
    import ray.data

    if _have_lance():
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_corpus(ds, path: str):
    """Write a corpus directory in the preferred available format."""
    if _have_lance():
        return ds.write_lance(path)
    return ds.write_parquet(path)
