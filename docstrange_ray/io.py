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


# ---- tokenized indexed-binary export (the training-data handoff) ----
#
# The Megatron-LM indexed-dataset shape (public format: NVIDIA
# Megatron-LM indexed_dataset.py — a flat .bin token stream plus an
# .idx sidecar of per-document extents), re-implemented from scratch:
# the sink an LLM-pretraining consumer actually reads, closing the
# pipeline end (extract -> curate -> tokenize -> THIS). The reference
# has no training-data sink at all (its sinks are markdown/JSON/CSV,
# SURVEY §2.1 S17); this is part of the LLM-ops extension family.

_TOKBIN_MAGIC = b"DSRAYIDX"
_TOKBIN_VERSION = 1


def _write_token_shard(
    out_dir: str, shard_id: int, doc_ids, token_lists
) -> dict:
    """Write one shard ATOMICALLY (tmp + rename, the manifest-sink
    discipline): ``shard-{id:05d}.bin`` = uint32 little-endian token
    stream in doc order; ``.idx`` = magic/version header + int64
    doc_ids, token counts and byte pointers. Returns summary dict."""
    import os
    import struct

    import numpy as np

    ids = np.asarray(doc_ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    lists = []
    for i in order:
        a = np.asarray(token_lists[i], dtype=np.int64)
        if len(a) and (a.min() < 0 or a.max() >= 2**32):
            raise ValueError("token id out of uint32 range")
        lists.append(a.astype(np.uint32))
    lengths = np.array([len(a) for a in lists], dtype=np.int64)
    pointers = np.zeros(len(lists), dtype=np.int64)
    if len(lists):
        np.cumsum(lengths[:-1] * 4, out=pointers[1:])
    bin_path = os.path.join(out_dir, f"shard-{shard_id:05d}.bin")
    idx_path = os.path.join(out_dir, f"shard-{shard_id:05d}.idx")
    tmp = bin_path + ".tmp"
    with open(tmp, "wb") as f:
        for a in lists:
            f.write(a.astype("<u4").tobytes())
    os.replace(tmp, bin_path)
    tmp = idx_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_TOKBIN_MAGIC)
        f.write(struct.pack("<QBQ", _TOKBIN_VERSION, 4, len(ids)))
        f.write(ids.astype("<i8").tobytes())
        f.write(lengths.astype("<i8").tobytes())
        f.write(pointers.astype("<i8").tobytes())
    os.replace(tmp, idx_path)
    return {
        "shard_id": shard_id,
        "n_docs": int(len(ids)),
        "n_tokens": int(lengths.sum()),
    }


def write_token_shards(
    ds,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
):
    """Distributed indexed-binary token sink. Shard = ``doc_id %
    n_shards`` (deterministic and parallelism-independent, the
    manifest-sink partitioning rule), ONE shard-keyed exchange
    co-locates each shard's docs, each shard file pair is written by
    its own task (atomic tmp+rename; a killed job leaves only complete
    shards, a re-run overwrites in place) — tokens NEVER visit the
    driver. Within a shard docs are doc_id-ordered, so output bytes
    are independent of arrival order. Size ``n_shards`` to the data
    (tokens x 4 bytes / target shard size), never to the cluster.
    Returns Dataset[(shard_id, n_docs, n_tokens)] — one row per
    written shard."""
    import os

    import pandas as pd
    import pyarrow as pa

    from docstrange_ray.shuffle import grouped_blocks

    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column(id_col).cast(pa.int64()), dtype=np.int64)
        # np.mod = floored modulo: non-negative for negative ids too
        shard = np.mod(ids, n_shards).astype(np.int64)
        return batch.append_column("shard_id", pa.array(shard, pa.int64()))

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s, g in df.groupby("shard_id", sort=True):
            rows.append(
                _write_token_shard(
                    out_dir, int(s), g[id_col].to_numpy(), list(g[tokens_col])
                )
            )
        return pd.DataFrame(rows, columns=["shard_id", "n_docs", "n_tokens"]).astype(
            {"shard_id": "int64", "n_docs": "int64", "n_tokens": "int64"}
        )

    return grouped_blocks(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["shard_id"],
        write_block,
        n_shards,
        batch_format="pandas",
    )


def read_token_shards(out_dir: str):
    """Read an indexed-binary token directory back as
    Dataset[(doc_id, tokens: list<int64>)] — one read task per shard
    (parallel, streaming; the .idx header is validated)."""
    import glob as _glob
    import os
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data

    idx_paths = sorted(_glob.glob(os.path.join(out_dir, "shard-*.idx")))
    if not idx_paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tokens": pa.array([], pa.list_(pa.int64())),
                }
            )
        )

    def load(batch: pa.Table) -> pa.Table:
        ids_all, toks_all = [], []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                magic = f.read(8)
                if magic != _TOKBIN_MAGIC:
                    raise ValueError(f"bad token-shard magic in {p}")
                version, dtype_code, n = struct.unpack("<QBQ", f.read(17))
                if version != _TOKBIN_VERSION or dtype_code != 4:
                    raise ValueError(f"unsupported token-shard layout in {p}")
                ids = np.frombuffer(f.read(8 * n), dtype="<i8")
                lengths = np.frombuffer(f.read(8 * n), dtype="<i8")
                pointers = np.frombuffer(f.read(8 * n), dtype="<i8")
            data = np.fromfile(p[:-4] + ".bin", dtype="<u4")
            for i in range(n):
                start = pointers[i] // 4
                toks_all.append(
                    data[start : start + lengths[i]].astype(np.int64)
                )
            ids_all.append(ids)
        flat_ids = (
            np.concatenate(ids_all) if ids_all else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(flat_ids, pa.int64()),
                "tokens": pa.array(
                    [t.tolist() for t in toks_all], pa.list_(pa.int64())
                ),
            }
        )

    return ray.data.from_items(
        [{"path": p} for p in idx_paths]
    ).map_batches(load, batch_format="pyarrow", batch_size=1)


def read_csv_docs(path: str, columns: list[str] | None = None):
    """CSV ingest (the reference's S7 source, re-expressed as a Ray
    Data source): ``ray.data.read_csv`` over a shard directory, schema
    metadata stripped like every other reader (round-2 gotcha). CSV is
    row-major and type-inferred — prefer parquet for anything re-read;
    this exists for interchange with the reference's own CSV exports.
    """
    import ray.data

    from docstrange_ray.shuffle import _strip_schema_metadata

    ds = ray.data.read_csv(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return _strip_schema_metadata(ds)


def write_csv_docs(ds, path: str) -> None:
    """Write a Dataset as CSV shards under ``path`` (one file per block
    — the resumable-output discipline). Arrow's writer quotes embedded
    delimiters/newlines, so text columns survive the round trip."""
    import ray.data  # noqa: F401

    ds.write_csv(path)


def _write_file_per_block(ds, path: str, ext: str, write_table) -> None:
    """Shared sink core for the Arrow-container formats Ray Data has no
    built-in writer for (Feather/IPC, ORC): one file per block (the
    resumable-output discipline), written ATOMICALLY (tmp + rename — a
    killed job leaves only complete shards), names salted with a uuid
    so concurrent tasks never collide. The per-block map task writes
    from the zero-copy Arrow block directly — bytes never visit the
    driver; the single-row markers it emits are drained as the
    execution trigger."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        name = f"block-{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(path, name + ".tmp")
        write_table(batch, tmp)
        os.replace(tmp, os.path.join(path, name))
        return pa.table({"n_rows": pa.array([batch.num_rows], pa.int64())})

    for _ in ds.map_batches(
        dump, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None):
        pass


def _read_file_per_task(path: str, ext: str, read_table, columns):
    """Shared source core for Feather/ORC shard directories: one read
    task per file (parallel, streaming — the read_token_shards shape),
    schema metadata stripped like every reader (round-2 gotcha)."""
    import glob as _glob
    import os

    import pyarrow as pa
    import ray.data

    from docstrange_ray.shuffle import _strip_schema_metadata

    paths = sorted(_glob.glob(os.path.join(path, f"*{ext}")))
    if not paths:
        raise FileNotFoundError(f"no {ext} shards under {path}")

    def load(batch: pa.Table) -> pa.Table:
        tabs = [
            read_table(p, columns) for p in batch.column("path").to_pylist()
        ]
        return pa.concat_tables(tabs)

    ds = ray.data.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
    return _strip_schema_metadata(ds)


def write_feather_docs(ds, path: str) -> None:
    """Feather-v2 / Arrow-IPC sink (the zero-copy interchange format a
    pandas/polars/R consumer mmaps directly): one .feather file per
    block under ``path``. Uncompressed by choice — IPC's value is the
    mmap path; compressed interchange is parquet's job."""
    import pyarrow.feather as _feather

    _write_file_per_block(
        ds,
        path,
        ".feather",
        lambda t, p: _feather.write_feather(t, p, compression="uncompressed"),
    )


def read_feather_docs(path: str, columns: list[str] | None = None):
    """Feather-v2 / Arrow-IPC source over a shard directory: one read
    task per file, column projection pushed into the reader (IPC is
    columnar — unread columns are never touched)."""
    import pyarrow.feather as _feather

    return _read_file_per_task(
        path,
        ".feather",
        lambda p, cols: _feather.read_table(p, columns=cols),
        columns,
    )


def write_orc_docs(ds, path: str) -> None:
    """ORC sink (the Hive/Trino-ecosystem columnar interchange format):
    one .orc file per block under ``path`` via pyarrow.orc — the
    handoff a warehouse-side consumer ingests without conversion."""
    import pyarrow.orc as _orc

    _write_file_per_block(
        ds, path, ".orc", lambda t, p: _orc.write_table(t, p)
    )


def read_orc_docs(path: str, columns: list[str] | None = None):
    """ORC source over a shard directory: one read task per file,
    column projection pushed into the ORC stripe reader."""
    import pyarrow.orc as _orc

    return _read_file_per_task(
        path,
        ".orc",
        lambda p, cols: _orc.ORCFile(p).read(columns=cols),
        columns,
    )
