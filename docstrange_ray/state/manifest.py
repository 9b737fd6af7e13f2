"""Resumable partitioned sink with per-partition lineage + metrics.

The reference has no checkpoint/resume at all (SURVEY.md §4.1; its only
identity cache is the MCP server's in-memory md5 map,
mcp_server_module/server.py:87-89). At 10^12 documents a killed job must
not reprocess finished work, so the engine owns an explicit design:

  * partition id = crc32(doc_id) % num_partitions — deterministic and
    independent of cluster size / parallelism, so a resume at a different
    parallelism still lines up with prior output;
  * each partition writes ``part-{id:05d}.parquet`` ATOMICALLY (temp file
    + rename) followed by ``part-{id:05d}.manifest.json`` carrying
    lineage (doc ids digest, input fingerprint, config fingerprint) and
    extraction metrics (docs, spans, est_cost, wall seconds);
  * resume = list valid manifests, filter those partitions out of the
    input with a vectorized ``map_batches`` mask (no shuffle, no
    per-row anti-join — SURVEY.md §2.7).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as _pc
import pyarrow.parquet as pq


def partition_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def partition_column(doc_ids: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    return pa.array(
        [zlib.crc32(d.encode("utf-8")) % num_partitions for d in doc_ids.to_pylist()],
        type=pa.int32(),
    )


def _manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:05d}.manifest.json")


def _data_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:05d}.parquet")


def write_partition(
    out_dir: str,
    part_id: int,
    table: pa.Table,
    input_fingerprint: str,
    started: float,
    metrics: dict | None = None,
    config_fingerprint: str = "",
) -> dict:
    """Atomically write one partition's data + manifest; returns the
    manifest dict (also the sink stage's output row)."""
    os.makedirs(out_dir, exist_ok=True)
    data_path = _data_path(out_dir, part_id)
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, data_path)

    doc_ids = table.column("doc_id").to_pylist()
    digest = hashlib.md5("\n".join(sorted(doc_ids)).encode()).hexdigest()
    manifest = {
        "part_id": part_id,
        "n_docs": len(doc_ids),
        "n_spans": int(
            _pc.sum(_pc.fill_null(_pc.list_value_length(table.column("spans")), 0)).as_py() or 0
            if "spans" in table.column_names
            else 0
        ),
        "doc_ids_md5": digest,
        "input_fingerprint": input_fingerprint,
        "config_fingerprint": config_fingerprint,
        "wall_sec": round(time.time() - started, 4),
        **(metrics or {}),
    }
    mtmp = _manifest_path(out_dir, part_id) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, _manifest_path(out_dir, part_id))
    return manifest


def completed_partitions(
    out_dir: str, input_fingerprint: str, config_fingerprint: str = ""
) -> set[int]:
    """Partitions with a valid manifest matching BOTH the input
    fingerprint and the extraction-config fingerprint (a manifest from a
    different input OR from different extraction heuristics invalidates
    the partition — resuming after changing ExtractConfig must not
    silently keep partitions extracted under the old heuristics)."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.endswith(".manifest.json"):
            continue
        try:
            with open(os.path.join(out_dir, name)) as f:
                m = json.load(f)
            if (
                m.get("input_fingerprint") == input_fingerprint
                and m.get("config_fingerprint", "") == config_fingerprint
                and os.path.exists(_data_path(out_dir, int(m["part_id"])))
            ):
                done.add(int(m["part_id"]))
        except (json.JSONDecodeError, KeyError, ValueError, OSError):
            continue
    return done


def read_output(out_dir: str):
    """Read the finished partitions back as a Dataset."""
    import ray.data

    paths = [
        os.path.join(out_dir, n)
        for n in sorted(os.listdir(out_dir))
        if n.endswith(".parquet")
    ]
    return ray.data.read_parquet(paths)


def job_summary(out_dir: str) -> dict:
    """Aggregate all partition manifests into job-level metrics (the
    'global job metrics' of SURVEY.md §2.5): totals plus per-partition
    extremes for skew visibility."""
    parts = []
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if name.endswith(".manifest.json"):
            try:
                with open(os.path.join(out_dir, name)) as f:
                    parts.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                continue
    if not parts:
        return {"n_partitions": 0, "n_docs": 0, "n_spans": 0}
    docs = [p.get("n_docs", 0) for p in parts]
    return {
        "n_partitions": len(parts),
        "n_docs": int(sum(docs)),
        "n_spans": int(sum(p.get("n_spans", 0) for p in parts)),
        "max_partition_docs": int(max(docs)),
        "min_partition_docs": int(min(docs)),
        "wall_sec_max": max(p.get("wall_sec", 0.0) for p in parts),
    }
