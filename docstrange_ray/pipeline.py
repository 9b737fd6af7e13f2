"""Pipeline builders: the flagship extraction pipeline and the resumable
extraction *job*.

Two terminal shapes over the same stages (docstrange_ray.stages):

  * ``extract_pipeline(ds)``  -> Dataset[(doc_id, spans)] — streaming
    result for composition / queries.
  * ``run_extract_job(ds, out_dir)`` — the production shape: assembly and
    the sink share ONE shuffle keyed on the deterministic partition id,
    each partition is written atomically with a lineage+metrics manifest,
    and a rerun skips completed partitions (resume).
"""

from __future__ import annotations

import time

import pyarrow as pa

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.extract.core import finalize_spans
from docstrange_ray.schema import DOCUMENTS_SCHEMA
from docstrange_ray.shuffle import _cluster_cpus, grouped_blocks
from docstrange_ray.stages import (
    ExtractUnitActor,
    assemble_block,
    make_extract_or_explode,
)
from docstrange_ray.state import manifest as mstate

_INLINE = 1 << 30  # skew threshold that disables the explode path


def extract_pipeline(
    ds,
    cfg: ExtractConfig = DEFAULT,
    skew_threshold_units: int | None = 16,
    layout_concurrency=None,
    assemble_partitions: int | None = None,
):
    """Input Dataset[(doc_id, spans)] -> extracted Dataset[(doc_id, spans)].

    ``skew_threshold_units=None`` selects the shuffle-free inline plan
    (every document extracted inside one stateless ``map_batches``) —
    correct when per-unit cost is small. The default plan explodes
    documents with >= 16 input spans into unit rows, runs the stateful
    layout stage as an actor pool, and restores order with ONE hash
    shuffle keyed on doc_id + block-local reassembly
    (shuffle.grouped_blocks).
    """
    if skew_threshold_units is None:
        fn = make_extract_or_explode(cfg, _INLINE)

        def project(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [batch.column("doc_id"), batch.column("spans")],
                schema=DOCUMENTS_SCHEMA,
            )

        return ds.map_batches(
            fn, batch_format="pyarrow", batch_size=cfg.parse_batch_size
        ).map_batches(project, batch_format="pyarrow")

    units = ds.map_batches(
        make_extract_or_explode(cfg, skew_threshold_units),
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )
    units = units.map_batches(
        ExtractUnitActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.layout_batch_size,
        concurrency=layout_concurrency or cfg.layout_concurrency or (2, _cluster_cpus()),
        num_cpus=1,
    )
    return grouped_blocks(units, ["doc_id"], assemble_block, assemble_partitions)


_MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("part_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("wall_sec", pa.float64()),
    ]
)


def _assemble_and_write_block(block: pa.Table, out_dir: str, fingerprint: str) -> pa.Table:
    """Sink stage (block-local): a hash-co-located block holds one or more
    COMPLETE output partitions' unit rows. Assemble each partition's docs
    and write its parquet + manifest atomically; emit one manifest summary
    row per partition."""
    import pyarrow.compute as pc

    if block.num_rows == 0:
        return pa.Table.from_pylist([], schema=_MANIFEST_ROW_SCHEMA)
    order = pc.sort_indices(
        block,
        sort_keys=[("part_id", "ascending"), ("doc_id", "ascending"), ("seq", "ascending")],
    )
    block = block.take(order)
    part_ids = block.column("part_id").to_pylist()
    doc_ids = block.column("doc_id").to_pylist()
    span_lists = block.column("spans").to_pylist()
    costs = block.column("est_cost").to_pylist()

    out_rows: list[dict] = []
    started = time.time()

    def flush_partition(pid: int, rows: list[dict], total_cost: float) -> None:
        table = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
        man = mstate.write_partition(
            out_dir,
            pid,
            table,
            fingerprint,
            started,
            metrics={"est_cost": round(total_cost, 1)},
        )
        out_rows.append(
            {
                "part_id": man["part_id"],
                "n_docs": man["n_docs"],
                "n_spans": man["n_spans"],
                "wall_sec": man["wall_sec"],
            }
        )

    cur_pid: int | None = None
    cur_did: str | None = None
    rows: list[dict] = []
    cur_spans: list[dict] = []
    total_cost = 0.0

    def close_doc() -> None:
        nonlocal cur_did
        if cur_did is not None:
            rows.append({"doc_id": cur_did, "spans": finalize_spans(cur_spans)})
        cur_did = None

    for pid, did, spans, cost in zip(part_ids, doc_ids, span_lists, costs):
        if pid != cur_pid:
            close_doc()
            if cur_pid is not None:
                flush_partition(cur_pid, rows, total_cost)
            cur_pid, rows, total_cost = pid, [], 0.0
        if did != cur_did:
            close_doc()
            cur_did, cur_spans = did, []
        cur_spans.extend(spans or [])
        total_cost += cost or 0.0
    close_doc()
    if cur_pid is not None:
        flush_partition(cur_pid, rows, total_cost)
    return pa.Table.from_pylist(out_rows, schema=_MANIFEST_ROW_SCHEMA)


def run_extract_job(
    ds,
    out_dir: str,
    input_fingerprint: str,
    cfg: ExtractConfig = DEFAULT,
    skew_threshold_units: int = 16,
    num_partitions: int | None = None,
    resume: bool = True,
    layout_concurrency=None,
) -> list[dict]:
    """The production job: extract ``ds`` into ``out_dir`` as
    ``num_partitions`` atomic parquet partitions with manifests; on rerun,
    partitions with a valid manifest are filtered out at the head of the
    pipeline (no reprocessing — BASELINE.md resumability target).

    Returns the list of partition-manifest summary rows written this run.
    """
    P = num_partitions or cfg.num_output_partitions
    done = mstate.completed_partitions(out_dir, input_fingerprint) if resume else set()

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        part = mstate.partition_column(batch.column("doc_id"), P)
        batch = batch.append_column("part_id", part)
        if done:
            import pyarrow.compute as pc

            mask = pc.invert(pc.is_in(batch.column("part_id"), pa.array(sorted(done), pa.int32())))
            batch = batch.filter(mask)
        return batch

    ds = ds.map_batches(tag_and_filter, batch_format="pyarrow")

    units = ds.map_batches(
        make_extract_or_explode(cfg, skew_threshold_units, keep_columns=("part_id",)),
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )
    units = units.map_batches(
        ExtractUnitActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.layout_batch_size,
        concurrency=layout_concurrency or cfg.layout_concurrency or (2, _cluster_cpus()),
        num_cpus=1,
    )
    manifests = grouped_blocks(
        units,
        ["part_id"],
        lambda b: _assemble_and_write_block(b, out_dir, input_fingerprint),
        num_partitions=min(P, 64),
    )
    return manifests.take_all()  # small: one row per partition
