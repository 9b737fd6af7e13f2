"""Pipeline builders: the flagship extraction pipeline and the resumable
extraction *job*.

Two terminal shapes over the same stages (docstrange_ray.stages):

  * ``extract_pipeline(ds)``  -> Dataset[(doc_id, spans)] — streaming
    result for composition / queries.
  * ``run_extract_job(ds, out_dir)`` — the production shape: the same
    adaptive pipeline feeding ONE exchange keyed on the deterministic
    partition id; each partition is written atomically with a
    lineage+metrics manifest, and a rerun skips completed partitions
    (resume).
"""

from __future__ import annotations

import time

import pyarrow as pa

from docstrange_ray.config import DEFAULT, ExtractConfig
from docstrange_ray.schema import DOCUMENTS_SCHEMA
from docstrange_ray.shuffle import _cluster_cpus, grouped_blocks
from docstrange_ray.stages import (
    ExtractUnitActor,
    assemble_block,
    bind_actor,
    make_explode_heavy,
    make_extract_light,
)
from docstrange_ray.state import manifest as mstate

_INLINE = 1 << 30  # skew threshold that disables the explode path


def resolve_auto_plan(ds, cfg: ExtractConfig = DEFAULT):
    """The 'auto' plan decision: probe a plan-time sample for documents
    crossing the cost-based explode gate. Returns ``None`` (inline plan)
    when none does, else ``'auto'`` (split-stream plan with the cost
    gate). Exposed for tests and for callers that want to log the chosen
    plan."""
    from docstrange_ray.stages import make_skew_gate

    gate = make_skew_gate(cfg, "auto")
    sample = ds.limit(cfg.plan_sample_docs).take_all()
    if any(gate(list(r["spans"] or [])) for r in sample):
        return "auto"
    return None


def extract_pipeline(
    ds,
    cfg: ExtractConfig = DEFAULT,
    skew_threshold_units: int | str | None = "auto",
    layout_concurrency=None,
    assemble_partitions: int | None = None,
    actor_cls: type | None = None,
):
    """Input Dataset[(doc_id, spans)] -> extracted Dataset[(doc_id, spans)].

    Split-stream plan: light documents (the vast majority; gate
    semantics in stages.make_skew_gate — cost-based under the default
    ``skew_threshold_units='auto'``) extract inline in stateless tasks at full
    cluster width and NEVER touch a shuffle; only the heavy tail explodes
    into unit rows, is DISTRIBUTED cluster-wide by a round-robin salt
    exchange, runs through the stateful layout actor pool, and is
    gathered back with a hash shuffle keyed on doc_id (both exchanges
    carry just the skewed tail's units). The two branches stream concurrently in one
    execution and union. The input is scanned twice (column-pruned
    parquet scans are cheap; shuffling every finished document is not).

    **Input contract: the two scans must yield the same row SET.**
    Row order may differ (the gate is content-based, so branch
    assignment is per-row deterministic), but a source whose re-execution
    can return a different subset — ``.limit()`` over a parallel read,
    ``random_shuffle``, ``random_sample`` — puts a document in both
    branches (duplicate output row) or neither (silently dropped).
    ``.materialize()`` such an input first; plain ``read_parquet``
    scans are set-deterministic and need nothing.

    ``skew_threshold_units=None`` selects the single-branch inline plan
    (everything extracted in one stateless ``map_batches``) — correct
    when no document is large enough to straggle a task.

    Under the default ``'auto'`` gate the plan is chosen adaptively: a
    plan-time sample (cfg.plan_sample_docs) probes for documents that
    cross the cost gate; when none does, the split plan's fixed cost is
    elided entirely. Sampling can only cost straggler balance, never
    correctness — inline extraction handles any document.
    """
    # engine session config (idempotent): hash-shuffle sizing AND the
    # 32 MiB task-granularity bound — the inline plan's straggler tail
    # is set by the worst block, so the block-size cap matters even on
    # the shuffle-free path (BASELINE.md §4c block-granularity finding)
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()

    if skew_threshold_units == "auto":
        skew_threshold_units = resolve_auto_plan(ds, cfg)

    if skew_threshold_units is None:
        return ds.map_batches(
            make_extract_light(cfg, _INLINE),
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
        )

    light = ds.map_batches(
        make_extract_light(cfg, skew_threshold_units),
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )
    n_dist = 2 * _cluster_cpus()
    units = ds.map_batches(
        make_explode_heavy(cfg, skew_threshold_units, n_dist=n_dist),
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )
    # DISTRIBUTE exchange: spread each document's units across the
    # cluster before extraction. Without it, operator fusion keeps a
    # giant doc's units in the task that exploded them and one worker
    # straggles through a 500-page scan alone (distribute -> extract ->
    # gather is the canonical heavy-tail shape; both exchanges carry
    # only the skewed tail).
    units = units.repartition(n_dist, keys=["dist_key"])
    # bind_actor bakes cfg into the class (see stages.bind_actor on
    # ray#53727 restart semantics); actor_cls overrides for tests
    # (fault injection) and real-weights deployments.
    units = units.map_batches(
        actor_cls or bind_actor(ExtractUnitActor, cfg=cfg),
        batch_format="pyarrow",
        batch_size=cfg.layout_batch_size,
        concurrency=layout_concurrency
        or cfg.layout_concurrency
        or (2, max(2, (3 * _cluster_cpus()) // 4)),
        num_cpus=1,
    )
    heavy = grouped_blocks(units, ["doc_id"], assemble_block, assemble_partitions)
    return light.union(heavy)


_MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("part_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("wall_sec", pa.float64()),
    ]
)


def _write_partitions_block(
    block: pa.Table, out_dir: str, fingerprint: str, cfg_fingerprint: str
) -> pa.Table:
    """Sink stage (block-local): a hash-co-located block holds one or more
    COMPLETE output partitions' finished (doc_id, spans, part_id) rows.
    Write each partition's zero-copy slice as an atomic parquet +
    manifest; emit one manifest summary row per partition."""
    import numpy as np
    import pyarrow.compute as pc

    if block.num_rows == 0:
        return pa.Table.from_pylist([], schema=_MANIFEST_ROW_SCHEMA)
    order = pc.sort_indices(
        block, sort_keys=[("part_id", "ascending"), ("doc_id", "ascending")]
    )
    block = block.combine_chunks().take(order)
    pids_np = block.column("part_id").combine_chunks().to_numpy()
    starts = np.concatenate(([0], np.where(pids_np[1:] != pids_np[:-1])[0] + 1))
    bounds = np.append(starts, len(pids_np))

    out_rows: list[dict] = []
    started = time.time()
    for i, s in enumerate(starts):
        part = block.slice(s, bounds[i + 1] - s).select(["doc_id", "spans"])
        man = mstate.write_partition(
            out_dir,
            int(pids_np[s]),
            part,
            fingerprint,
            started,
            config_fingerprint=cfg_fingerprint,
        )
        out_rows.append(
            {
                "part_id": man["part_id"],
                "n_docs": man["n_docs"],
                "n_spans": man["n_spans"],
                "wall_sec": man["wall_sec"],
            }
        )
    return pa.Table.from_pylist(out_rows, schema=_MANIFEST_ROW_SCHEMA)


def run_extract_job(
    ds,
    out_dir: str,
    input_fingerprint: str,
    cfg: ExtractConfig = DEFAULT,
    skew_threshold_units: int | str = "auto",
    num_partitions: int | None = None,
    resume: bool = True,
    layout_concurrency=None,
) -> list[dict]:
    """The production job: extract ``ds`` into ``out_dir`` as
    ``num_partitions`` atomic parquet partitions with manifests; on rerun,
    partitions with a valid manifest are filtered out at the head of the
    pipeline (no reprocessing — BASELINE.md resumability target).

    Plan: resume-filter the INPUT (completed partitions never re-extract),
    run the full adaptive extract_pipeline (split-stream: light docs
    inline, heavy tail via the actor pool), recompute the deterministic
    part_id on the finished rows (pure hash of doc_id — nothing carried
    through extraction), and co-locate each output partition with ONE
    part_id-keyed exchange feeding the atomic writer.

    Returns the list of partition-manifest summary rows written this run.
    """
    import pyarrow.compute as pc

    P = num_partitions or cfg.num_output_partitions
    cfg_fp = cfg.fingerprint()
    done = (
        mstate.completed_partitions(out_dir, input_fingerprint, cfg_fp)
        if resume
        else set()
    )

    if len(done) >= P:
        # every partition already written under this (input, config)
        # lineage: a resume is a pure no-op — skip even the input scan
        return []
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def filter_done(batch: pa.Table) -> pa.Table:
            part = mstate.partition_column(batch.column("doc_id"), P)
            return batch.filter(pc.invert(pc.is_in(part, done_arr)))

        ds = ds.map_batches(filter_done, batch_format="pyarrow")

    extracted = extract_pipeline(
        ds, cfg, skew_threshold_units, layout_concurrency=layout_concurrency
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part_id", mstate.partition_column(batch.column("doc_id"), P)
        )

    tagged = extracted.map_batches(tag, batch_format="pyarrow")
    manifests = grouped_blocks(
        tagged,
        ["part_id"],
        lambda b: _write_partitions_block(b, out_dir, input_fingerprint, cfg_fp),
        num_partitions=min(P, 64),
    )
    return manifests.take_all()  # small: one row per partition
