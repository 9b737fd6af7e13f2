#!/usr/bin/env python
"""Measured comparison for the round-2 backlog question: is
run_extract_job's part_id exchange (ONE full-output shuffle feeding
atomic partition writes + manifests) worth its cost versus a
fragment sink (every pipeline block writes its own parquet fragment
directly — NO output exchange, but no atomic-partition resume either)?

Runs both sinks over the same pre-generated bench corpus and prints a
JSON comparison line:

    python scripts/sink_compare.py [n_docs]

Trade-off being priced (BASELINE.md records the decision):
  * exchange sink: + atomic per-partition resume (a killed job skips
    finished partitions at ANY parallelism), bounded file count (P
    partitions); − one full-output shuffle.
  * fragment sink: − resume only at whole-job granularity (a fragment
    set is only provably complete when the job finishes, so manifests
    can't be trusted mid-write); − file count scales with block count
    (write amplification for downstream readers); + no output exchange.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import ensure_corpus
    from docstrange_ray.io import read_parquet_clean
    from docstrange_ray.pipeline import extract_pipeline, run_extract_job
    from docstrange_ray.state import manifest as mstate

    corpus = ensure_corpus(n_docs)
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[:3]

    # --- exchange sink (production run_extract_job) ---------------------
    out_ex = "/tmp/dsray_sink_exchange"
    shutil.rmtree(out_ex, ignore_errors=True)
    t0 = time.perf_counter()
    manifests = run_extract_job(
        read_parquet_clean(corpus), out_ex, input_fingerprint="sinkcmp"
    )
    t_exchange = time.perf_counter() - t0
    n_files_ex = len(
        [f for f in os.listdir(out_ex) if f.endswith(".parquet")]
    )

    # --- fragment sink: no exchange, one fragment per output block ------
    out_fr = "/tmp/dsray_sink_fragments"
    shutil.rmtree(out_fr, ignore_errors=True)
    os.makedirs(out_fr)

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_fragment(batch: pa.Table) -> pa.Table:
        # deterministic-enough name for the measurement; a production
        # fragment sink needs task-lineage naming for idempotent retries
        part = batch.append_column(
            "part_id", mstate.partition_column(batch.column("doc_id"), 32)
        )
        name = f"frag-{os.getpid()}-{time.monotonic_ns()}.parquet"
        pq.write_table(part, os.path.join(out_fr, name))
        return pa.Table.from_pylist(
            [{"n": batch.num_rows}], schema=pa.schema([("n", pa.int64())])
        )

    t0 = time.perf_counter()
    written = (
        extract_pipeline(read_parquet_clean(corpus))
        .map_batches(write_fragment, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    t_fragment = time.perf_counter() - t0
    n_files_fr = len(os.listdir(out_fr))
    n_rows_fr = sum(r["n"] for r in written)

    with open("/proc/loadavg") as f:
        load_after = f.read().split()[:3]

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "exchange_sink_sec": round(t_exchange, 2),
                "exchange_sink_files": n_files_ex,
                "exchange_partitions": len(manifests),
                "fragment_sink_sec": round(t_fragment, 2),
                "fragment_sink_files": n_files_fr,
                "fragment_rows": n_rows_fr,
                "exchange_overhead_sec": round(t_exchange - t_fragment, 2),
                "loadavg_before": load_before,
                "loadavg_after": load_after,
            }
        )
    )
    shutil.rmtree(out_ex, ignore_errors=True)
    shutil.rmtree(out_fr, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
