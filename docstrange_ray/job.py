"""Cluster job entry point — the ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \\
        python -m docstrange_ray.job \\
            --input  /data/corpus          \\
            --output /data/extracted       \\
            --fingerprint corpus-v1        \\
            --partitions 4096

The same command re-submitted after a failure resumes: partitions whose
manifest matches the fingerprint are filtered at the head of the
pipeline and never reprocessed. Partition count should be sized to the
corpus (>= 4x max parallelism; one partition's docs must fit a worker's
heap), NOT to the cluster — partition ids are deterministic in doc_id
so a resume at a different cluster size still lines up.

Ray session ownership: this CLI owns its session (guarded init) — the
library itself never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="corpus directory (Lance or parquet)")
    src.add_argument(
        "--files",
        help="directory of REAL documents (.docx/.xlsx/.pptx/.pdf/...) "
        "ingested via the binary parsers",
    )
    p.add_argument("--output", required=True, help="output directory for partitions")
    p.add_argument(
        "--fingerprint",
        required=True,
        help="input lineage fingerprint; changing it invalidates prior output",
    )
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local")

    from docstrange_ray.io import read_corpus
    from docstrange_ray.pipeline import run_extract_job
    from docstrange_ray.shuffle import ensure_hash_shuffle
    from docstrange_ray.state.manifest import job_summary

    ensure_hash_shuffle()
    t0 = time.time()
    if args.files:
        from docstrange_ray.sources import read_files

        source = read_files(args.files)
    else:
        source = read_corpus(args.input, columns=["doc_id", "spans"])
    written = run_extract_job(
        source,
        args.output,
        args.fingerprint,
        num_partitions=args.partitions,
        resume=not args.no_resume,
    )
    summary = job_summary(args.output)
    summary["partitions_written_this_run"] = len(written)
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS") and os.environ["RAY_ADDRESS"] != "local")


if __name__ == "__main__":
    sys.exit(main())
