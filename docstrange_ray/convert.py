"""Batch conversion CLI — the engine's analogue of the reference's
``docstrange file1 file2 --output markdown`` surface (cli.py:165-556),
lifted from per-file to per-corpus:

    python -m docstrange_ray.convert \\
        --input /data/corpus --output /data/out --format markdown

Runs the adaptive extraction pipeline and writes partitioned parquet of
(doc_id, <format>) rows — markdown / html / json / csv — via the
streaming executor (never materialized on the driver). Owns its Ray
session (guarded init), like every CLI in this repo.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# 'text' mirrors the reference's extract_text(): the content verbatim
# (result.py:1020-1027 returns self.content — i.e. the markdown IR)
FORMATS = ("markdown", "html", "json", "csv", "chunks", "text")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="corpus directory (Lance or parquet)")
    src.add_argument(
        "--files",
        help="directory (or file) of REAL documents — .docx/.xlsx/.pptx/"
        ".pdf/.csv/.txt/.html/.md — ingested via the binary parsers "
        "(the reference's `docstrange <files>` input mode)",
    )
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--format", choices=FORMATS, default="markdown")
    p.add_argument("--token-budget", type=int, default=4000, help="chunks format only")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local")

    from docstrange_ray.io import read_corpus
    from docstrange_ray.pipeline import extract_pipeline
    from docstrange_ray.projections import add_projection, chunk_documents
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()
    t0 = time.time()
    if args.files:
        from docstrange_ray.sources import read_files

        source = read_files(args.files)
    else:
        source = read_corpus(args.input, columns=["doc_id", "spans"])
    extracted = extract_pipeline(source)
    if args.format == "chunks":
        out = chunk_documents(extracted, token_budget=args.token_budget)
    else:
        fmt = "markdown" if args.format == "text" else args.format
        out = add_projection(extracted, fmt, column=args.format).select_columns(
            ["doc_id", args.format]
        )
    out.write_parquet(args.output)
    n = read_corpus(args.output).count()
    print(
        json.dumps(
            {
                "rows_written": n,
                "format": args.format,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
