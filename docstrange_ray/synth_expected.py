"""Specification oracle for the synthetic corpus: generation structure →
EXPECTED extracted spans / chunks, written as parquet fixtures the driver's
DuckDB oracle can read.

Why this exists (VERDICT r4 "Next round" #1): the extraction family was the
only query family the driver could never confirm — its semantics are not
SQL-expressible from the raw payloads. But the corpus is deterministic and
every non-paged population's extracted output is a CLOSED-FORM function of
the generator's pre-serialization structure (the headings / paragraphs /
list items / table grids / image refs each ``_gen_*`` constructs BEFORE
serializing them to HTML / markdown / CSV / JSON payloads). This module maps
that structure to the expected span sequence — independently of the
``extract/`` parsers, which must recover the same structure from the
serialized bytes — so the driver's rows+schema+hash comparison becomes a
genuine end-to-end check:

    structure --serialize--> payload --engine parse+extract--> spans
        ==  structure --spec mapping (this module)--> expected spans

Shared knowledge between the two sides is only the CONTRACT (e.g. how a
table renders as canonical markdown — reference excel_processor.py:150-180;
how the DOCX row cap truncates — docx_processor.py:140-148). The paged
populations (page-src payloads) are excluded: their output threads through
the configured layout backend, so they stay under the pytest span-equality
gate (tests/test_pipeline.py) and the rows-only driver check.

Scale note: fixture generation is a pure per-index function (same property
as synth.gen_doc), so at real scale it would fan out with the same
``ray.data.range(n).map_batches`` shape as the corpus itself; at sandbox
sizes (n ≤ 2000) it runs inline in ~2 s once per corpus size and is cached
on disk.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from docstrange_ray.synth import gen_doc_full

# Populations whose extracted output is closed-form from the generator
# structure (everything except the backend-dependent paged populations).
ORACLEABLE_POPS = frozenset(
    {
        "html_page",
        "plain_text",
        "markdown_doc",
        "tabular",
        "docx_doc",
        "pptx_doc",
        "xlsx_doc",
    }
)

FIXTURE_DIR = "/tmp/dsray_expected_v1"
TABLE_ROW_CAP = 20  # contract: reference docx_processor.py:140-148

# --- independent renderers (contract re-derivations, NOT imports) -----------


def _md_table(grid: list[list[str]]) -> str:
    """Canonical markdown table per the serializer contract
    (excel_processor.py:150-180): header row, all-``---`` separator at the
    max row width, short rows padded with '', pipes escaped."""
    if not grid:
        return ""
    width = max(len(r) for r in grid)

    def line(row: list[str]) -> str:
        cells = [("" if c is None else str(c)).replace("|", "\\|") for c in row]
        cells += [""] * (width - len(cells))
        return "| " + " | ".join(cells) + " |"

    out = [line(grid[0]), "| " + " | ".join(["---"] * width) + " |"]
    out.extend(line(r) for r in grid[1:])
    return "\n".join(out)


def _capped_table(grid: list[list[str]]) -> list[tuple]:
    """Table span(s) with the row-cap contract: > TABLE_ROW_CAP data rows
    truncate and append a notice text span."""
    if not grid:
        return []
    n_data = len(grid) - 1
    spans = [("table", _md_table(grid[: TABLE_ROW_CAP + 1]), "")]
    if n_data > TABLE_ROW_CAP:
        spans.append(("text", f"... ({n_data - TABLE_ROW_CAP} more rows truncated)", ""))
    return spans


def expected_spans(pop: str, struct: dict, doc_id: str) -> list[dict]:
    """Map one document's generation structure to its expected extracted
    span sequence (kind, text, media_ref, offset)."""
    out: list[tuple] = []
    if pop == "plain_text":
        # TXT contract: one text span per blank-line paragraph, trailing
        # whitespace trimmed (txt_processor.py:80-105)
        out = [("text", p, "") for p in struct["paras"]]
    elif pop == "markdown_doc":
        for b in struct["blocks"]:
            tag = b[0]
            if tag == "heading":
                out.append(("heading", b[1], ""))
            elif tag == "p":
                out.append(("text", b[1], ""))
            elif tag == "list":
                out.extend(("list_item", item, "") for item in b[1])
            elif tag == "code":
                out.append(("code", b[1], ""))
            elif tag == "table":
                out.append(("table", b[1], ""))
            elif tag == "quote":
                out.append(("blockquote", b[1], ""))
            elif tag == "img":
                out.append(("image-ref", b[1], b[2]))
    elif pop == "html_page":
        # <title> → '#' H1 (url_processor.py:258-262); nav/header/footer and
        # the link-farm box are boilerplate-pruned so never enter the spec
        out.append(("heading", f"# {struct['title']}", ""))
        for b in struct["blocks"]:
            tag = b[0]
            if tag == "h1":
                out.append(("heading", f"# {b[1]}", ""))
            elif tag == "h2":
                out.append(("heading", f"## {b[1]}", ""))
            elif tag == "p":
                out.append(("text", b[1], ""))
            elif tag == "ul":
                out.extend(("list_item", f"- {item}", "") for item in b[1])
            elif tag == "table":
                out.append(("table", _md_table(b[1]), ""))
            elif tag == "img":
                out.append(("image-ref", b[1], b[2]))
    elif pop == "tabular":
        out.append(("heading", f"# CSV Data: {doc_id}.t1", ""))
        out.extend(_capped_table(struct["grid"]))
    elif pop == "docx_doc":
        for p in struct["paras"]:
            text, style = p["text"], p["style"]
            if style == "Title":
                out.append(("heading", f"# {text}", ""))
            elif style.startswith("Heading "):
                level = int(style.split()[1])
                out.append(("heading", "#" * level + " " + text, ""))
            elif style.startswith("List"):
                out.append(("list_item", f"- {text}", ""))
            else:
                out.append(("text", text, ""))
        for grid in struct["tables"]:
            out.extend(_capped_table(grid))
    elif pop == "pptx_doc":
        for i, slide in enumerate(struct["slides"], start=1):
            out.append(("heading", f"## Slide {i}", ""))
            out.extend(("text", t, "") for t in slide["texts"])
    elif pop == "xlsx_doc":
        out.append(("heading", f"# Excel Data: {doc_id}", ""))
        for sheet in struct["sheets"]:
            out.append(("heading", f"## Sheet: {sheet['name']}", ""))
            out.extend(_capped_table(sheet["grid"]))
    else:
        raise ValueError(f"population {pop!r} has no spec oracle")
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": j}
        for j, (k, t, m) in enumerate(out)
    ]


def expected_chunks(spans: list[dict], token_budget: int) -> list[dict]:
    """Independent re-derivation of the section-chunking contract
    (mcp_server_module/server.py:183-220): header-delimited sections,
    len//4 token estimate, greedy packing, oversize section = own chunk."""
    sections: list[tuple[str, str]] = []
    title, parts = "", []
    for s in spans:
        if s["kind"] == "heading":
            if parts or title:
                sections.append((title, "\n\n".join(p for p in parts if p)))
            title = s["text"]
            parts = [title]
        elif s["kind"] == "image-ref":
            parts.append(f"![{s['text']}]({s['media_ref']})")
        else:
            parts.append(s["text"])
    if parts or title:
        sections.append((title, "\n\n".join(p for p in parts if p)))

    chunks: list[dict] = []
    buf: list[tuple[str, str]] = []
    buf_tokens = 0
    for sec_title, sec_text in sections:
        t = max(1, len(sec_text) // 4)
        if buf and buf_tokens + t > token_budget:
            chunks.append((buf, buf_tokens))
            buf, buf_tokens = [], 0
        buf.append((sec_title, sec_text))
        buf_tokens += t
    if buf:
        chunks.append((buf, buf_tokens))
    return [
        {
            "chunk_id": ci,
            "n_sections": len(b),
            "n_tokens_est": toks,
            "first_section": b[0][0],
            "text": "\n\n".join(t for _, t in b),
        }
        for ci, (b, toks) in enumerate(chunks)
    ]


# --- fixture writer ---------------------------------------------------------

_SPANS_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("offset", pa.int64()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

_CHUNKS_FIXTURE_SCHEMA = pa.schema(
    [
        ("n", pa.int64()),
        ("doc_id", pa.string()),
        ("chunk_id", pa.int64()),
        ("n_sections", pa.int64()),
        ("n_tokens_est", pa.int64()),
        ("first_section", pa.string()),
        ("text", pa.string()),
    ]
)


def write_expected_fixtures(
    n: int, seed: int = 42, token_budget: int = 512, out_dir: str = FIXTURE_DIR
) -> tuple[str, str]:
    """Write the expected flat-span and chunk fixtures for corpus size ``n``
    (idempotent: atomic rename, skipped if present). Each file carries a
    constant ``n`` column so one DuckDB glob + filter serves every corpus
    size."""
    os.makedirs(out_dir, exist_ok=True)
    spans_path = os.path.join(out_dir, f"spans_n{n}_s{seed}.parquet")
    chunks_path = os.path.join(out_dir, f"chunks_n{n}_s{seed}_b{token_budget}.parquet")
    if os.path.exists(spans_path) and os.path.exists(chunks_path):
        return spans_path, chunks_path
    span_rows: list[dict] = []
    chunk_rows: list[dict] = []
    for i in range(n):
        row, pop, struct = gen_doc_full(seed, i)
        if pop not in ORACLEABLE_POPS or struct is None:
            continue
        spans = expected_spans(pop, struct, row["doc_id"])
        span_rows.extend({"n": n, "doc_id": row["doc_id"], **s} for s in spans)
        chunk_rows.extend(
            {"n": n, "doc_id": row["doc_id"], **c}
            for c in expected_chunks(spans, token_budget)
        )
    for path, rows, schema in (
        (spans_path, span_rows, _SPANS_FIXTURE_SCHEMA),
        (chunks_path, chunk_rows, _CHUNKS_FIXTURE_SCHEMA),
    ):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, path)
    return spans_path, chunks_path


def oracleable_doc_ids(n: int, seed: int = 42) -> set[str]:
    """doc_ids of the spec-oracle subset (population is the first rng draw,
    so this costs one random() per index — no document generation)."""
    from docstrange_ray.synth import population_of

    return {
        f"doc-{i:08d}"
        for i in range(n)
        if population_of(seed, i) in ORACLEABLE_POPS
    }
