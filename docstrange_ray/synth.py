"""Deterministic synthetic interleaved-document corpus generator.

The sandbox stand-in for the 10^12-document Lance corpus: documents mix
text spans and media-ref spans in source order (FIXTURES.md §1) across
the seeded population mix of FIXTURES.md §3:

    html_page 35% | plain_text 20% | markdown_doc 15% | tabular 10%
    | paged_doc 15% | giant_doc 5%

Determinism: document ``i`` is a pure function of ``(seed, i)`` — no
global RNG state — so generation is order-independent and can be fanned
out with ``ray.data.range(n).map_batches(...)`` at any parallelism and
still produce the identical corpus (the property a 10^12-row generator
must have).
"""

from __future__ import annotations

import json
import random

import pyarrow as pa

from docstrange_ray.schema import DOCUMENTS_SCHEMA

_WORDS = (
    "data stream table query batch shuffle partition actor block arrow "
    "schema column vector index merge sort scan filter join group window "
    "page layout span text heading media image token model worker node "
    "cluster memory object store spill lineage manifest resume checkpoint "
    "cost skew throughput latency pipeline stage source sink format parse "
    "extract markdown html document corpus sample train evaluate deploy"
).split()

_POPULATIONS = (
    ("html_page", 0.28),
    ("plain_text", 0.15),
    ("markdown_doc", 0.12),
    ("tabular", 0.08),
    ("docx_doc", 0.08),
    ("pptx_doc", 0.05),
    ("xlsx_doc", 0.06),
    ("paged_doc", 0.13),
    ("giant_doc", 0.05),
)

GIANT_PAGE_RANGE = (120, 300)  # FIXTURES.md says 200-500; capped for sandbox I/O
PAGED_PAGE_RANGE = (1, 12)


def _sentence(rng: random.Random, lo: int = 4, hi: int = 12) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random, n_sent: int | None = None) -> str:
    n = n_sent or rng.randint(2, 5)
    return " ".join(_sentence(rng) for _ in range(n))


def _pick_population(rng: random.Random) -> str:
    x = rng.random()
    acc = 0.0
    for name, share in _POPULATIONS:
        acc += share
        if x < acc:
            return name
    return _POPULATIONS[-1][0]


# --- population generators --------------------------------------------------


def _gen_html(rng: random.Random, doc_id: str) -> tuple[list[dict], dict]:
    """Returns (payload spans, generation structure). The structure records
    the pre-serialization content blocks — the closed-form ground truth the
    spec oracle (synth_expected) maps to expected extracted spans. RNG draw
    order is IDENTICAL to the original generator (corpus bytes pinned by
    tests/test_synth_expected.py::test_corpus_hash_unchanged)."""
    title = _sentence(rng, 2, 5).rstrip(".")
    nav_links = "".join(
        f'<a href="/nav/{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
        for i in range(rng.randint(3, 6))
    )
    h1 = _sentence(rng, 2, 4).rstrip(".")
    body_parts = [f"<h1>{h1}</h1>"]
    blocks: list[tuple] = [("h1", h1)]
    for _ in range(rng.randint(2, 5)):
        r = rng.random()
        if r < 0.5:
            p = _paragraph(rng)
            body_parts.append(f"<p>{p}</p>")
            blocks.append(("p", p))
        elif r < 0.65:
            h2 = _sentence(rng, 2, 4).rstrip(".")
            body_parts.append(f"<h2>{h2}</h2>")
            blocks.append(("h2", h2))
        elif r < 0.78:
            n_items = rng.randint(2, 5)
            item_texts = [_sentence(rng, 2, 6) for _ in range(n_items)]
            items = "".join(f"<li>{t}</li>" for t in item_texts)
            body_parts.append(f"<ul>{items}</ul>")
            blocks.append(("ul", item_texts))
        elif r < 0.9:
            n_rows = rng.randint(2, 4)
            cells = [[rng.choice(_WORDS) for _ in range(3)] for _ in range(n_rows)]
            rows = "".join(
                "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                for row in cells
            )
            body_parts.append(
                "<table><tr><th>a</th><th>b</th><th>c</th></tr>" + rows + "</table>"
            )
            blocks.append(("table", [["a", "b", "c"]] + cells))
        else:
            ref_i = rng.randint(0, 9)
            alt = rng.choice(_WORDS)
            body_parts.append(f'<img src="media://{doc_id}/h{ref_i}" alt="{alt}">')
            blocks.append(("img", alt, f"media://{doc_id}/h{ref_i}"))
    # a link-farm box inside main that link-density pruning must drop
    # (deliberately absent from the structure: the spec says it is pruned)
    if rng.random() < 0.5:
        farm = "".join(f'<a href="/rel/{i}">{rng.choice(_WORDS)}</a> ' for i in range(5))
        body_parts.append(f'<div class="related">{farm}</div>')
    html = (
        "<html><head><title>"
        + title
        + "</title><style>body{color:#000}</style>"
        + "<script>var x=1;</script></head><body>"
        + f"<nav>{nav_links}</nav><header><p>site banner</p></header>"
        + '<main>'
        + "".join(body_parts)
        + "</main>"
        + f"<footer><p>copyright</p>{nav_links}</footer></body></html>"
    )
    struct = {"title": title, "blocks": blocks}
    return [{"kind": "html", "text": html, "media_ref": "", "offset": 0}], struct


def _gen_text(rng: random.Random) -> tuple[list[dict], dict]:
    paras = [_paragraph(rng) for _ in range(rng.randint(2, 6))]
    blanks = "\n" * rng.randint(2, 4)
    payload = "\n" + blanks.join(p + ("  " if rng.random() < 0.3 else "") for p in paras) + "\n\n"
    return (
        [{"kind": "text", "text": payload, "media_ref": "", "offset": 0}],
        {"paras": paras},
    )


def _gen_markdown(rng: random.Random, doc_id: str) -> tuple[list[dict], dict]:
    h1 = _sentence(rng, 2, 4).rstrip(".")
    parts = [f"# {h1}"]
    blocks: list[tuple] = [("heading", f"# {h1}")]
    for _ in range(rng.randint(3, 6)):
        r = rng.random()
        if r < 0.35:
            p = _paragraph(rng)
            parts.append(p)
            blocks.append(("p", p))
        elif r < 0.5:
            level = rng.randint(2, 3)
            h = _sentence(rng, 2, 4).rstrip(".")
            parts.append(f"{'#' * level} {h}")
            blocks.append(("heading", f"{'#' * level} {h}"))
        elif r < 0.62:
            n_items = rng.randint(2, 4)
            item_texts = [f"- {_sentence(rng, 2, 6)}" for _ in range(n_items)]
            parts.append("\n".join(item_texts))
            blocks.append(("list", item_texts))
        elif r < 0.72:
            code = (
                "```python\n"
                + "\n".join(f"x{i} = {i}" for i in range(rng.randint(2, 5)))
                + "\n```"
            )
            parts.append(code)
            blocks.append(("code", code))
        elif r < 0.82:
            hdr = "| col1 | col2 | col3 |"
            sep = "| --- | --- | --- |"
            n_rows = rng.randint(2, 4)
            row_lines = [
                "| " + " | ".join(rng.choice(_WORDS) for _ in range(3)) + " |"
                for _ in range(n_rows)
            ]
            rows = "\n".join(row_lines)
            parts.append(f"{hdr}\n{sep}\n{rows}")
            blocks.append(("table", f"{hdr}\n{sep}\n{rows}"))
        elif r < 0.92:
            q = f"> {_sentence(rng)}"
            parts.append(q)
            blocks.append(("quote", q))
        else:
            alt = rng.choice(_WORDS)
            parts.append(f"![{alt}](media://{doc_id}/m0)")
            blocks.append(("img", alt, f"media://{doc_id}/m0"))
    return (
        [{"kind": "md", "text": "\n\n".join(parts), "media_ref": "", "offset": 0}],
        {"blocks": blocks},
    )


def _gen_tabular(rng: random.Random) -> tuple[list[dict], dict]:
    n_cols = rng.randint(3, 8)
    n_rows = rng.randint(2, 40)
    header_cells = [f"col{i}" for i in range(n_cols)]
    grid = [header_cells]
    rows = [",".join(header_cells)]
    for _ in range(n_rows):
        cells = [
            "" if rng.random() < 0.05 else rng.choice(_WORDS) for _ in range(n_cols)
        ]
        grid.append(cells)
        rows.append(",".join(cells))
    return (
        [{"kind": "table-src", "text": "\n".join(rows), "media_ref": "", "offset": 0}],
        {"grid": grid},
    )


def _gen_docx(rng: random.Random) -> list[dict]:
    paras = [{"text": _sentence(rng, 2, 4).rstrip("."), "style": "Title"}]
    for _ in range(rng.randint(3, 8)):
        r = rng.random()
        if r < 0.2:
            paras.append(
                {
                    "text": _sentence(rng, 2, 4).rstrip("."),
                    "style": f"Heading {rng.randint(1, 3)}",
                }
            )
        elif r < 0.35:
            for _ in range(rng.randint(2, 4)):
                paras.append({"text": _sentence(rng, 2, 6), "style": "List Bullet"})
        else:
            paras.append({"text": _paragraph(rng), "style": "Normal"})
    tables = []
    if rng.random() < 0.6:
        n_rows = rng.randint(2, 30)  # sometimes crosses the 20-row cap
        tables.append(
            [[f"h{i}" for i in range(3)]]
            + [[rng.choice(_WORDS) for _ in range(3)] for _ in range(n_rows)]
        )
    payload = json.dumps({"paragraphs": paras, "tables": tables})
    return (
        [{"kind": "docx-src", "text": payload, "media_ref": "", "offset": 0}],
        {"paras": paras, "tables": tables},
    )


def _gen_pptx(rng: random.Random) -> list[dict]:
    slides = [
        {"texts": [_sentence(rng, 2, 5) for _ in range(rng.randint(1, 4))]}
        for _ in range(rng.randint(2, 8))
    ]
    payload = json.dumps({"slides": slides})
    return (
        [{"kind": "pptx-src", "text": payload, "media_ref": "", "offset": 0}],
        {"slides": slides},
    )


def _gen_xlsx(rng: random.Random) -> list[dict]:
    sheets = []
    for s in range(rng.randint(1, 3)):
        n_cols = rng.randint(2, 6)
        n_rows = rng.randint(2, 28)
        grid = [[f"c{i}" for i in range(n_cols)]] + [
            ["" if rng.random() < 0.05 else rng.choice(_WORDS) for _ in range(n_cols)]
            for _ in range(n_rows)
        ]
        sheets.append({"name": f"Sheet{s + 1}", "grid": grid})
    payload = json.dumps({"sheets": sheets})
    return (
        [{"kind": "xlsx-src", "text": payload, "media_ref": "", "offset": 0}],
        {"sheets": sheets},
    )


def _gen_page_payload(rng: random.Random) -> str:
    # 15% digital pages exercise the direct-text threshold (pdf_processor.py:97)
    if rng.random() < 0.15:
        return json.dumps(
            {"embedded_text": _paragraph(rng, rng.randint(2, 4)), "blocks": []}
        )
    blocks = []
    y = 20.0
    for _ in range(rng.randint(4, 14)):
        r = rng.random()
        if r < 0.12:
            text = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 3))).upper()
        elif r < 0.2:
            text = f"{rng.randint(1, 9)}. {_sentence(rng, 2, 5)}"
        elif r < 0.28:
            text = " | ".join(rng.choice(_WORDS) for _ in range(4))
        else:
            text = _sentence(rng, 5, 14)
        h = rng.uniform(10, 24)
        block = {
            "x": round(rng.uniform(10, 80), 1),
            "y": round(y, 1),
            "w": round(rng.uniform(100, 500), 1),
            "h": round(h, 1),
            # ~10% of blocks fall below the 0.5 confidence floor (M19)
            "conf": round(rng.uniform(0.35, 0.5), 3)
            if rng.random() < 0.1
            else round(rng.uniform(0.55, 0.99), 3),
        }
        if rng.random() < 0.2:
            # OCR word boxes instead of joined text: exercises the smart
            # word join (M9 — punctuation, brackets, hyphen joins)
            words = text.replace(".", "").split()
            decorated = []
            for w in words:
                r2 = rng.random()
                if r2 < 0.08:
                    decorated += ["(", w, ")"]
                elif r2 < 0.16:
                    decorated += [w, ","]
                elif r2 < 0.2 and len(w) > 4:
                    decorated += [w[:2] + "-", w[2:]]
                else:
                    decorated.append(w)
            block["words"] = decorated
        else:
            block["text"] = text
        blocks.append(block)
        y += h + rng.uniform(2, 40)
    return json.dumps({"embedded_text": "", "blocks": blocks})


def _gen_paged(rng: random.Random, doc_id: str, giant: bool) -> list[dict]:
    lo, hi = GIANT_PAGE_RANGE if giant else PAGED_PAGE_RANGE
    n_pages = rng.randint(lo, hi)
    spans = []
    offset = 0
    for p in range(n_pages):
        spans.append(
            {"kind": "page-src", "text": _gen_page_payload(rng), "media_ref": "", "offset": offset}
        )
        offset += 1
        if rng.random() < 0.15:
            spans.append(
                {
                    "kind": "image-ref",
                    "text": rng.choice(_WORDS),
                    "media_ref": f"media://{doc_id}/p{p}",
                    "offset": offset,
                }
            )
            offset += 1
    return spans


def gen_doc_full(seed: int, i: int) -> tuple[dict, str, dict | None]:
    """Generate document ``i`` plus its generation structure — pure function
    of (seed, i). Returns (row, population, structure); structure is None for
    the paged populations (their expected output is backend-dependent, so
    they stay under the pytest span-equality gate rather than the spec
    oracle)."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFF))
    doc_id = f"doc-{i:08d}"
    pop = _pick_population(rng)
    struct: dict | None
    if pop == "html_page":
        spans, struct = _gen_html(rng, doc_id)
    elif pop == "plain_text":
        spans, struct = _gen_text(rng)
    elif pop == "markdown_doc":
        spans, struct = _gen_markdown(rng, doc_id)
    elif pop == "tabular":
        spans, struct = _gen_tabular(rng)
    elif pop == "docx_doc":
        spans, struct = _gen_docx(rng)
    elif pop == "pptx_doc":
        spans, struct = _gen_pptx(rng)
    elif pop == "xlsx_doc":
        spans, struct = _gen_xlsx(rng)
    else:
        spans = _gen_paged(rng, doc_id, giant=(pop == "giant_doc"))
        struct = None
    for j, s in enumerate(spans):
        s["offset"] = j
    return {"doc_id": doc_id, "spans": spans}, pop, struct


def gen_doc(seed: int, i: int) -> dict:
    """Generate document ``i`` of the corpus — pure function of (seed, i)."""
    return gen_doc_full(seed, i)[0]


def population_of(seed: int, i: int) -> str:
    """Population of document ``i`` without generating it (the population
    pick is the FIRST rng draw — one random() call instead of a full doc)."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFF))
    return _pick_population(rng)


def gen_corpus_table(seed: int, start: int, count: int) -> pa.Table:
    """Arrow table of documents [start, start+count) — used per-batch by the
    distributed generator and directly by tests."""
    rows = [gen_doc(seed, i) for i in range(start, start + count)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def synth_dataset(n_docs: int, seed: int = 42, parallelism: int | None = None):
    """Distributed corpus generation: ``ray.data.range`` drives per-index
    generation so the corpus materializes as streaming Arrow blocks (never a
    driver-side list) — the 10^12-scale-safe shape."""
    import ray.data

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.Table.from_pylist(
            [gen_doc(seed, i) for i in ids], schema=DOCUMENTS_SCHEMA
        )

    ds = ray.data.range(n_docs, override_num_blocks=parallelism or max(8, n_docs // 500))
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=256)
