"""Projection tests: spans → markdown / JSON / HTML / CSV, mirroring the
reference's conversion-fixture style (tests/test_json_structure.py,
tests/test_html_generation.py) over typed spans."""

import ray.data

from docstrange_ray.extract.core import extract_document
from docstrange_ray.extract.markdown_extract import markdown_to_spans
from docstrange_ray.projections import (
    add_projection,
    parse_table_text,
    spans_to_csv,
    spans_to_html,
    spans_to_json,
    spans_to_markdown,
)
from docstrange_ray.synth import gen_corpus_table

SPANS = [
    {"kind": "heading", "text": "# Doc Title", "media_ref": "", "offset": 0},
    {"kind": "text", "text": "Opening paragraph.", "media_ref": "", "offset": 1},
    {"kind": "heading", "text": "## Section A", "media_ref": "", "offset": 2},
    {"kind": "list_item", "text": "- first", "media_ref": "", "offset": 3},
    {"kind": "list_item", "text": "- second", "media_ref": "", "offset": 4},
    {"kind": "table", "text": "| a | b |\n| --- | --- |\n| 1 | 2 |", "media_ref": "", "offset": 5},
    {"kind": "code", "text": "```python\nx = 1\n```", "media_ref": "", "offset": 6},
    {"kind": "image-ref", "text": "pic", "media_ref": "media://d/0", "offset": 7},
    {"kind": "heading", "text": "## Section B", "media_ref": "", "offset": 8},
    {"kind": "blockquote", "text": "> a quote", "media_ref": "", "offset": 9},
]


def test_markdown_roundtrip():
    md = spans_to_markdown(SPANS)
    reparsed = markdown_to_spans(md)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in reparsed] == [
        (s["kind"], s["text"], s["media_ref"]) for s in SPANS
    ]


def test_json_tree_structure():
    doc = spans_to_json(SPANS)["document"]
    assert len(doc["sections"]) == 1
    root = doc["sections"][0]
    assert root["title"] == "Doc Title" and root["level"] == 1
    subs = root["subsections"]
    assert [s["title"] for s in subs] == ["Section A", "Section B"]
    a = subs[0]["content"]
    assert a["lists"] == ["- first", "- second"]
    assert a["tables"][0]["grid"] == [["a", "b"], ["1", "2"]]
    assert a["tables"][0]["num_rows"] == 2
    meta = doc["metadata"]
    assert meta["section_count"] == 3
    assert meta["max_heading_level"] == 2
    assert meta["has_tables"] and meta["has_code"] and meta["has_lists"] and meta["has_images"]


def test_html_rendering():
    html = spans_to_html(SPANS)
    assert "<h1>Doc Title</h1>" in html
    assert "<li>first</li>" in html
    assert "<th>a</th>" in html and "<td>1</td>" in html
    assert "<pre><code>x = 1</code></pre>" in html
    assert '<img src="media://d/0" alt="pic">' in html
    assert "<blockquote>a quote</blockquote>" in html


def test_html_escapes():
    html = spans_to_html([{"kind": "text", "text": "a < b & c", "media_ref": "", "offset": 0}])
    assert "a &lt; b &amp; c" in html


def test_csv_export():
    out = spans_to_csv(SPANS)
    assert out == "a,b\n1,2\n"
    two = SPANS + [
        {"kind": "table", "text": "| x |\n| --- |\n| 9 |", "media_ref": "", "offset": 10}
    ]
    out2 = spans_to_csv(two)
    assert "=== Table 1 ===" in out2 and "=== Table 2 ===" in out2


def test_table_text_unescapes_pipes():
    assert parse_table_text("| a\\|b |\n| --- |\n| v |") == [["a|b"], ["v"]]


def test_dataset_projection_matches_scalar():
    tbl = gen_corpus_table(42, 0, 20)
    ds = ray.data.from_arrow(tbl)
    from docstrange_ray.pipeline import extract_pipeline

    out = add_projection(extract_pipeline(ds, skew_threshold_units=None), "markdown")
    rows = {r["doc_id"]: r["markdown"] for r in out.take_all()}
    for r in tbl.to_pylist():
        exp = spans_to_markdown(extract_document(r)["spans"])
        assert rows[r["doc_id"]] == exp


class TestSectionChunks:
    """Greedy token-budget section packing (reference MCP chunking,
    mcp_server_module/server.py:183-220)."""

    SPANS = [
        {"kind": "heading", "text": "# A", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "x" * 400, "media_ref": "", "offset": 1},
        {"kind": "heading", "text": "# B", "media_ref": "", "offset": 2},
        {"kind": "text", "text": "y" * 400, "media_ref": "", "offset": 3},
        {"kind": "heading", "text": "# C", "media_ref": "", "offset": 4},
        {"kind": "text", "text": "z" * 4000, "media_ref": "", "offset": 5},
    ]

    def test_budget_packs_and_splits(self):
        from docstrange_ray.projections import spans_to_chunks

        # budget 250 tokens (= ~1000 chars): A+B pack together, C alone
        chunks = spans_to_chunks(self.SPANS, token_budget=250)
        assert [c["n_sections"] for c in chunks] == [2, 1]
        assert chunks[0]["first_section"] == "# A"
        assert chunks[1]["first_section"] == "# C"
        # oversize section still becomes its own chunk
        assert chunks[1]["n_tokens_est"] > 250

    def test_chunk_ids_sequential(self):
        from docstrange_ray.projections import spans_to_chunks

        chunks = spans_to_chunks(self.SPANS, token_budget=1)
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))

    def test_dataset_op(self, ray_session):
        import ray.data

        from docstrange_ray.projections import chunk_documents

        ds = ray.data.from_items(
            [{"doc_id": "d1", "spans": self.SPANS}, {"doc_id": "d2", "spans": []}]
        )
        rows = chunk_documents(ds, token_budget=250).take_all()
        assert {r["doc_id"] for r in rows} == {"d1"}
        assert len(rows) == 2


def test_search_documents(ray_session):
    import ray.data

    from docstrange_ray.projections import search_documents

    ds = ray.data.from_items(
        [
            {
                "doc_id": "d1",
                "spans": [
                    {"kind": "heading", "text": "# Title", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "before", "media_ref": "", "offset": 1},
                    {"kind": "text", "text": "the NEEDLE line", "media_ref": "", "offset": 2},
                    {"kind": "text", "text": "after", "media_ref": "", "offset": 3},
                ],
            },
            {"doc_id": "d2", "spans": []},
        ]
    )
    hits = search_documents(ds, "needle", context_lines=1).take_all()
    assert len(hits) == 1
    h = hits[0]
    assert h["doc_id"] == "d1"
    # markdown joins spans with blank lines: hit line is 5 (1-based)
    assert "NEEDLE" in h["snippet"] and "after" not in h["snippet"].split("\n")[0]


class TestContentTypeMatrix:
    """The reference's test_json_structure-style content matrix (every
    markdown construct in one document) driven through md extraction ->
    JSON tree, asserting structure like the reference does (section
    counts, titles, hierarchy, per-type buckets)."""

    SAMPLE = "\n".join(
        [
            "# Top Title",
            "",
            "Intro paragraph one.",
            "",
            "## Features",
            "",
            "- first item",
            "- second item",
            "",
            "1. numbered one",
            "",
            "### Details",
            "",
            "```python",
            "x = 1",
            "```",
            "",
            "| h1 | h2 |",
            "| --- | --- |",
            "| a | b |",
            "",
            "> a quoted line",
            "",
            "![logo](media://x/1)",
            "",
            "## Second Section",
            "",
            "Closing text.",
        ]
    )

    def _tree(self):
        from docstrange_ray.extract.markdown_extract import markdown_to_spans
        from docstrange_ray.extract.core import finalize_spans
        from docstrange_ray.projections import spans_to_json

        return spans_to_json(finalize_spans(markdown_to_spans(self.SAMPLE)))

    def test_section_structure(self):
        tree = self._tree()
        doc = tree["document"]
        assert doc["metadata"]["section_count"] == 4
        assert doc["metadata"]["max_heading_level"] == 3
        top = doc["sections"][0]
        assert top["title"] == "Top Title"
        titles = [s["title"] for s in top["subsections"]]
        assert titles == ["Features", "Second Section"]
        feats = top["subsections"][0]
        assert [s["title"] for s in feats["subsections"]] == ["Details"]

    def test_content_buckets(self):
        tree = self._tree()
        doc = tree["document"]
        feats = doc["sections"][0]["subsections"][0]
        assert len(feats["content"]["lists"]) == 3  # 2 bullets + 1 numbered
        details = feats["subsections"][0]
        assert len(details["content"]["code_blocks"]) == 1
        table = details["content"]["tables"][0]
        assert table["grid"] == [["h1", "h2"], ["a", "b"]]
        assert table["num_rows"] == 2 and table["num_cols"] == 2
        assert details["content"]["images"][0]["src"] == "media://x/1"
        meta = doc["metadata"]
        assert meta["has_tables"] and meta["has_code"] and meta["has_lists"] and meta["has_images"]

    def test_csv_and_html_from_same_spans(self):
        from docstrange_ray.extract.core import finalize_spans
        from docstrange_ray.extract.markdown_extract import markdown_to_spans
        from docstrange_ray.projections import spans_to_csv, spans_to_html

        spans = finalize_spans(markdown_to_spans(self.SAMPLE))
        csv_out = spans_to_csv(spans)
        assert "h1,h2" in csv_out and "a,b" in csv_out
        html_out = spans_to_html(spans)
        assert "<h1>Top Title</h1>" in html_out
        assert "<table>" in html_out and "<pre><code>" in html_out


class TestBlockquoteHr:
    """Golden coverage for the blockquote/hr span kinds (reference
    markdown surface: result.py:27 blockquote pattern, :370 hr pattern,
    :510-512 <hr> render, :304-312 JSON quote extraction)."""

    MD = "\n".join(
        [
            "# Doc",
            "",
            "intro text",
            "",
            "---",
            "",
            "> quoted one",
            "> quoted two",
            "",
            "closing",
        ]
    )

    def _spans(self):
        from docstrange_ray.extract.core import finalize_spans
        from docstrange_ray.extract.markdown_extract import markdown_to_spans

        return finalize_spans(markdown_to_spans(self.MD))

    def test_span_kinds(self):
        kinds = [s["kind"] for s in self._spans()]
        assert kinds == ["heading", "text", "hr", "blockquote", "text"]
        quote = self._spans()[3]
        assert quote["text"] == "> quoted one\n> quoted two"

    def test_markdown_round_trip_is_verbatim(self):
        from docstrange_ray.projections import spans_to_markdown

        md = spans_to_markdown(self._spans())
        assert "---" in md
        assert "> quoted one" in md

    def test_html_render(self):
        from docstrange_ray.projections import spans_to_html

        html = spans_to_html(self._spans())
        assert "<hr>" in html
        assert "<blockquote>quoted one\nquoted two</blockquote>" in html

    def test_json_blockquote_bucket(self):
        from docstrange_ray.projections import spans_to_json

        tree = spans_to_json(self._spans())
        sec = tree["document"]["sections"][0]
        assert sec["content"]["blockquotes"] == ["quoted one", "quoted two"]


def test_json_links_bucket():
    """Per-section links extraction (reference result.py:289-302)."""
    from docstrange_ray.extract.core import finalize_spans
    from docstrange_ray.extract.markdown_extract import markdown_to_spans
    from docstrange_ray.projections import spans_to_json

    md = "# Doc\n\nSee [the docs](https://x.test/d) and [more](https://y.test/m)."
    tree = spans_to_json(finalize_spans(markdown_to_spans(md)))
    sec = tree["document"]["sections"][0]
    assert sec["content"]["links"] == [
        {"text": "the docs", "url": "https://x.test/d"},
        {"text": "more", "url": "https://y.test/m"},
    ]
