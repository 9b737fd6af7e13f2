"""Unit tests for the reference-faithful extraction kernels (the §2
heuristics with citations in each docstring)."""

import json

from docstrange_ray.config import DEFAULT
from docstrange_ray.extract.cleaners import (
    clean_whitespace,
    ocr_postprocess,
    smart_join,
    trim_text,
)
from docstrange_ray.extract.classify import classify_block, heading_level_by_words
from docstrange_ray.extract.html_extract import html_to_spans
from docstrange_ray.extract.markdown_extract import markdown_to_spans
from docstrange_ray.extract.page_extract import page_to_spans
from docstrange_ray.extract.table_extract import grid_to_markdown, table_src_to_spans
from docstrange_ray.extract.text_extract import decode_bytes, text_to_spans


class TestCleaners:
    def test_trim_text(self):
        assert trim_text("a  \n\n\n\n\nb\n\n") == "a\n\nb"

    def test_clean_whitespace(self):
        assert clean_whitespace("a   b\t c\n\n  d ") == "a b c\nd"

    def test_ocr_postprocess_lossy_subs(self):
        # reference layout_detector.py:175-177 (deliberately lossy)
        assert ocr_postprocess("a|b 10") == "aIb lo"

    def test_ocr_sentence_spacing(self):
        assert ocr_postprocess("End.Next") == "End. Next"

    def test_smart_join(self):
        assert smart_join(["Hello", ",", "world", "!"]) == "Hello, world!"
        assert smart_join(["(", "a", ")"]) == "(a)"
        assert smart_join(["multi-", "line"]) == "multi-line"

    def test_decode_bytes_fallback(self):
        assert decode_bytes("café".encode("latin-1")) == "café"


class TestClassify:
    def test_heading_short_upper(self):
        assert classify_block("SECTION ONE") == "heading"

    def test_heading_short_period(self):
        assert classify_block("The end.") == "heading"

    def test_list_items(self):
        assert classify_block("1. first thing here") == "list_item"
        assert classify_block("- bullet point") == "list_item"
        assert classify_block("a. lettered item") == "list_item"

    def test_table_row(self):
        assert classify_block("alpha | beta | gamma | delta") == "table_row"
        assert classify_block("a  b  c  d with more words") == "table_row"

    def test_plain_text(self):
        assert classify_block("This is a normal sentence with several words") == "text"

    def test_reference_check_order_list_before_heading(self):
        # reference checks list -> table -> heading
        # (_classify_paragraph, layout_detector.py:188-203): a short
        # all-caps bullet is a LIST item, not a heading
        assert classify_block("• DONE") == "list_item"
        assert classify_block("1. Done.") == "list_item"

    def test_pipe_row_has_no_word_count_gate(self):
        # _is_table_row (layout_detector.py:224-237): '|' or tab anywhere
        # -> table row, regardless of word count
        assert classify_block("A | B") == "table_row"
        assert classify_block("x\ty") == "table_row"
        # the >=4-word gate applies only to the double-space rule
        assert classify_block("a  b") == "text"

    def test_heading_levels(self):
        # reference layout_detector.py:206-216
        assert heading_level_by_words("One Two") == 1
        assert heading_level_by_words("one two three four") == 2
        assert heading_level_by_words("one two three four five six") == 3


class TestTables:
    def test_grid_to_markdown_pads_ragged(self):
        md = grid_to_markdown([["a", "b"], ["1"]])
        assert md.split("\n")[2] == "| 1 |  |"

    def test_row_cap_truncation(self):
        # reference docx_processor.py:140-148
        payload = "\n".join(
            ["h1,h2"] + [f"r{i},v{i}" for i in range(DEFAULT.table_row_cap + 5)]
        )
        spans = table_src_to_spans(payload, name="t")
        assert spans[0]["kind"] == "heading"
        table = spans[1]["text"]
        assert table.count("\n") == DEFAULT.table_row_cap + 1  # header+sep+cap rows
        assert spans[2]["text"] == "... (5 more rows truncated)"

    def test_pipe_escape(self):
        assert "\\|" in grid_to_markdown([["a|b"]])


class TestMarkdown:
    SAMPLE = "\n".join(
        [
            "# Title",
            "",
            "Intro paragraph",
            "spanning two lines.",
            "",
            "## Sub",
            "- item one",
            "- item two",
            "",
            "```python",
            "x = 1",
            "```",
            "",
            "| a | b |",
            "| --- | --- |",
            "| 1 | 2 |",
            "",
            "![alt text](media://d/0)",
            "",
            "> quoted line",
        ]
    )

    def test_full_parse(self):
        spans = markdown_to_spans(self.SAMPLE)
        kinds = [s["kind"] for s in spans]
        assert kinds == [
            "heading",
            "text",
            "heading",
            "list_item",
            "list_item",
            "code",
            "table",
            "image-ref",
            "blockquote",
        ]
        assert spans[0]["text"] == "# Title"
        assert spans[1]["text"] == "Intro paragraph spanning two lines."
        assert spans[5]["text"] == "```python\nx = 1\n```"
        assert spans[7]["media_ref"] == "media://d/0"
        assert spans[8]["text"] == "> quoted line"


class TestHtml:
    PAGE = """
    <html><head><title>Page Title</title><style>x{}</style>
    <script>bad()</script></head>
    <body>
      <nav><a href="/1">n1</a><a href="/2">n2</a><a href="/3">n3</a></nav>
      <main>
        <h1>Main Heading</h1>
        <p>First <strong>bold</strong> paragraph.</p>
        <ul><li>one</li><li>two</li></ul>
        <table><tr><th>h</th></tr><tr><td>v</td></tr></table>
        <img src="media://x/0" alt="pic">
        <div class="related"><a href="/r1">x</a> <a href="/r2">y</a> <a href="/r3">z</a></div>
      </main>
      <footer><p>copyright</p></footer>
    </body></html>
    """

    def test_boilerplate_stripped(self):
        spans = html_to_spans(self.PAGE)
        text = " ".join(s["text"] for s in spans)
        assert "bad()" not in text
        assert "n1" not in text  # nav outside main
        assert "copyright" not in text  # footer
        assert "/r1" not in text  # link-farm div pruned by link density

    def test_structure(self):
        spans = html_to_spans(self.PAGE)
        kinds = [s["kind"] for s in spans]
        assert kinds == [
            "heading",  # title
            "heading",  # h1
            "text",
            "list_item",
            "list_item",
            "table",
            "image-ref",
        ]
        assert spans[0]["text"] == "# Page Title"
        assert spans[1]["text"] == "# Main Heading"
        assert "**bold**" in spans[2]["text"]
        assert spans[6]["media_ref"] == "media://x/0"

    def test_main_selection_fallback_to_body(self):
        spans = html_to_spans("<html><body><p>just text</p></body></html>")
        assert spans == [{"kind": "text", "text": "just text", "media_ref": ""}]


class TestPage:
    def test_direct_text_path(self):
        # reference pdf_processor.py:97 (>50 chars skips OCR)
        payload = json.dumps(
            {"embedded_text": "x" * 60, "blocks": [{"text": "IGNORED", "y": 0}]}
        )
        spans = page_to_spans(payload, 3)
        assert spans[0]["text"] == "## Page 3"
        assert spans[1]["text"] == "x" * 60
        assert all("IGNORED" not in s["text"] for s in spans)

    def test_confidence_floor(self):
        payload = json.dumps(
            {
                "blocks": [
                    {"text": "kept block of words here", "y": 10, "h": 10, "conf": 0.9},
                    {"text": "dropped words entirely", "y": 30, "h": 10, "conf": 0.4},
                ]
            }
        )
        spans = page_to_spans(payload, 1)
        joined = " ".join(s["text"] for s in spans)
        assert "kept" in joined and "dropped" not in joined

    def test_reading_order_and_grouping(self):
        payload = json.dumps(
            {
                "blocks": [
                    {"text": "second line words here", "y": 22, "h": 10, "conf": 0.9},
                    {"text": "first line words here", "y": 10, "h": 10, "conf": 0.9},
                    {"text": "far away paragraph text", "y": 300, "h": 10, "conf": 0.9},
                ]
            }
        )
        spans = page_to_spans(payload, 1)
        # blocks 1+2 merge (gap < 1.5*avg_h), block 3 separate
        assert len(spans) == 3
        assert spans[1]["text"].startswith("first line")
        assert "second line" in spans[1]["text"]
        assert spans[2]["text"].startswith("far away")

    def test_table_rows_merge(self):
        payload = json.dumps(
            {
                "blocks": [
                    {"text": "a | b | c | d", "y": 10, "h": 10, "conf": 0.9},
                    {"text": "e | f | g | h", "y": 22, "h": 10, "conf": 0.9},
                ]
            }
        )
        spans = page_to_spans(payload, 1)
        assert spans[1]["kind"] == "table"
        assert "| a | b | c | d |" in spans[1]["text"]


class TestOfficeExtract:
    """DOCX/PPTX/XLSX payload semantics (SURVEY.md S4-S9)."""

    def test_docx_styles_and_cap(self):
        import json

        from docstrange_ray.extract.office_extract import docx_src_to_spans

        payload = json.dumps(
            {
                "paragraphs": [
                    {"text": "My Doc", "style": "Title"},
                    {"text": "Intro", "style": "Heading 2"},
                    {"text": "Body   text", "style": "Normal"},
                    {"text": "item one", "style": "List Bullet"},
                    {"text": "", "style": "Normal"},
                ],
                "tables": [[["h"]] + [[str(i)] for i in range(25)]],
            }
        )
        spans = docx_src_to_spans(payload)
        kinds = [s["kind"] for s in spans]
        assert kinds == ["heading", "heading", "text", "list_item", "table", "text"]
        assert spans[0]["text"] == "# My Doc"
        assert spans[1]["text"] == "## Intro"
        assert spans[2]["text"] == "Body text"  # whitespace cleaned
        assert spans[3]["text"] == "- item one"
        # 20-row cap + truncation notice (docx_processor.py:140-148)
        assert spans[4]["text"].count("\n") == 21  # header + sep + 20 rows
        assert "5 more rows truncated" in spans[5]["text"]

    def test_pptx_slides(self):
        import json

        from docstrange_ray.extract.office_extract import pptx_src_to_spans

        payload = json.dumps(
            {"slides": [{"texts": ["a", ""]}, {"texts": ["b", "c"]}]}
        )
        spans = pptx_src_to_spans(payload)
        assert [s["text"] for s in spans] == ["## Slide 1", "a", "## Slide 2", "b", "c"]

    def test_xlsx_sheets(self):
        import json

        from docstrange_ray.extract.office_extract import xlsx_src_to_spans

        payload = json.dumps(
            {"sheets": [{"name": "S1", "grid": [["h1", "h2"], ["a", ""]]}]}
        )
        spans = xlsx_src_to_spans(payload, name="doc-1")
        assert spans[0]["text"] == "# Excel Data: doc-1"
        assert spans[1]["text"] == "## Sheet: S1"
        assert spans[2]["kind"] == "table"
        assert "| a |  |" in spans[2]["text"]

    def test_bad_json_payloads(self):
        from docstrange_ray.extract.office_extract import (
            docx_src_to_spans,
            pptx_src_to_spans,
            xlsx_src_to_spans,
        )

        assert docx_src_to_spans("{not json") == []
        assert pptx_src_to_spans("") == []
        assert xlsx_src_to_spans("null", name="x") == []


class TestTextDensityPruning:
    def test_tag_dense_text_sparse_container_pruned(self):
        from docstrange_ray.extract.html_extract import html_to_spans

        icons = "".join(f'<span class="ico"><i>{c}</i></span>' for c in "abcde")
        html = (
            "<html><body><main>"
            "<p>Real paragraph content with enough words to keep.</p>"
            f'<div class="toolbar">{icons}</div>'
            "</main></body></html>"
        )
        spans = html_to_spans(html)
        text = " ".join(s["text"] for s in spans)
        assert "Real paragraph content" in text
        # the icon bar (10 elements, 5 chars total) is pruned
        assert "a b c d e" not in text and "abcde" not in text

    def test_normal_list_not_pruned(self):
        from docstrange_ray.extract.html_extract import html_to_spans

        html = (
            "<html><body><main><ul>"
            + "".join(f"<li>meaningful list item number {i}</li>" for i in range(6))
            + "</ul></main></body></html>"
        )
        spans = html_to_spans(html)
        assert sum(1 for s in spans if s["kind"] == "list_item") == 6


class TestJsonRepair:
    """M18: the reference's JSON-repair ladder
    (gpu_processor.py:176-189)."""

    def test_valid_passthrough(self):
        from docstrange_ray.extract.cleaners import repair_json

        assert repair_json('{"a": 1}') == {"a": 1}

    def test_bare_keys_and_single_quotes(self):
        from docstrange_ray.extract.cleaners import repair_json

        assert repair_json("{name: 'x', count: 2}") == {"name": "x", "count": 2}

    def test_unsalvageable_falls_back_to_raw(self):
        from docstrange_ray.extract.cleaners import repair_json

        out = repair_json("totally not json {{{")
        assert out == {"raw_text": "totally not json {{{"}
        assert repair_json(None) == {"raw_text": None}
