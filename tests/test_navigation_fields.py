"""Round-2 coverage adds: MCP navigation projections (headers /
sections / summaries / hierarchy), schema-driven field extraction, URL
detection, and the page-backend seam."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docstrange_ray.extract.core import finalize_spans
from docstrange_ray.extract.markdown_extract import markdown_to_spans

MD = "\n".join(
    [
        "# Report",
        "",
        "Intro paragraph with some words.",
        "",
        "## Finances",
        "",
        "Total Amount: 1,250",
        "",
        "currency = USD",
        "",
        "| metric | value |",
        "| --- | --- |",
        "| revenue | 100 |",
        "| costs | 40 |",
        "",
        "## Appendix",
        "",
        "closing " * 120,
    ]
)

SPANS = finalize_spans(markdown_to_spans(MD))


def _ds():
    import ray.data

    from docstrange_ray.schema import DOCUMENTS_SCHEMA

    return ray.data.from_arrow(
        pa.Table.from_pylist([{"doc_id": "d1", "spans": SPANS}], schema=DOCUMENTS_SCHEMA)
    )


class TestParseSections:
    def test_section_bounds_and_tokens(self):
        from docstrange_ray.projections import parse_sections, spans_to_markdown

        secs = parse_sections(SPANS)
        assert [s["title"] for s in secs] == ["Report", "Finances", "Appendix"]
        assert [s["level"] for s in secs] == [1, 2, 2]
        lines = spans_to_markdown(SPANS).split("\n")
        # sections tile the document: each starts at its header line
        for s in secs:
            assert lines[s["start_line"]].lstrip("#").strip() == s["title"]
        assert all(s["token_count"] >= 1 for s in secs)

    def test_headerless_doc_is_one_section(self):
        from docstrange_ray.projections import parse_sections

        secs = parse_sections(
            finalize_spans([{"kind": "text", "text": "just prose", "media_ref": ""}])
        )
        assert len(secs) == 1
        assert secs[0]["title"] == "Document Content" and secs[0]["level"] == 0


@pytest.mark.usefixtures("ray_session")
class TestNavigationOps:
    def test_document_headers(self):
        from docstrange_ray.projections import document_headers

        rows = document_headers(_ds(), max_level=2).take_all()
        assert [(r["level"], r["title"]) for r in rows] == [
            (1, "Report"),
            (2, "Finances"),
            (2, "Appendix"),
        ]

    def test_get_section_by_title(self):
        from docstrange_ray.projections import document_sections

        rows = document_sections(_ds(), section_title="finances").take_all()
        assert len(rows) == 1
        assert "| revenue | 100 |" in rows[0]["content"]

    def test_section_summaries_truncate(self):
        from docstrange_ray.projections import section_summaries

        rows = {r["title"]: r for r in section_summaries(_ds(), max_length=200).take_all()}
        assert rows["Appendix"]["summary"].endswith("...")
        assert len(rows["Appendix"]["summary"]) == 203  # 200 + '...'
        assert not rows["Report"]["summary"].endswith("...")

    def test_hierarchical_structure(self):
        import json

        from docstrange_ray.projections import hierarchical_structure

        rows = hierarchical_structure(_ds()).take_all()
        assert len(rows) == 1
        tree = json.loads(rows[0]["structure"])
        assert tree[0]["title"] == "Report"
        assert [c["title"] for c in tree[0]["children"]] == ["Finances", "Appendix"]
        assert rows[0]["recommendation"] == "full_document"
        assert rows[0]["n_sections"] == 3


class TestFieldExtraction:
    def test_kv_lines_and_table_rows(self):
        from docstrange_ray.ops.fields import extract_fields_from_spans

        got = extract_fields_from_spans(
            SPANS, ["total_amount", "currency", "revenue", "costs", "missing"]
        )
        assert got["total_amount"] == "1,250"
        assert got["currency"] == "USD"
        assert got["revenue"] == "100"  # two-column table row
        assert got["costs"] == "40"
        assert got["missing"] is None

    def test_header_column_match(self):
        from docstrange_ray.ops.fields import extract_fields_from_spans

        spans = finalize_spans(
            markdown_to_spans(
                "| invoice_no | total |\n| --- | --- |\n| INV-7 | 99.5 |"
            )
        )
        got = extract_fields_from_spans(spans, ["Invoice No", "total"])
        assert got["Invoice No"] == "INV-7"
        assert got["total"] == "99.5"

    @pytest.mark.usefixtures("ray_session")
    def test_dataset_ops(self):
        import json

        from docstrange_ray.ops.fields import extract_fields, extract_with_schema

        rows = {
            r["field"]: r
            for r in extract_fields(_ds(), ["revenue", "nope"]).take_all()
        }
        assert rows["revenue"]["value"] == "100" and rows["revenue"]["found"]
        assert rows["nope"]["value"] == "" and not rows["nope"]["found"]

        schema = {
            "properties": {
                "revenue": {"type": "integer"},
                "total_amount": {"type": "number"},
                "currency": {"type": "string"},
            }
        }
        out = extract_with_schema(_ds(), schema).take_all()
        data = json.loads(out[0]["extracted"])
        assert data == {"revenue": 100, "total_amount": 1250.0, "currency": "USD"}

    def test_cast_matrix(self):
        from docstrange_ray.ops.fields import _cast

        assert _cast("1,250", "integer") == 1250
        assert _cast("1250.75", "number") == 1250.75
        assert _cast("  YES ", "boolean") is True
        assert _cast("no", "boolean") is False
        assert _cast("1", "boolean") is True
        assert _cast("x12", "integer") is None  # uncastable -> null
        assert _cast("x12", "number") is None
        assert _cast(None, "string") is None
        assert _cast("plain", "string") == "plain"
        assert _cast("7", "string") == "7"

    def test_nested_schema(self):
        """VERDICT r4 #10: nested objects, scalar arrays, and
        array-of-object (table rows under covering headers)."""
        from docstrange_ray.extract.core import finalize_spans
        from docstrange_ray.extract.markdown_extract import markdown_to_spans
        from docstrange_ray.ops.fields import extract_schema_from_spans

        md = "\n\n".join(
            [
                "# Invoice",
                "vendor: Acme Corp",
                "- tag: alpha",
                "- tag: beta",
                "address city: Springfield",
                "zip: 11001",
                "| item | qty | price |\n| --- | --- | --- |\n"
                "| bolt | 4 | 1.5 |\n| nut | 9 | 0.25 |",
            ]
        )
        spans = finalize_spans(markdown_to_spans(md))
        schema = {
            "properties": {
                "vendor": {"type": "string"},
                "tag": {"type": "array", "items": {"type": "string"}},
                "address": {
                    "type": "object",
                    "properties": {
                        "city": {"type": "string"},
                        "zip": {"type": "integer"},
                    },
                },
                "lines": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {
                            "item": {"type": "string"},
                            "qty": {"type": "integer"},
                            "price": {"type": "number"},
                        },
                    },
                },
            }
        }
        got = extract_schema_from_spans(spans, schema)
        assert got == {
            "vendor": "Acme Corp",
            "tag": ["alpha", "beta"],
            # 'address city' dotted path wins for city; zip falls back
            # to the bare leaf name
            "address": {"city": "Springfield", "zip": 11001},
            "lines": [
                {"item": "bolt", "qty": 4, "price": 1.5},
                {"item": "nut", "qty": 9, "price": 0.25},
            ],
        }


class TestUrlDetect:
    def test_is_url(self):
        from docstrange_ray.extract.url_detect import is_url

        assert is_url("https://example.com/x.pdf")
        assert is_url("http://a.b/c")
        assert not is_url("/local/path.pdf")
        assert not is_url("not a url")

    def test_extension_dispatch(self):
        from docstrange_ray.extract.url_detect import detect_format

        info = detect_format("https://x.com/docs/paper.pdf?ver=2")
        assert info == {
            "file_type": "pdf",
            "extension": ".pdf",
            "filename": "paper.pdf",
        }
        assert detect_format("https://x.com/a.webp")["file_type"] == "image"

    def test_content_type_fallback_and_web_page(self):
        from docstrange_ray.extract.url_detect import detect_format

        assert (
            detect_format("https://x.com/download", content_type="application/pdf")[
                "file_type"
            ]
            == "pdf"
        )
        docx_ct = (
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document"
        )
        assert detect_format("https://x.com/d", content_type=docx_ct)["extension"] == ".docx"
        # HTML without attachment disposition = web page = None
        assert detect_format("https://x.com/page", content_type="text/html") is None
        assert (
            detect_format(
                "https://x.com/page",
                content_type="text/html",
                content_disposition="attachment; filename=x.html",
            )["file_type"]
            == "html"
        )


class TestPageBackendSeam:
    def test_mock_is_identity(self):
        from docstrange_ray.extract.backends import MockPageBackend

        payload = '{"embedded_text": "x"}'
        assert MockPageBackend().analyze_page(payload) == payload

    def test_factory_and_interface_conformance(self):
        import inspect

        from docstrange_ray.extract.backends import (
            DoclingPageBackend,
            MockPageBackend,
            make_backend,
        )
        from docstrange_ray.config import DEFAULT, ExtractConfig

        assert isinstance(make_backend(DEFAULT), MockPageBackend)
        # interchangeability: both backends expose the same method shape
        sig_mock = inspect.signature(MockPageBackend.analyze_page)
        sig_real = inspect.signature(DoclingPageBackend.analyze_page)
        assert list(sig_mock.parameters) == list(sig_real.parameters)
        with pytest.raises(ValueError, match="unknown page backend"):
            make_backend(ExtractConfig(page_backend="nope"))

    def test_docling_backend_is_gated(self):
        from docstrange_ray.extract.backends import DoclingPageBackend

        with pytest.raises(NotImplementedError, match="docling"):
            DoclingPageBackend()
