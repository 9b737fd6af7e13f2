"""Real-format ingest tests: genuine .docx/.xlsx/.pptx/.pdf/.csv/.txt
/.html bytes built in-test (stdlib writers, no python-docx/openpyxl/
PyMuPDF anywhere) parsed by the binary ingest layer and run through the
full Ray pipeline. Assertions mirror the reference's converter-fixture
style (reference tests/test_converter.py:17-113: substring/structure
checks on the converted output) plus the engine's own north-rule gate
(span equality vs the sequential oracle)."""

from __future__ import annotations

import pytest

from docstrange_ray.extract.binary_formats import (
    file_bytes_to_input_spans,
    parse_docx_bytes,
    parse_pdf_pages,
    parse_pptx_bytes,
    parse_xlsx_bytes,
)
from docstrange_ray.synth_files import (
    make_docx,
    make_pdf,
    make_pptx,
    make_xlsx,
    write_fixture_corpus,
)


class TestDocxParser:
    def test_styles_and_tables(self):
        data = make_docx(
            [("My Title", "Title"), ("Intro", "Heading1"), ("Body here.", "")],
            tables=[[["h1", "h2"], ["a", "b"]]],
        )
        doc = parse_docx_bytes(data)
        assert doc["paragraphs"] == [
            {"text": "My Title", "style": "Title"},
            {"text": "Intro", "style": "Heading 1"},
            {"text": "Body here.", "style": ""},
        ]
        assert doc["tables"] == [[["h1", "h2"], ["a", "b"]]]

    def test_style_fallback_without_styles_xml(self):
        # strip styles.xml → styleId 'Heading2' still maps to 'Heading 2'
        import io
        import zipfile

        data = make_docx([("Sec", "Heading2")])
        src = zipfile.ZipFile(io.BytesIO(data))
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as out:
            for n in src.namelist():
                if n != "word/styles.xml":
                    out.writestr(n, src.read(n))
        doc = parse_docx_bytes(buf.getvalue())
        assert doc["paragraphs"][0]["style"] == "Heading 2"

    def test_cell_newlines_flattened(self):
        # reference: cell.text.strip().replace('\n', ' ')
        # (docx_processor.py:148)
        data = make_docx([], tables=[[["line1\nline2", "x"]]])
        doc = parse_docx_bytes(data)
        assert doc["tables"][0][0][0] == "line1 line2"


class TestXlsxParser:
    def test_sheets_shared_strings_and_numbers(self):
        data = make_xlsx(
            [
                ("Alpha", [["k", "v"], ["a", 1], ["b", 2.5]]),
                ("Beta", [["x"], ["y"]]),
            ]
        )
        book = parse_xlsx_bytes(data)
        assert [s["name"] for s in book["sheets"]] == ["Alpha", "Beta"]
        assert book["sheets"][0]["grid"] == [["k", "v"], ["a", "1"], ["b", "2.5"]]

    def test_sparse_rows_pad(self):
        # a cell at C1 with nothing at A1/B1 pads the gap with ''
        import io
        import re
        import zipfile

        data = make_xlsx([("S", [["a", "b", "c"]])])
        raw = zipfile.ZipFile(io.BytesIO(data)).read("xl/worksheets/sheet1.xml")
        sparse = re.sub(rb'<c r="A1".*?</c>', b"", raw, count=1)
        buf = io.BytesIO()
        src = zipfile.ZipFile(io.BytesIO(data))
        with zipfile.ZipFile(buf, "w") as out:
            for n in src.namelist():
                out.writestr(
                    n, sparse if n == "xl/worksheets/sheet1.xml" else src.read(n)
                )
        book = parse_xlsx_bytes(buf.getvalue())
        assert book["sheets"][0]["grid"][0][0] == ""


class TestPptxParser:
    def test_slide_order_and_shape_texts(self):
        data = make_pptx([["One", "Two"], ["Multi\nline"]])
        deck = parse_pptx_bytes(data)
        assert deck == {
            "slides": [{"texts": ["One", "Two"]}, {"texts": ["Multi\nline"]}]
        }


class TestDocParser:
    """Legacy .doc: Word 97 FIB + CLX piece table inside a from-scratch
    CFB container reader/writer (extract/cfb.py, [MS-CFB]/[MS-DOC])."""

    def test_utf16_and_ansi_pieces(self):
        from docstrange_ray.extract.binary_formats import parse_doc_bytes
        from docstrange_ray.synth_files import make_doc

        paras = ["First paragraph.", "Café naïve — unicode ✓"]
        doc = parse_doc_bytes(make_doc(paras))
        assert [p["text"] for p in doc["paragraphs"]] == paras
        ansi = parse_doc_bytes(make_doc(["Plain ANSI only."], ansi=True))
        assert ansi["paragraphs"] == [{"text": "Plain ANSI only.", "style": ""}]

    def test_dispatch_and_error_policy(self):
        from docstrange_ray.extract.binary_formats import file_bytes_to_input_spans
        from docstrange_ray.synth_files import make_doc

        spans = file_bytes_to_input_spans("m.doc", make_doc(["hi there"]))
        assert spans[0]["kind"] == "docx-src"
        bad = file_bytes_to_input_spans("m.doc", b"not a cfb container")
        assert bad[0]["text"].startswith("[extraction error:")

    def test_cfb_mini_stream_read(self):
        """Real-world .doc files keep small streams in the MINI stream;
        hand-build a container using mini sectors to exercise that
        reader path (our writer only emits regular sectors)."""
        import struct

        from docstrange_ray.extract.cfb import CfbReader

        payload = b"mini stream payload " * 5  # 100 bytes < 4096 cutoff
        SECT = 512
        # sectors: 0=FAT, 1=dir, 2=miniFAT, 3=mini-stream container
        fat = [0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE, 0xFFFFFFFE] + [0xFFFFFFFF] * 124
        minifat = [1, 0xFFFFFFFE] + [0xFFFFFFFF] * 126  # 2 mini sectors
        container = payload + b"\x00" * (SECT - len(payload))

        def entry(name, etype, start, size, child=0xFFFFFFFF):
            raw = name.encode("utf-16-le") + b"\x00\x00"
            e = bytearray(128)
            e[: len(raw)] = raw
            struct.pack_into("<H", e, 64, len(raw))
            e[66] = etype
            struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
            struct.pack_into("<I", e, 116, start)
            struct.pack_into("<Q", e, 120, size)
            return bytes(e)

        directory = entry("Root Entry", 5, 3, len(container), child=1) + entry(
            "Small", 2, 0, len(payload)
        )
        directory += b"\x00" * (SECT - len(directory))
        header = bytearray(512)
        header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
        struct.pack_into("<H", header, 26, 3)
        struct.pack_into("<H", header, 28, 0xFFFE)
        struct.pack_into("<H", header, 30, 9)
        struct.pack_into("<H", header, 32, 6)
        struct.pack_into("<I", header, 44, 1)  # 1 FAT sector
        struct.pack_into("<I", header, 48, 1)  # dir at sector 1
        struct.pack_into("<I", header, 56, 4096)
        struct.pack_into("<I", header, 60, 2)  # miniFAT at sector 2
        struct.pack_into("<I", header, 64, 1)
        struct.pack_into("<I", header, 68, 0xFFFFFFFE)
        struct.pack_into("<I", header, 76, 0)  # DIFAT[0]
        for i in range(1, 109):
            struct.pack_into("<I", header, 76 + 4 * i, 0xFFFFFFFF)
        data = (
            bytes(header)
            + struct.pack("<128I", *fat)
            + directory
            + struct.pack("<128I", *minifat)
            + container
        )
        cfb = CfbReader(data)
        assert cfb.streams["Small"] == payload


class TestLegacyOffice:
    """BIFF8 .xls and PPT97 .ppt record parsers (extract/legacy_office)
    over from-scratch CFB containers."""

    def test_xls_strings_numbers_rk(self):
        import struct

        from docstrange_ray.extract.legacy_office import (
            _rk_value,
            parse_xls_bytes,
        )
        from docstrange_ray.synth_files import make_xls

        book = parse_xls_bytes(
            make_xls(
                [
                    ("S1", [["k", "v"], ["a", 1], ["b", 2.5]]),
                    ("Ünï", [["x"], ["Ünïcödé ✓"]]),
                ]
            )
        )
        assert [s["name"] for s in book["sheets"]] == ["S1", "Ünï"]
        assert book["sheets"][0]["grid"] == [["k", "v"], ["a", "1"], ["b", "2.5"]]
        assert book["sheets"][1]["grid"][1] == ["Ünïcödé ✓"]
        # RK decode: int, int/100, and float forms
        assert _rk_value((7 << 2) | 0x02) == 7.0
        assert _rk_value((750 << 2) | 0x03) == 7.5
        (float_rk,) = struct.unpack("<I", struct.pack("<d", 2.5)[4:])
        assert _rk_value(float_rk & 0xFFFFFFFC) == 2.5

    def test_ppt_slides_and_dispatch(self):
        from docstrange_ray.extract.binary_formats import file_bytes_to_input_spans
        from docstrange_ray.extract.legacy_office import parse_ppt_bytes
        from docstrange_ray.synth_files import make_ppt, make_xls

        deck = parse_ppt_bytes(make_ppt([["One", "Two"], ["Multi\nline"]]))
        assert deck == {
            "slides": [{"texts": ["One", "Two"]}, {"texts": ["Multi\nline"]}]
        }
        assert file_bytes_to_input_spans("a.xls", make_xls([("S", [["x"]])]))[0][
            "kind"
        ] == "xlsx-src"
        assert file_bytes_to_input_spans("a.ppt", make_ppt([["t"]]))[0][
            "kind"
        ] == "pptx-src"
        bad = file_bytes_to_input_spans("a.xls", b"not cfb")
        assert bad[0]["text"].startswith("[extraction error:")

    def test_xls_sst_continue_records(self):
        # a string table past the 8224-byte BIFF8 record cap splits into
        # SST + CONTINUE fragments; the round-2 reader dropped them
        from docstrange_ray.extract.legacy_office import parse_xls_bytes
        from docstrange_ray.synth_files import make_xls

        grid = [["h1", "h2"]] + [
            [f"row {r} column one with padding text", f"val-{r}"]
            for r in range(300)
        ]
        data = make_xls([("big", grid)])
        assert len(data) > 8224
        out = parse_xls_bytes(data)
        assert out["sheets"][0]["grid"] == [[str(v) for v in row] for row in grid]
        # many tiny fragments (worst case) parse identically
        data2 = make_xls([("big", grid)], max_record=128)
        assert parse_xls_bytes(data2)["sheets"][0]["grid"] == out["sheets"][0]["grid"]

    def test_xls_sst_mid_string_continue_with_encoding_flip(self):
        import struct

        from docstrange_ray.extract.legacy_office import _parse_sst

        # 'abc' compressed in the base fragment; 'DÉF' continues wide in
        # the CONTINUE fragment behind a fresh option byte (spec rule)
        frag0 = struct.pack("<II", 1, 1) + struct.pack("<HB", 6, 0x00) + b"abc"
        frag1 = b"\x01" + "DÉF".encode("utf-16-le")
        assert _parse_sst([frag0, frag1]) == ["abcDÉF"]

    def test_ppt_persist_directory_textboxes(self):
        # drawing-layer text lives only in Slide containers reached via
        # Current User -> UserEditAtom -> PersistDirectoryAtom; the
        # round-2 reader never resolved it
        from docstrange_ray.extract.legacy_office import parse_ppt_bytes
        from docstrange_ray.synth_files import make_ppt

        data = make_ppt(
            [["title one"], ["title two"]],
            textbox_texts=[["floating box A"], ["floating box B", "note"]],
        )
        out = parse_ppt_bytes(data)
        assert out["slides"][0]["texts"] == ["title one", "floating box A"]
        assert out["slides"][1]["texts"] == ["title two", "floating box B", "note"]


class TestPdfParser:
    def test_text_layer_with_escapes(self):
        pages = ["Alpha (one)\nBeta \\ two", "Second page"]
        assert parse_pdf_pages(make_pdf(pages)) == pages

    def test_uncompressed_stream(self):
        assert parse_pdf_pages(make_pdf(["plain text"], compress=False)) == [
            "plain text"
        ]

    def test_textless_pages(self):
        assert parse_pdf_pages(make_pdf(["", ""])) == ["", ""]

    def test_pdf_is_well_formed(self):
        data = make_pdf(["x"])
        assert data.startswith(b"%PDF-1.4")
        assert data.rstrip().endswith(b"%%EOF")
        assert b"xref" in data and b"trailer" in data

    def test_indirect_multidigit_length(self):
        # '/Length 12 0 R' must resolve via the object table, not match
        # '1' as a literal length (the round-2 backtracking bug): 4 pages
        # push the /Length-value objects to numbers 12-15.
        pages = [f"page {i} body text with enough bytes" for i in range(4)]
        data = make_pdf(pages, indirect_length=True)
        assert b"/Length 12 0 R" in data
        assert parse_pdf_pages(data) == pages

    def test_indirect_length_uncompressed(self):
        pages = ["alpha", "beta", "gamma", "delta"]
        data = make_pdf(pages, compress=False, indirect_length=True)
        assert parse_pdf_pages(data) == pages

    def test_literal_length_not_prefix_truncated(self):
        # A literal '/Length 34' followed by other dict keys must parse
        # as 34, never a backtracked prefix.
        from docstrange_ray.extract.binary_formats import _LENGTH_RE

        m = _LENGTH_RE.search(b"<< /Length 345 /Filter /FlateDecode >>")
        assert m and m.group(1) == b"345"
        assert _LENGTH_RE.search(b"<< /Length 12 0 R >>") is None


class TestDispatch:
    def test_extension_routing(self):
        assert file_bytes_to_input_spans("a.docx", make_docx([("t", "")]))[0][
            "kind"
        ] == "docx-src"
        assert file_bytes_to_input_spans("a.csv", b"a,b\n1,2\n")[0]["kind"] == "table-src"
        assert file_bytes_to_input_spans("a.txt", b"hi")[0]["kind"] == "text"
        assert file_bytes_to_input_spans("a.wat", b"???") == []

    def test_corrupt_file_yields_error_span(self):
        spans = file_bytes_to_input_spans("broken.docx", b"not a zip at all")
        assert len(spans) == 1
        assert spans[0]["text"].startswith("[extraction error:")

    def test_latin1_txt_decodes(self):
        spans = file_bytes_to_input_spans("n.txt", "café".encode("latin-1"))
        assert spans[0]["text"] == "café"


@pytest.mark.usefixtures("ray_session")
class TestRealFormatPipeline:
    """The full chain: real bytes on disk → read_files →
    extract_pipeline, matching reference converter semantics and the
    sequential oracle."""

    @pytest.fixture(scope="class")
    def extracted(self, tmp_path_factory):
        from docstrange_ray.sources import extract_files, read_files

        out = str(tmp_path_factory.mktemp("realfiles"))
        write_fixture_corpus(out)
        rows = {r["doc_id"]: r for r in extract_files(out).take_all()}
        inputs = {r["doc_id"]: r for r in read_files(out).take_all()}
        return rows, inputs

    def _texts(self, row):
        return [s["text"] for s in row["spans"]]

    def test_all_files_extracted(self, extracted):
        rows, _ = extracted
        assert set(rows) == {
            "report.docx",
            "legacy.doc",
            "numbers.xlsx",
            "ledger.xls",
            "deck.pptx",
            "talk.ppt",
            "paper.pdf",
            "scan.pdf",
            "photo.png",
            "scan.jpg",
            "data.csv",
            "notes.txt",
            "page.html",
        }

    def test_matches_sequential_oracle(self, extracted):
        # north rule: span-sequence equality vs the sequential oracle
        from docstrange_ray.extract.core import extract_corpus

        rows, inputs = extracted
        oracle = {
            r["doc_id"]: r["spans"] for r in extract_corpus(list(inputs.values()))
        }
        for doc_id, row in rows.items():
            assert [dict(s) for s in row["spans"]] == oracle[doc_id], doc_id

    def test_docx_semantics(self, extracted):
        rows, _ = extracted
        texts = self._texts(rows["report.docx"])
        assert "# Annual Report" in texts  # Title style
        assert "# Overview" in texts  # Heading 1
        assert "## Details" in texts  # Heading 2
        assert "- first item" in texts  # list style
        table = next(
            s["text"] for s in rows["report.docx"]["spans"] if s["kind"] == "table"
        )
        assert table.splitlines()[0] == "| metric | value |"
        assert "| revenue | 100 |" in table

    def test_xlsx_semantics(self, extracted):
        rows, _ = extracted
        texts = self._texts(rows["numbers.xlsx"])
        assert "## Sheet: Summary" in texts
        assert "## Sheet: Detail" in texts
        tables = [
            s["text"] for s in rows["numbers.xlsx"]["spans"] if s["kind"] == "table"
        ]
        assert any("| north | 10 |" in t for t in tables)

    def test_pptx_semantics(self, extracted):
        rows, _ = extracted
        texts = self._texts(rows["deck.pptx"])
        assert "## Slide 1" in texts
        assert "## Slide 2" in texts
        assert "Quarterly Update" in texts

    def test_pdf_direct_text(self, extracted):
        rows, _ = extracted
        texts = self._texts(rows["paper.pdf"])
        assert "## Page 1" in texts and "## Page 2" in texts
        assert any("This paper explains the approach" in t for t in texts)

    def test_scanned_pdf_routes_to_ocr_path(self, extracted):
        # no text layer → page headings only (mock OCR sees no blocks)
        rows, _ = extracted
        assert self._texts(rows["scan.pdf"]) == ["## Page 1", "## Page 2"]

    def test_image_file_routes_to_ocr_path(self, extracted):
        # a real PNG: one page descriptor carrying sniffed metadata +
        # the payload for a real OCR backend; the mock sees no blocks
        import json as _json

        rows, inputs = extracted
        assert self._texts(rows["photo.png"]) == ["## Page 1"]
        desc = _json.loads(inputs["photo.png"]["spans"][0]["text"])
        assert desc["mime"] == "image/png"
        assert (desc["width"], desc["height"]) == (48, 32)
        assert len(desc["image_b64"]) > 0

    def test_csv_and_html(self, extracted):
        rows, _ = extracted
        # table-src units are named {doc_id}.t{ordinal} (engine-wide
        # naming for multi-table documents; core.extract_unit)
        assert "# CSV Data: data.csv.t1" in self._texts(rows["data.csv"])
        html_texts = self._texts(rows["page.html"])
        assert any("Hello" in t for t in html_texts)
        assert not any("x()" in t for t in html_texts)  # script stripped


class TestPdfParserFidelity:
    """Round-2 hardening: Kids-order page walk and hex-string operands."""

    def test_pages_follow_kids_order_not_object_order(self):
        # hand-build a PDF whose /Kids order REVERSES object order
        import zlib as _z

        from docstrange_ray.extract.binary_formats import parse_pdf_pages

        def stream_obj(text):
            ops = f"BT /F1 11 Tf 72 720 Td ({text}) Tj ET".encode()
            comp = _z.compress(ops)
            return (
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
            )

        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [4 0 R 3 0 R] /Count 2 >>",  # reversed!
            3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
            4: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
            5: stream_obj("object-order-first"),
            6: stream_obj("kids-order-first"),
        }
        data = b"%PDF-1.4\n" + b"".join(
            f"{n} 0 obj\n".encode() + b + b"\nendobj\n" for n, b in objs.items()
        ) + b"%%EOF\n"
        assert parse_pdf_pages(data) == ["kids-order-first", "object-order-first"]

    def test_hex_string_operands(self):
        from docstrange_ray.extract.binary_formats import _stream_text

        content = b"BT <48656C6C 6F> Tj ET"
        assert _stream_text(content) == "Hello"
        # odd final digit pads with 0 per the PDF spec
        assert _stream_text(b"BT <484> Tj ET") == "H@"

    def test_tj_kern_word_gaps(self):
        from docstrange_ray.extract.binary_formats import _stream_text

        # large negative adjustment = word gap; small kern = none
        assert _stream_text(b"BT [(Hel) -30 (lo) -250 (world)] TJ ET") == "Hello world"
        # Td operands with nothing pending never inject spaces
        assert _stream_text(b"BT 72 -720 Td (x) Tj ET") == "x"


class TestPptxSlideOrder:
    def test_sldidlst_order_overrides_part_numbers(self):
        # rewrite the presentation to list slide2 BEFORE slide1
        import io
        import zipfile

        from docstrange_ray.extract.binary_formats import parse_pptx_bytes
        from docstrange_ray.synth_files import make_pptx

        data = make_pptx([["first"], ["second"]])
        src = zipfile.ZipFile(io.BytesIO(data))
        pres = src.read("ppt/presentation.xml").decode()
        pres = pres.replace(
            '<p:sldId id="256" r:id="rId1"/><p:sldId id="257" r:id="rId2"/>',
            '<p:sldId id="257" r:id="rId2"/><p:sldId id="256" r:id="rId1"/>',
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as out:
            for n in src.namelist():
                out.writestr(
                    n, pres if n == "ppt/presentation.xml" else src.read(n)
                )
        deck = parse_pptx_bytes(buf.getvalue())
        assert deck["slides"] == [{"texts": ["second"]}, {"texts": ["first"]}]


class TestPixelsBackend:
    """ProjectionProfileBackend: REAL layout geometry from decoded
    pixels (projection-profile line segmentation), shared by the oracle
    and the pipeline through the one backend-application point in
    extract_unit."""

    def _page_image(self):
        import numpy as np

        from docstrange_ray.synth_files import make_png_gray

        # gaps wider than 1.5x the average line height so the paragraph
        # grouping heuristic (M12) keeps the three lines separate
        img = np.full((70, 100), 250, dtype=np.uint8)
        img[5:12, 10:90] = 20
        img[28:34, 10:60] = 30
        img[50:58, 30:95] = 10
        return make_png_gray(img)

    def test_detects_real_text_lines(self):
        import base64
        import json

        from docstrange_ray.extract.backends import ProjectionProfileBackend

        payload = json.dumps(
            {"embedded_text": "", "image_b64": base64.b64encode(self._page_image()).decode()}
        )
        out = json.loads(ProjectionProfileBackend().analyze_page(payload))
        assert [b["y"] for b in out["blocks"]] == [5, 28, 50]
        assert out["blocks"][1]["w"] == 50  # real x-extent per band
        # descriptor payloads pass through untouched (mixed corpora)
        desc = json.dumps({"embedded_text": "abc", "blocks": []})
        assert ProjectionProfileBackend().analyze_page(desc) == desc

    def test_glyph_font_unambiguous_and_round_trips(self):
        # every supported char round-trips alone and in a pangram; any
        # same-shape template pair differs by > 2*max_dist pixels so the
        # nearest-template match can never confuse two glyphs
        import numpy as np

        from docstrange_ray.extract import glyphs
        from docstrange_ray.synth_files import render_text_image

        chars = sorted(glyphs._RAW)
        tpls = [(ch, glyphs._crop_ink(glyphs.glyph_bitmap(ch))) for ch in chars]
        for i, (ca, ta) in enumerate(tpls):
            for cb, tb in tpls[i + 1 :]:
                if ta.shape == tb.shape:
                    # > 2*max_dist(=1): nearest-match can't confuse glyphs
                    assert int(np.count_nonzero(ta != tb)) > 2, (ca, cb)
        line = "".join(chars)
        img = render_text_image([line], margin=2, preserve_case=True)
        band = img < 128
        ys = np.nonzero(band.any(axis=1))[0]
        xs = np.nonzero(band.any(axis=0))[0]
        got = glyphs.read_line(band[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1])
        assert got == line

    def test_mixed_case_words_round_trip(self):
        # word spacing bounds hold for the lowercase charset too: the
        # widest intra-word ink gap (',l' = 5px) stays below space_gap
        # and the narrowest space (glyph then ' j' = 7px) stays above
        import numpy as np

        from docstrange_ray.extract import glyphs
        from docstrange_ray.synth_files import render_text_image

        for line in [
            "Mixed Case Works",
            "the quick brown fox jumps over a lazy dog",
            "x,l tight. j jump",
            "CamelCase iLlIj",
        ]:
            img = render_text_image([line], margin=3, preserve_case=True)
            band = img < 128
            ys = np.nonzero(band.any(axis=1))[0]
            xs = np.nonzero(band.any(axis=0))[0]
            got = glyphs.read_line(
                band[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
            )
            assert got == line, (line, got)

    def test_multiscale_reads_zoomed_renderings(self):
        """VERDICT r4 #4: the reference rasterizes at 2x zoom
        (pdf_processor.py:139, config.py:11); integer-scale template
        matching reads the zoomed rendering path. The full charset
        round-trips at scales 2 and 3, and scale inference is strict:
        a scaled band never misreads at the wrong scale (the
        block-uniform downscale refuses it)."""
        import numpy as np

        from docstrange_ray.extract import glyphs
        from docstrange_ray.synth_files import render_text_image

        line = "".join(sorted(glyphs._RAW))
        for s in (2, 3):
            img = render_text_image([line], margin=2, preserve_case=True, scale=s)
            band = img < 128
            ys = np.nonzero(band.any(axis=1))[0]
            xs = np.nonzero(band.any(axis=0))[0]
            crop = band[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
            assert glyphs.read_line_multiscale(crop) == line
            # wrong-scale reads refuse rather than misread
            for wrong in {1, 2, 3} - {s}:
                assert glyphs.read_line(crop, scale=wrong) is None
        # spacing bounds scale: words keep their boundaries at 2x/3x
        for s in (1, 2, 3):
            img = render_text_image(
                ["x,l tight. j jump"], margin=3, preserve_case=True, scale=s
            )
            band = img < 128
            ys = np.nonzero(band.any(axis=1))[0]
            xs = np.nonzero(band.any(axis=0))[0]
            got = glyphs.read_line_multiscale(
                band[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
            )
            assert got == "x,l tight. j jump", (s, got)

    def test_multiscale_page_end_to_end(self, ray_session, tmp_path):
        """A 2x-rendered page reads through the FULL pixels-backend
        pipeline (decode -> segment -> multiscale match), span-equal to
        the sequential oracle."""
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.sources import extract_files, read_files
        from docstrange_ray.synth_files import make_text_png

        p = tmp_path / "zoomed_page.png"
        p.write_bytes(make_text_png(["HELLO WORLD 42", "RAY DATA ENGINE"], scale=2))
        cfg = replace(DEFAULT, page_backend="pixels")
        rows = extract_files(str(p), cfg).take_all()
        assert len(rows) == 1
        joined = " ".join(s["text"] for s in rows[0]["spans"])
        assert "HELLO WORLD 42" in joined and "RAY DATA ENGINE" in joined
        inputs = read_files(str(p), cfg).take_all()
        oracle = extract_corpus(
            [{k: r[k] for k in ("doc_id", "spans")} for r in inputs], cfg
        )
        assert [dict(s) for s in rows[0]["spans"]] == oracle[0]["spans"]

    def test_scale3_page_not_mistaken_for_table(self, ray_session, tmp_path):
        """Regression (pixel_layout_extract golden find): at 3x zoom a
        glyph's horizontal stroke crossed the absolute 12 px rule-run
        floor and scaled text became phantom table grids. The rule
        threshold is now relative (30% of page width); a 3x page must
        read its text, and a real ruled table must still be detected."""
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.sources import extract_files
        from docstrange_ray.synth_files import make_table_png, make_text_png

        p = tmp_path / "zoom3.png"
        p.write_bytes(make_text_png(["RAY DATA ENGINE", "SECTION X-A"], scale=3))
        t = tmp_path / "grid.png"
        t.write_bytes(make_table_png([["A", "B"], ["X", "Y"]]))
        cfg = replace(DEFAULT, page_backend="pixels")
        rows = {r["doc_id"]: r for r in extract_files(str(tmp_path), cfg).take_all()}
        z = " ".join(s["text"] for s in rows["zoom3.png"]["spans"])
        assert "RAY DATA ENGINE" in z and "SECTION X-A" in z
        assert not any(s["kind"] == "table" for s in rows["zoom3.png"]["spans"])
        assert any(s["kind"] == "table" for s in rows["grid.png"]["spans"])

    def test_glyph_recognizer_reads_real_text_end_to_end(self, ray_session, tmp_path):
        """S12 with actual recognition: render text with the bitmap
        font, decode + segment + template-match through the full
        pipeline — extracted spans contain the rendered text (VERDICT-r3
        #8), still span-equal to the sequential oracle."""
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.sources import extract_files, read_files
        from docstrange_ray.synth_files import make_text_png

        p = tmp_path / "text_page.png"
        # avoid 0/1/| which the reference-faithful M8 OCR postprocess rewrites
        p.write_bytes(make_text_png(["HELLO WORLD 42", "RAY DATA ENGINE"]))
        cfg = replace(DEFAULT, page_backend="pixels")
        rows = extract_files(str(p), cfg).take_all()
        assert len(rows) == 1
        joined = " ".join(s["text"] for s in rows[0]["spans"])
        assert "HELLO WORLD 42" in joined and "RAY DATA ENGINE" in joined
        inputs = read_files(str(p), cfg).take_all()
        oracle = extract_corpus(
            [{k: r[k] for k in ("doc_id", "spans")} for r in inputs], cfg
        )
        assert [dict(s) for s in rows[0]["spans"]] == oracle[0]["spans"]

    def test_mixed_case_text_end_to_end(self, ray_session, tmp_path):
        """S12 with the lowercase charset: mixed-case rendered text
        survives decode + segment + template-match through the full
        pipeline (no digits/pipes — M8's confusable rewrite is lossy
        only for those), span-equal to the sequential oracle."""
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.sources import extract_files, read_files
        from docstrange_ray.synth_files import make_text_png

        p = tmp_path / "mixed_page.png"
        p.write_bytes(
            make_text_png(
                ["Hello World engine", "Ray Data reads pixels"],
                preserve_case=True,
            )
        )
        cfg = replace(DEFAULT, page_backend="pixels")
        rows = extract_files(str(p), cfg).take_all()
        assert len(rows) == 1
        joined = " ".join(s["text"] for s in rows[0]["spans"])
        assert "Hello World engine" in joined
        assert "Ray Data reads pixels" in joined
        inputs = read_files(str(p), cfg).take_all()
        oracle = extract_corpus(
            [{k: r[k] for k in ("doc_id", "spans")} for r in inputs], cfg
        )
        assert [dict(s) for s in rows[0]["spans"]] == oracle[0]["spans"]

    def test_pipeline_matches_oracle_with_pixels_backend(self, ray_session, tmp_path):
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.sources import extract_files, read_files

        p = tmp_path / "page.png"
        p.write_bytes(self._page_image())
        cfg = replace(DEFAULT, page_backend="pixels")
        rows = extract_files(str(p), cfg).take_all()
        assert len(rows) == 1
        texts = [s["text"] for s in rows[0]["spans"]]
        # the reference-faithful lossy OCR postprocess (M8: '1'->'l')
        # rewrites the digits, so match the stable prefix
        assert sum("[text line" in t for t in texts) == 3
        # oracle parity: same backend applied via the shared path
        inputs = read_files(str(p), cfg).take_all()
        oracle = extract_corpus([{k: r[k] for k in ("doc_id", "spans")} for r in inputs], cfg)
        assert [dict(s) for s in rows[0]["spans"]] == oracle[0]["spans"]


class TestPixelsTableStructure:
    """Ruled-table structure recognition from REAL pixels: the
    model-free analogue of the reference's TableFormer stage
    (neural_document_processor.py:317, SURVEY A2) — horizontal/vertical
    rule detection, grid cut at intersections, per-cell glyph OCR."""

    @staticmethod
    def _blocks(img):
        import base64
        import json

        from docstrange_ray.extract.backends import ProjectionProfileBackend
        from docstrange_ray.synth_files import make_png_gray

        payload = json.dumps(
            {"image_b64": base64.b64encode(make_png_gray(img)).decode()}
        )
        return json.loads(ProjectionProfileBackend().analyze_page(payload))["blocks"]

    def test_table_round_trips_through_pixels(self):
        import base64
        import json

        from docstrange_ray.extract.backends import ProjectionProfileBackend
        from docstrange_ray.extract.page_extract import page_to_spans
        from docstrange_ray.extract.table_extract import grid_to_markdown
        from docstrange_ray.synth_files import make_table_png

        rows = [["NAME", "QTY", "PRICE"], ["WIDGET A", "12", "3.50"],
                ["GADGET B", "7", "10.25"]]
        payload = json.dumps(
            {"image_b64": base64.b64encode(make_table_png(rows)).decode()}
        )
        desc = ProjectionProfileBackend().analyze_page(payload)
        blocks = json.loads(desc)["blocks"]
        assert [b["text"] for b in blocks] == [
            "NAME | QTY | PRICE", "WIDGET A | 12 | 3.50", "GADGET B | 7 | 10.25",
        ]
        # rows carry real strip geometry: 13px tall, stacked 14px apart
        assert [b["y"] for b in blocks] == [5, 19, 33]
        assert all(b["h"] == 13 for b in blocks)
        # downstream reassembly: one table span, canonical markdown grid
        spans = page_to_spans(desc, 1)
        assert [s["kind"] for s in spans] == ["heading", "table"]
        assert spans[1]["text"] == grid_to_markdown(rows)

    def test_mixed_page_text_and_table(self):
        import numpy as np

        from docstrange_ray.synth_files import render_table_image, render_text_image

        tbl = render_table_image([["ID", "NAME"], ["7", "ROW A"]])
        txt = render_text_image(["INVENTORY REPORT."])
        h = txt.shape[0] + 8 + tbl.shape[0]
        w = max(txt.shape[1], tbl.shape[1])
        img = np.full((h, w), 250, np.uint8)
        img[: txt.shape[0], : txt.shape[1]] = txt
        img[txt.shape[0] + 8 :, : tbl.shape[1]] = tbl
        blocks = self._blocks(img)
        texts = sorted(b["text"] for b in blocks)
        assert texts == ["7 | ROW A", "ID | NAME", "INVENTORY REPORT."]
        # table rows are excluded from line segmentation (no duplicates)
        assert len(blocks) == 3

    def test_unreadable_cell_degrades_to_placeholder(self):
        import numpy as np

        from docstrange_ray.synth_files import render_table_image

        img = render_table_image([["AB", "CD"], ["EF", "GH"]]).copy()
        noise = (np.add.outer(np.arange(5), np.arange(10)) % 2).astype(bool)
        img[22:27, 30:40] = np.where(noise, 20, 250)
        blocks = self._blocks(img)
        assert [b["text"] for b in blocks] == ["[table 2x2: 29px]"]
        assert blocks[0]["conf"] == 0.9  # geometry-only confidence

    def test_lone_rule_is_not_a_table(self):
        import numpy as np

        img = np.full((40, 100), 250, np.uint8)
        img[10, 5:95] = 20  # divider rule, no grid
        img[25:32, 10:80] = 20  # plain ink band
        blocks = self._blocks(img)
        assert all("[text line" in b["text"] for b in blocks)

    def test_table_extracts_end_to_end(self, ray_session, tmp_path):
        """S12 + A2 through the full pipeline: a PNG of a ruled table
        extracts to a markdown table span, span-equal to the sequential
        oracle."""
        from dataclasses import replace

        from docstrange_ray.config import DEFAULT
        from docstrange_ray.extract.core import extract_corpus
        from docstrange_ray.extract.table_extract import grid_to_markdown
        from docstrange_ray.sources import extract_files, read_files
        from docstrange_ray.synth_files import make_table_png

        rows = [["CODE", "CITY"], ["SFO", "SAN FRANCISCO"], ["AMS", "AMSTERDAM"]]
        p = tmp_path / "table_page.png"
        p.write_bytes(make_table_png(rows))
        cfg = replace(DEFAULT, page_backend="pixels")
        got = extract_files(str(p), cfg).take_all()
        assert len(got) == 1
        tables = [s for s in got[0]["spans"] if s["kind"] == "table"]
        assert [t["text"] for t in tables] == [grid_to_markdown(rows)]
        inputs = read_files(str(p), cfg).take_all()
        oracle = extract_corpus(
            [{k: r[k] for k in ("doc_id", "spans")} for r in inputs], cfg
        )
        assert [dict(s) for s in got[0]["spans"]] == oracle[0]["spans"]
