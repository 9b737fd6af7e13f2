"""Real file bytes → interleaved input spans: the binary ingest layer.

The reference's entire input domain is raw files parsed with python-docx
/ pandas+openpyxl / python-pptx / PyMuPDF (none installed here), so this
module re-implements the FORMATS from scratch on stdlib: OOXML documents
are zipfiles of XML (parsed with ``zipfile`` + ``xml.etree``), and the
PDF text layer is recovered by walking PDF objects and decoding content
streams (``zlib`` FlateDecode + BT/ET text-operator scan).

Output contract: each parser produces the same *structure payload* the
existing span emitters consume (``office_extract.docx_src_to_spans`` et
al.), so a real .docx and a synthetic 'docx-src' descriptor extract
through IDENTICAL downstream semantics — the parsers are pure ingest,
behind the corpus model, and the whole adaptive ``extract_pipeline``
(cost gate, explode, actor pool) applies to real files unchanged.

Reference semantics mirrored (SURVEY.md §2.1):
  * DOCX: paragraph styles 'Heading N' -> markdown heading level N,
    top-level paragraphs only, tables appended after the body with the
    20-row cap (docx_processor.py:86-174)
  * XLSX: sheets in workbook order, first row = header
    (excel_processor.py:98-148)
  * PPTX: slides in order, one text per shape (pptx_processor.py:90-133)
  * PDF: per-page text layer; the >50-char direct-text threshold and the
    OCR fallback route through the existing page descriptor
    (pdf_processor.py:83-110 — threshold :97)
  * TXT: multi-encoding decode (txt_processor.py:49-61)
"""

from __future__ import annotations

import io
import json
import re
import zipfile
import zlib
from xml.etree import ElementTree

from docstrange_ray.config import DEFAULT, ExtractConfig

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


# --- DOCX -------------------------------------------------------------------


def _docx_style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId -> human style name from word/styles.xml ('Heading1' ->
    'Heading 1'); python-docx exposes the NAME, which is what the
    reference matches on (docx_processor.py:104)."""
    names: dict[str, str] = {}
    try:
        root = ElementTree.fromstring(zf.read("word/styles.xml"))
    except (KeyError, ElementTree.ParseError):
        return names
    for style in root.iter(_W + "style"):
        sid = style.get(_W + "styleId")
        name_el = style.find(_W + "name")
        if sid and name_el is not None:
            names[sid] = name_el.get(_W + "val", sid)
    return names


def _el_text(el, tag: str) -> str:
    """Concatenated text of all ``tag`` descendants."""
    return "".join(t.text or "" for t in el.iter(tag))


def parse_docx_bytes(data: bytes) -> dict:
    """.docx bytes -> the 'docx-src' structure payload:
    ``{"paragraphs": [{"text", "style"}], "tables": [grid]}``.

    Mirrors python-docx traversal as the reference uses it
    (docx_processor.py:100-165): ``doc.paragraphs`` = TOP-LEVEL body
    paragraphs only (table-cell paragraphs excluded), ``doc.tables`` =
    top-level tables, cell text newlines flattened to spaces."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    styles = _docx_style_names(zf)
    root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(_W + "body")
    paragraphs: list[dict] = []
    tables: list[list[list[str]]] = []
    if body is None:
        return {"paragraphs": [], "tables": []}
    for child in body:
        if child.tag == _W + "p":
            text = _el_text(child, _W + "t")
            style_el = child.find(f"{_W}pPr/{_W}pStyle")
            sid = style_el.get(_W + "val", "") if style_el is not None else ""
            # fall back to inserting the space python-docx style names
            # carry ('Heading1' -> 'Heading 1') when styles.xml is absent
            style = styles.get(sid, re.sub(r"^([A-Za-z]+)(\d+)$", r"\1 \2", sid))
            paragraphs.append({"text": text, "style": style})
        elif child.tag == _W + "tbl":
            grid: list[list[str]] = []
            for tr in child.iter(_W + "tr"):
                grid.append(
                    [
                        " ".join(_el_text(tc, _W + "t").split("\n")).strip()
                        for tc in tr.iter(_W + "tc")
                    ]
                )
            tables.append(grid)
    return {"paragraphs": paragraphs, "tables": tables}


# --- XLSX -------------------------------------------------------------------


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (0-based column index)."""
    col = 0
    for ch in cell_ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def parse_xlsx_bytes(data: bytes) -> dict:
    """.xlsx bytes -> the 'xlsx-src' structure payload:
    ``{"sheets": [{"name", "grid"}]}`` with sheets in workbook order and
    the grid's first row as the header (pandas ``read_excel`` semantics,
    excel_processor.py:113-122)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    # shared strings (value type 's' indexes into this table)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sroot = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sroot.iter(_S + "si"):
            shared.append(_el_text(si, _S + "t"))
    # workbook sheet order + r:id -> worksheet part mapping
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    _R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    rel_map = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(
            "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
        )
    }
    sheets: list[dict] = []
    for sheet in wb.iter(_S + "sheet"):
        name = sheet.get("name", "")
        target = rel_map.get(sheet.get(_R + "id"), "")
        part = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
        try:
            ws = ElementTree.fromstring(zf.read(part))
        except (KeyError, ElementTree.ParseError):
            continue
        grid: list[list[str]] = []
        for row in ws.iter(_S + "row"):
            cells: list[str] = []
            for c in row.iter(_S + "c"):
                idx = _col_index(c.get("r", ""))
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    val = _el_text(c, _S + "t")
                else:
                    v = c.find(_S + "v")
                    val = v.text if v is not None and v.text is not None else ""
                    if ctype == "s":
                        try:
                            val = shared[int(val)]
                        except (ValueError, IndexError):
                            val = ""
                while len(cells) <= idx:
                    cells.append("")
                cells[idx] = val
            grid.append(cells)
        if grid:
            sheets.append({"name": name, "grid": grid})
    return {"sheets": sheets}


# --- PPTX -------------------------------------------------------------------


def _pptx_slide_order(zf: zipfile.ZipFile) -> list[str]:
    """Slide part names in PRESENTATION order: the sldIdLst's r:id refs
    resolved through presentation.xml.rels (decks reorder slides without
    renaming parts); slide-number sort is the fallback."""
    _R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    _REL = "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
    try:
        pres = ElementTree.fromstring(zf.read("ppt/presentation.xml"))
        rels = ElementTree.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
        rel_map = {r.get("Id"): r.get("Target") for r in rels.iter(_REL)}
        ordered = []
        for sld in pres.iter(_P + "sldId"):
            target = rel_map.get(sld.get(_R + "id"), "")
            part = "ppt/" + target.lstrip("/") if not target.startswith("ppt/") else target
            if part in zf.namelist():
                ordered.append(part)
        if ordered:
            return ordered
    except (KeyError, ElementTree.ParseError):
        pass
    return sorted(
        (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )


def parse_pptx_bytes(data: bytes) -> dict:
    """.pptx bytes -> the 'pptx-src' structure payload:
    ``{"slides": [{"texts": [str]}]}``. Slides in sldIdLst presentation
    order (:func:`_pptx_slide_order`); one text per shape, paragraphs
    joined with newlines (python-pptx ``shape.text`` semantics as the
    reference consumes it, pptx_processor.py:112-118)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    slide_parts = _pptx_slide_order(zf)
    slides: list[dict] = []
    for part in slide_parts:
        root = ElementTree.fromstring(zf.read(part))
        texts: list[str] = []
        for sp in root.iter(_P + "sp"):
            paras = [
                "".join(t.text or "" for t in p.iter(_A + "t"))
                for p in sp.iter(_A + "p")
            ]
            text = "\n".join(paras).strip()
            if text:
                texts.append(text)
        slides.append({"texts": texts})
    return {"slides": slides}


# --- legacy DOC (Word 97 binary, [MS-DOC]) ----------------------------------

# FIB layout constants (nFib 0x00C1): fibRgLw.ccpText at byte 76;
# fibRgFcLcb97 pair index 33 = (fcClx, lcbClx) -> bytes 418/422.
_FIB_CCPTEXT = 76
_FIB_CBRGFCLCB = 152
_FIB_FCCLX = 154 + 33 * 8


def _doc_paragraphs(text: str) -> list[dict]:
    """Word stores one long character stream with '\\r' paragraph marks
    and 0x07 cell/row marks; split on both, strip remaining control
    characters."""
    import re as _re

    paras = []
    for part in _re.split(r"[\r\x07]", text):
        clean = "".join(c if c >= " " or c == "\t" else " " for c in part).strip()
        if clean:
            paras.append({"text": clean, "style": ""})
    return paras


def parse_doc_bytes(data: bytes) -> dict:
    """.doc bytes -> the 'docx-src' structure payload (paragraphs only;
    legacy table structure is out of scope — cell text surfaces as
    paragraphs via the 0x07 marks). From-scratch Word 97 reader over the
    CFB container (`extract.cfb`): FIB -> CLX piece table in the
    0Table/1Table stream -> ANSI (cp1252) / UTF-16 text pieces. The
    reference shells out to pypandoc for .doc (docx_processor.py:63-84);
    this covers the dominant single-piece and multi-piece layouts."""
    import struct as _struct

    from docstrange_ray.extract.cfb import CfbReader

    cfb = CfbReader(data)
    wd = cfb.streams.get("WordDocument")
    if not wd or len(wd) < _FIB_FCCLX + 8:
        raise ValueError("no WordDocument stream")
    (ident,) = _struct.unpack_from("<H", wd, 0)
    if ident != 0xA5EC:
        raise ValueError("not a Word binary file")
    (flags,) = _struct.unpack_from("<H", wd, 10)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = cfb.streams.get(table_name) or cfb.streams.get(
        "1Table" if table_name == "0Table" else "0Table", b""
    )
    (ccp_text,) = _struct.unpack_from("<I", wd, _FIB_CCPTEXT)
    (fc_clx,) = _struct.unpack_from("<I", wd, _FIB_FCCLX)
    (lcb_clx,) = _struct.unpack_from("<I", wd, _FIB_FCCLX + 4)

    text = ""
    clx = table[fc_clx : fc_clx + lcb_clx]
    i = 0
    # skip Prc blocks (clxt=1) to the Pcdt (clxt=2)
    while i < len(clx) and clx[i] == 1:
        (cb,) = _struct.unpack_from("<H", clx, i + 1)
        i += 3 + cb
    if i < len(clx) and clx[i] == 2:
        (lcb,) = _struct.unpack_from("<I", clx, i + 1)
        plc = clx[i + 5 : i + 5 + lcb]
        n = (lcb - 4) // 12
        cps = _struct.unpack_from(f"<{n + 1}I", plc, 0)
        pieces = []
        for p in range(n):
            (fc,) = _struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * p + 2)
            cp_len = cps[p + 1] - cps[p]
            if fc & 0x40000000:  # compressed: ANSI at fc/2
                off = (fc & 0x3FFFFFFF) // 2
                pieces.append(wd[off : off + cp_len].decode("cp1252", "replace"))
            else:
                off = fc & 0x3FFFFFFF
                pieces.append(
                    wd[off : off + 2 * cp_len].decode("utf-16-le", "replace")
                )
        # no char-count truncation: cp ranges already bound each piece,
        # and ccpText counts UTF-16 code units, not Python characters
        text = "".join(pieces)
    else:
        # degenerate fallback: legacy fcMin/fcMac ANSI range
        fc_min, fc_mac = _struct.unpack_from("<II", wd, 24)
        if fc_mac > fc_min:
            text = wd[fc_min:fc_mac].decode("cp1252", "replace")
    return {"paragraphs": _doc_paragraphs(text), "tables": []}


# --- PDF --------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_FALLBACK_RE = re.compile(rb"(.*?)\r?\nendstream", re.DOTALL)
# (?![0-9]) anchors the number so the engine cannot backtrack into a
# prefix of an indirect reference: without it '/Length 12 0 R' matches
# '1' as a literal length (the lookahead then sees '2 0 R', not ' 0 R')
# and the stream silently truncates to 1 byte.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+0\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_TEXT_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|T[dDJj*]"  # text-positioning / show operators
    rb"|-\d+(?:\.\d+)?"  # negative kern adjustments inside TJ arrays
)
# a TJ adjustment more negative than this (in thousandths of text space)
# renders as a word gap (the PyMuPDF/pdftotext convention)
_TJ_SPACE_KERN = -150.0
_ESCAPES = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}  # n r t b f


def _pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string's inner bytes (escapes + octal)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
            elif 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            else:
                out.append(n)
                i += 2
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _stream_text(content: bytes) -> str:
    """Text shown by a decoded content stream: scan BT..ET blocks; string
    tokens buffer until a show operator (Tj/TJ/') appends them to the
    current line; Td/TD/T* start a new line."""
    lines: list[str] = []
    for bt in re.finditer(rb"BT(.*?)ET", content, re.DOTALL):
        current: list[str] = []
        pending: list[str] = []
        for tok in _TEXT_TOKEN.finditer(bt.group(1)):
            t = tok.group(0)
            if t.startswith(b"("):
                pending.append(_pdf_string(t[1:-1]))
            elif t.startswith(b"<"):
                hexdigits = bytes(c for c in t[1:-1] if not chr(c).isspace())
                if len(hexdigits) % 2:
                    hexdigits += b"0"  # PDF pads an odd final digit
                pending.append(bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1"))
            elif t.startswith(b"-"):
                # between TJ-array strings a large negative adjustment is
                # a word gap; numbers with nothing pending are positioning
                # operands (Td/TD args) and are ignored
                if pending and float(t) < _TJ_SPACE_KERN:
                    pending.append(" ")
            elif t in (b"Tj", b"TJ"):
                current.extend(pending)
                pending = []
            else:  # Td / TD / T*
                if current:
                    lines.append("".join(current))
                    current = []
        current.extend(pending)
        if current:
            lines.append("".join(current))
    return "\n".join(lines)


_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _page_order(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in DOCUMENT order: catalog -> /Pages tree ->
    depth-first /Kids walk (page objects need not appear in object-number
    order in real PDFs). Falls back to object-number scan order when the
    tree can't be resolved."""
    catalog = next(
        (
            b
            for b in objects.values()
            if b"/Type" in b and b"/Catalog" in b.split(b"stream", 1)[0]
        ),
        None,
    )
    ordered: list[int] = []
    if catalog is not None:
        m = _PAGES_REF_RE.search(catalog)
        stack = [int(m.group(1))] if m else []
        seen: set[int] = set()
        while stack:
            num = stack.pop(0)
            if num in seen or num not in objects:
                continue
            seen.add(num)
            head = objects[num].split(b"stream", 1)[0]
            km = _KIDS_RE.search(head)
            if km:  # a Pages node: queue kids in order
                kids = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
                stack = kids + stack
            elif b"/Page" in head:
                ordered.append(num)
    if ordered:
        return ordered
    return [
        num
        for num in sorted(objects)
        if b"/Type" in (h := objects[num].split(b"stream", 1)[0])
        and b"/Page" in h
        and b"/Pages" not in h
    ]


def parse_pdf_pages(data: bytes) -> list[str]:
    """Per-page text layer of a PDF (empty string per page with no
    recoverable text — e.g. a scanned page). From-scratch parser for the
    common single-generation layout: object scan, pages in /Pages-tree
    (Kids) order, /Contents streams, FlateDecode, literal + hex string
    operands. Matches the reference's PyMuPDF ``page.get_text()``
    direct-extraction role (pdf_processor.py:83-99);
    encrypted/multi-generation PDFs are out of scope (they would route
    to the OCR path)."""
    objects: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    pages: list[str] = []
    for num in _page_order(objects):
        body = objects[num]
        head = body.split(b"stream", 1)[0]
        text = ""
        m = _CONTENTS_RE.search(head)
        if m and int(m.group(1)) in objects:
            cbody = objects[int(m.group(1))]
            raw = _extract_stream(cbody, objects)
            if raw is not None:
                if b"/FlateDecode" in cbody.split(b"stream", 1)[0]:
                    try:
                        raw = zlib.decompress(raw)
                    except zlib.error:
                        raw = b""
                text = _stream_text(raw)
        pages.append(text)
    return pages


def _extract_stream(
    cbody: bytes, objects: dict[int, bytes] | None = None
) -> bytes | None:
    """Stream payload of one object body. The declared /Length is
    authoritative — delimiter-regex extraction silently truncates
    compressed data whose last byte happens to be '\\r' (the optional
    ``\\r?`` before ``endstream`` eats it). An indirect '/Length n 0 R'
    (the dominant layout in generator-produced PDFs) is resolved against
    the object table; the delimiter regex survives only as the last
    fallback when neither form resolves."""
    m = _STREAM_START_RE.search(cbody)
    if not m:
        return None
    start = m.end()
    head = cbody[: m.start()]
    lm = _LENGTH_RE.search(head)
    if lm:
        return cbody[start : start + int(lm.group(1))]
    rm = _LENGTH_REF_RE.search(head)
    if rm and objects is not None:
        ref_body = objects.get(int(rm.group(1)))
        if ref_body is not None:
            nm = re.search(rb"\d+", ref_body)
            if nm:
                return cbody[start : start + int(nm.group(0))]
    fm = _STREAM_FALLBACK_RE.match(cbody, start)
    return fm.group(1) if fm else None


# --- dispatch ---------------------------------------------------------------

_EXT_RE = re.compile(r"\.([A-Za-z0-9]+)$")


def file_bytes_to_input_spans(
    name: str, data: bytes, cfg: ExtractConfig = DEFAULT
) -> list[dict]:
    """Extension dispatch over real file bytes (the reference's
    ``_get_processor`` routing, extractor.py:336-372 — S1), emitting
    INPUT spans in the interleaved corpus model. A parse failure reduces
    to a single error span (same swallow-and-record policy as
    extraction)."""
    from docstrange_ray.extract.core import error_span
    from docstrange_ray.extract.text_extract import decode_bytes

    m = _EXT_RE.search(name.lower())
    ext = m.group(1) if m else ""
    try:
        if ext == "docx":
            payload = json.dumps(parse_docx_bytes(data))
            spans = [{"kind": "docx-src", "text": payload, "media_ref": ""}]
        elif ext == "doc":
            payload = json.dumps(parse_doc_bytes(data))
            spans = [{"kind": "docx-src", "text": payload, "media_ref": ""}]
        elif ext == "xlsx":
            payload = json.dumps(parse_xlsx_bytes(data))
            spans = [{"kind": "xlsx-src", "text": payload, "media_ref": ""}]
        elif ext == "xls":
            from docstrange_ray.extract.legacy_office import parse_xls_bytes

            payload = json.dumps(parse_xls_bytes(data))
            spans = [{"kind": "xlsx-src", "text": payload, "media_ref": ""}]
        elif ext == "pptx":
            payload = json.dumps(parse_pptx_bytes(data))
            spans = [{"kind": "pptx-src", "text": payload, "media_ref": ""}]
        elif ext == "ppt":
            from docstrange_ray.extract.legacy_office import parse_ppt_bytes

            payload = json.dumps(parse_ppt_bytes(data))
            spans = [{"kind": "pptx-src", "text": payload, "media_ref": ""}]
        elif ext == "pdf":
            spans = [
                {
                    "kind": "page-src",
                    "text": json.dumps({"embedded_text": page}),
                    "media_ref": "",
                }
                for page in parse_pdf_pages(data)
            ]
        elif ext == "csv":
            spans = [{"kind": "table-src", "text": decode_bytes(data), "media_ref": ""}]
        elif ext in ("html", "htm"):
            spans = [{"kind": "html", "text": decode_bytes(data), "media_ref": ""}]
        elif ext in ("md", "markdown"):
            spans = [{"kind": "md", "text": decode_bytes(data), "media_ref": ""}]
        elif ext == "txt":
            spans = [{"kind": "text", "text": decode_bytes(data), "media_ref": ""}]
        elif ext in ("png", "jpg", "jpeg", "gif", "bmp", "tif", "tiff", "webp"):
            # image files route to the OCR path (reference ImageProcessor,
            # image_processor.py:47-92 — S12): one page descriptor whose
            # blocks a real layout/OCR backend would predict from the
            # pixels (extract/backends.py seam); header metadata is
            # sniffed for real (ops/media_meta), the payload itself rides
            # as a base64 field for the backend
            import base64

            from docstrange_ray.ops.media_meta import sniff_media

            meta = sniff_media(data)
            spans = [
                {
                    "kind": "page-src",
                    "text": json.dumps(
                        {
                            "embedded_text": "",
                            "mime": meta["mime"],
                            "width": meta["width"],
                            "height": meta["height"],
                            "image_b64": base64.b64encode(data).decode("ascii"),
                        }
                    ),
                    "media_ref": "",
                }
            ]
        else:
            # unsupported format: record-and-drop (extract_unit policy)
            spans = []
    except Exception as e:  # noqa: BLE001 — one bad file must not fail a task
        spans = [error_span(e)]
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans
