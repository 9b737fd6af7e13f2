"""Deterministic REAL-file fixture writers: .docx/.xlsx/.pptx/.pdf/.csv
/.txt/.html built from stdlib only.

These emit genuinely valid files (the OOXML parts a conformant reader
needs, a well-formed PDF with xref table) so the binary ingest layer
(`extract.binary_formats`) is exercised against real bytes, not against
descriptors it co-designed. Used by `tests/test_real_formats.py` and the
``real_format_extract`` driver query (fixtures synthesized under /tmp —
the brief's "synthesise deterministically at small scale" rule; the
sandbox has no sample binary corpus)."""

from __future__ import annotations

import io
import zipfile
import zlib

_CONTENT_TYPES_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
</Types>"""

_RELS_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def make_docx(paragraphs: list[tuple[str, str]], tables: list[list[list[str]]] | None = None) -> bytes:
    """Build a minimal valid .docx. ``paragraphs`` = [(text, style_id)]
    with style ids like 'Heading1', 'Title', 'ListParagraph', '' (body);
    ``tables`` = list of row-major grids appended after the body."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body_parts = []
    for text, style in paragraphs:
        style_xml = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        body_parts.append(
            f"<w:p>{style_xml}<w:r><w:t xml:space=\"preserve\">{_xml_escape(text)}</w:t></w:r></w:p>"
        )
    for grid in tables or []:
        rows = []
        for row in grid:
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{_xml_escape(c)}</w:t></w:r></w:p></w:tc>"
                for c in row
            )
            rows.append(f"<w:tr>{cells}</w:tr>")
        body_parts.append(f"<w:tbl>{''.join(rows)}</w:tbl>")
    document = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{w}"><w:body>{"".join(body_parts)}</w:body></w:document>'
    )
    # style id -> display name map (what python-docx would report)
    style_defs = "".join(
        f'<w:style w:type="paragraph" w:styleId="{sid}"><w:name w:val="{name}"/></w:style>'
        for sid, name in [
            ("Title", "Title"),
            ("Heading1", "Heading 1"),
            ("Heading2", "Heading 2"),
            ("Heading3", "Heading 3"),
            ("ListParagraph", "List Paragraph"),
        ]
    )
    styles = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:styles xmlns:w="{w}">{style_defs}</w:styles>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES_DOCX)
        zf.writestr("_rels/.rels", _RELS_DOCX)
        zf.writestr("word/document.xml", document)
        zf.writestr("word/styles.xml", styles)
    return buf.getvalue()


def make_xlsx(sheets: list[tuple[str, list[list[object]]]]) -> bytes:
    """Build a minimal valid .xlsx (shared-strings for text cells, inline
    numbers). ``sheets`` = [(name, grid)]."""
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def cell_xml(ref: str, value: object) -> str:
        if isinstance(value, (int, float)) and not isinstance(value, bool):
            return f'<c r="{ref}"><v>{value}</v></c>'
        text = str(value)
        if text not in shared_idx:
            shared_idx[text] = len(shared)
            shared.append(text)
        return f'<c r="{ref}" t="s"><v>{shared_idx[text]}</v></c>'

    def col_letter(idx: int) -> str:
        out = ""
        idx += 1
        while idx:
            idx, rem = divmod(idx - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    sheet_parts = []
    for name, grid in sheets:
        rows = []
        for ri, row in enumerate(grid, start=1):
            cells = "".join(
                cell_xml(f"{col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
            )
            rows.append(f'<row r="{ri}">{cells}</row>')
        sheet_parts.append(
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{s}"><sheetData>{"".join(rows)}</sheetData></worksheet>'
        )
    wb_sheets = "".join(
        f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{s}" xmlns:r="{r}"><sheets>{wb_sheets}</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{r}/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    shared_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{s}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t xml:space=\"preserve\">{_xml_escape(t)}</t></si>" for t in shared)
        + "</sst>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        + '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{r}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared_xml)
        for i, part in enumerate(sheet_parts):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", part)
    return buf.getvalue()


def make_pptx(slides: list[list[str]]) -> bytes:
    """Build a minimal valid .pptx. ``slides`` = list of shape-text lists
    (one <p:sp> per string; '\\n' in a string becomes multiple a:p
    paragraphs inside one shape)."""
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    slide_parts = []
    for texts in slides:
        shapes = []
        for text in texts:
            paras = "".join(
                f"<a:p><a:r><a:t>{_xml_escape(line)}</a:t></a:r></a:p>"
                for line in text.split("\n")
            )
            shapes.append(f"<p:sp><p:txBody>{paras}</p:txBody></p:sp>")
        slide_parts.append(
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{p}" xmlns:a="{a}"><p:cSld><p:spTree>{"".join(shapes)}</p:spTree></p:cSld></p:sld>'
        )
    pres = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{p}" xmlns:r="{r}"><p:sldIdLst>'
        + "".join(
            f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(len(slides))
        )
        + "</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{r}/slide" Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        + "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        + "".join(
            f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
            for i in range(len(slides))
        )
        + "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{r}/officeDocument" Target="ppt/presentation.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("ppt/presentation.xml", pres)
        zf.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i, part in enumerate(slide_parts):
            zf.writestr(f"ppt/slides/slide{i + 1}.xml", part)
    return buf.getvalue()


def make_pdf(
    pages: list[str], compress: bool = True, indirect_length: bool = False
) -> bytes:
    """Build a well-formed single-generation PDF (catalog, page tree,
    Helvetica, one Flate-compressed content stream per page, xref table)
    with each page's text drawn line-by-line via Tj/Td — the layout the
    from-scratch parser (and any real reader) understands. ``pages`` of
    empty strings produce textless pages (the scanned-PDF shape that
    routes to the OCR path). ``indirect_length`` emits each content
    stream's /Length as an indirect reference to a trailing integer
    object — the dominant layout of incremental PDF generators, which
    write the stream before its length is known."""

    def esc(line: str) -> str:
        return line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objects: list[bytes] = []  # 1-indexed bodies, object i+1
    n_pages = len(pages)
    # 1: catalog, 2: pages tree, 3: font; pages at 4..3+n; contents after
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_ids = []
    for i in range(n_pages):
        cid = 4 + n_pages + i
        content_ids.append(cid)
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> /Contents {cid} 0 R >>"
            ).encode()
        )
    length_objects: list[bytes] = []  # appended after all content objects
    length_base = 4 + 2 * n_pages  # first /Length-value object number
    for i, text in enumerate(pages):
        ops = ["BT", "/F1 11 Tf", "72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j > 0:
                ops.append("0 -14 Td")
            if line:
                ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        payload = zlib.compress(stream) if compress else stream
        filt = b" /Filter /FlateDecode" if compress else b""
        if indirect_length:
            length_tok = f"{length_base + i} 0 R".encode()
            length_objects.append(str(len(payload)).encode())
        else:
            length_tok = str(len(payload)).encode()
        objects.append(
            b"<< /Length " + length_tok + filt + b" >>\nstream\n"
            + payload
            + b"\nendstream"
        )
    objects.extend(length_objects)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_doc(paragraphs: list[str], ansi: bool = False) -> bytes:
    """Build a minimal valid legacy .doc (Word 97 binary in a CFB
    container): FIB with a CLX piece table in 0Table pointing at one
    UTF-16 (or cp1252 when ``ansi``) text piece. Paragraphs are joined
    with Word's '\\r' paragraph marks."""
    import struct

    from docstrange_ray.extract.cfb import build_cfb

    text = "\r".join(paragraphs) + ("\r" if paragraphs else "")
    text_off = 2048
    if ansi:
        body = text.encode("cp1252")
        ccp = len(body)  # ccpText counts cp positions = bytes for ANSI
        fc = (text_off * 2) | (1 << 30)  # compressed: fc = 2*offset
    else:
        body = text.encode("utf-16-le")
        ccp = len(body) // 2  # ccpText counts UTF-16 CODE UNITS
        fc = text_off

    # FIB: base + csw/fibRgW + cslw/fibRgLw + cbRgFcLcb + 93 (fc,lcb) pairs
    fib = bytearray(1024)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)  # wIdent, nFib (Word 97)
    struct.pack_into("<H", fib, 10, 0x0000)  # flags: table stream = 0Table
    struct.pack_into("<II", fib, 24, text_off, text_off + len(body))  # fcMin/fcMac
    struct.pack_into("<H", fib, 32, 0x000E)  # csw
    struct.pack_into("<H", fib, 62, 0x0016)  # cslw
    struct.pack_into("<I", fib, 64, text_off + len(body))  # cbMac
    struct.pack_into("<I", fib, 76, ccp)  # ccpText
    struct.pack_into("<H", fib, 152, 0x005D)  # cbRgFcLcb (93 pairs)

    # 0Table: Pcdt clx — CP[0], CP[1]=ccp, one PCD
    plc = struct.pack("<II", 0, ccp) + struct.pack("<HIH", 0, fc, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<II", fib, 154 + 33 * 8, 0, len(clx))  # fcClx, lcbClx

    wd = bytes(fib) + b"\x00" * (text_off - len(fib)) + body
    return build_cfb({"WordDocument": wd, "0Table": clx})


def make_xls(
    sheets: list[tuple[str, list[list[object]]]], max_record: int = 8224
) -> bytes:
    """Build a minimal valid legacy .xls (BIFF8 in a CFB container):
    workbook globals (BOF, SST, BOUNDSHEETs, EOF) + one substream per
    sheet (BOF, LABELSST/NUMBER cells, EOF). An SST larger than
    ``max_record`` bytes (the BIFF8 record-data cap) splits into the
    base record plus CONTINUE records at string boundaries — the giant
    string tables real spreadsheets produce."""
    import struct

    from docstrange_ray.extract.cfb import build_cfb

    def rec(rtype: int, body: bytes) -> bytes:
        return struct.pack("<HH", rtype, len(body)) + body

    def bof(dt: int) -> bytes:
        return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))

    sst_strings: list[str] = []
    sst_index: dict[str, int] = {}

    def sst_id(text: str) -> int:
        if text not in sst_index:
            sst_index[text] = len(sst_strings)
            sst_strings.append(text)
        return sst_index[text]

    sheet_bodies: list[bytes] = []
    for _name, grid in sheets:
        cells = []
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cells.append(
                        rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", float(v)))
                    )
                else:
                    cells.append(
                        rec(0x00FD, struct.pack("<HHHI", r, c, 0, sst_id(str(v))))
                    )
        sheet_bodies.append(bof(0x0010) + b"".join(cells) + rec(0x000A, b""))

    def xlstr(text: str) -> bytes:
        # cch counts UTF-16 CODE UNITS (astral chars = 2), not characters
        try:
            raw = text.encode("latin-1")
            return struct.pack("<HB", len(raw), 0x00) + raw
        except UnicodeEncodeError:
            raw = text.encode("utf-16-le")
            return struct.pack("<HB", len(raw) // 2, 0x01) + raw

    # SST fragments: base record + CONTINUE records, split at string
    # boundaries once a fragment would exceed the record-data cap
    sst_frags: list[bytes] = []
    cur = bytearray(struct.pack("<II", len(sst_strings), len(sst_strings)))
    for s in sst_strings:
        enc = xlstr(s)
        if len(enc) > max_record:
            raise ValueError("single SST string exceeds the record cap")
        if len(cur) + len(enc) > max_record and len(cur) > 0:
            sst_frags.append(bytes(cur))
            cur = bytearray()
        cur += enc
    sst_frags.append(bytes(cur))

    def boundsheet(name: str, pos: int) -> bytes:
        try:
            raw = name.encode("latin-1")
            flags = 0x00
        except UnicodeEncodeError:
            raw = name.encode("utf-16-le")
            return rec(0x0085, struct.pack("<IHBB", pos, 0, len(raw) // 2, 0x01) + raw)
        return rec(0x0085, struct.pack("<IHBB", pos, 0, len(raw), flags) + raw)

    # two passes: globals length depends only on record sizes, not offsets
    def globals_body(positions: list[int]) -> bytes:
        return (
            bof(0x0005)
            + rec(0x00FC, sst_frags[0])
            + b"".join(rec(0x003C, f) for f in sst_frags[1:])
            + b"".join(boundsheet(n, p) for (n, _), p in zip(sheets, positions))
            + rec(0x000A, b"")
        )

    glen = len(globals_body([0] * len(sheets)))
    positions = []
    off = glen
    for body in sheet_bodies:
        positions.append(off)
        off += len(body)
    stream = globals_body(positions) + b"".join(sheet_bodies)
    return build_cfb({"Workbook": stream})


def make_ppt(
    slides: list[list[str]], textbox_texts: list[list[str]] | None = None
) -> bytes:
    """Build a minimal legacy .ppt (PPT97 record stream in a CFB
    container): a Document container holding SlideListWithText with one
    SlidePersistAtom per slide followed by its (outline) text atoms.

    ``textbox_texts`` adds per-slide DRAWING-LAYER text stored only in
    Slide containers reached through the persist machinery: the stream
    grows Slide containers, a PersistDirectoryAtom mapping persist ids
    to their offsets, and a UserEditAtom; a ``Current User`` stream
    points at the edit — the layout real PowerPoint writes, which
    exercises the reader's persist-directory resolution."""
    import struct

    from docstrange_ray.extract.cfb import build_cfb

    def atom(rtype: int, body: bytes, ver_inst: int = 0) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(body)) + body

    def text_atoms(texts: list[str]) -> bytes:
        out = b""
        for text in texts:
            body = text.replace("\n", "\r")
            try:
                out += atom(0x0FA8, body.encode("cp1252"))  # TextBytesAtom
            except UnicodeEncodeError:
                out += atom(0x0FA0, body.encode("utf-16-le"))  # TextCharsAtom
        return out

    inner = b""
    for i, texts in enumerate(slides):
        # SlidePersistAtom: persistIdRef + flags/cTexts/slideId/reserved
        pid = (2 + i) if textbox_texts else 0
        inner += atom(0x03F3, struct.pack("<IIIII", pid, 0, len(texts), 256 + i, 0))
        inner += text_atoms(texts)
    slw = atom(0x0FF0, inner, ver_inst=0x000F)  # SlideListWithText container
    doc = atom(0x03E8, slw, ver_inst=0x000F)  # Document container
    if not textbox_texts:
        return build_cfb({"PowerPoint Document": doc})

    stream = bytearray(doc)
    slide_offsets = []
    for texts in textbox_texts:
        slide_offsets.append(len(stream))
        stream += atom(0x03EE, text_atoms(texts), ver_inst=0x000F)  # Slide
    # PersistDirectoryAtom: (persistId:20, cPersist:12) runs of offsets;
    # id 1 = document container, ids 2.. = slides
    entries = struct.pack("<II", 1 | (1 << 20), 0)
    entries += struct.pack("<I", 2 | (len(slide_offsets) << 20))
    entries += b"".join(struct.pack("<I", o) for o in slide_offsets)
    dir_off = len(stream)
    stream += atom(0x1772, entries)
    edit_off = len(stream)
    # UserEditAtom: lastSlideIdRef, version, offsetLastEdit(0 = chain
    # end), offsetPersistDirectory, docPersistIdRef, persistIdSeed,
    # lastView, unused
    stream += atom(
        0x0FF5,
        struct.pack("<IIIIIIHH", 256, 0, 0, dir_off, 1, 2 + len(slide_offsets), 0, 0),
    )
    # CurrentUserAtom: header + size/headerToken/offsetToCurrentEdit
    cu_body = struct.pack("<III", 0x14, 0xE391C05F, edit_off) + struct.pack(
        "<HHBBH", 0, 0x03F4, 3, 0, 0
    )
    current_user = atom(0x0FF6, cu_body)
    return build_cfb(
        {"PowerPoint Document": bytes(stream), "Current User": current_user}
    )


def make_png_gray(pixels) -> bytes:
    """A valid grayscale PNG from an arbitrary ``numpy (h, w) uint8``
    array (filter-0 scanlines) — for synthesizing page images with
    real structure (text-line bands) for the pixels backend."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    height, width = arr.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_png(width: int, height: int, shade: int = 128) -> bytes:
    """A fully valid grayscale PNG (stdlib zlib + struct): signature,
    IHDR, one IDAT of filter-0 scanlines, IEND — decodable by any PNG
    reader."""
    import struct

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + bytes([shade]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """A minimal valid single-frame GIF89a (2-color palette, one clear
    code frame)."""
    import struct

    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\xf0\x00\x00"  # GCT flag, 2 colors
        + b"\x00\x00\x00\xff\xff\xff"  # palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + b"\x02\x02\x44\x01\x00"  # LZW min 2, one block
        + b"\x3b"
    )


def make_wav(duration_ms: int, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """A fully valid PCM WAV of silence (stdlib ``wave``)."""
    import io as _io
    import wave

    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        n = int(sample_rate * duration_ms / 1000)
        w.writeframes(b"\x00\x00" * n * channels)
    return buf.getvalue()


def render_text_image(
    lines: list[str],
    margin: int = 4,
    line_gap: int = 5,
    ink: int = 20,
    bg: int = 250,
    preserve_case: bool = False,
    scale: int = 1,
):
    """Render text lines into a grayscale page image with the 5x7
    bitmap font (extract/glyphs) — the fixture generator for the
    pixels-backend OCR round trip: glyphs advance 6px (1px gap), a
    space skips one cell, lines are 7px tall with ``line_gap`` rows
    between. Returns numpy (h, w) uint8. Unsupported characters raise
    KeyError. By default text is uppercased (the pre-lowercase fixture
    contract); pass ``preserve_case=True`` to render the font's full
    mixed-case charset. ``scale`` renders an integer-zoomed page (every
    pixel becomes a scale×scale block) — the reference's 2x
    rasterization path (pdf_processor.py:139, config.py:11), read back
    by glyphs.read_line_multiscale."""
    import numpy as np

    from docstrange_ray.extract.glyphs import ADVANCE, GLYPH_H, GLYPH_W, glyph_bitmap

    if not preserve_case:
        lines = [ln.upper() for ln in lines]
    w = 2 * margin + max((len(ln) * ADVANCE - 1 for ln in lines), default=1)
    h = 2 * margin + len(lines) * GLYPH_H + max(0, len(lines) - 1) * line_gap
    img = np.full((h, w), bg, dtype=np.uint8)
    for li, ln in enumerate(lines):
        y = margin + li * (GLYPH_H + line_gap)
        for ci, ch in enumerate(ln):
            if ch == " ":
                continue
            x = margin + ci * ADVANCE
            img[y : y + GLYPH_H, x : x + GLYPH_W][glyph_bitmap(ch)] = ink
    if scale > 1:
        img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return img


def make_text_png(
    lines: list[str], preserve_case: bool = False, scale: int = 1
) -> bytes:
    """PNG-encoded :func:`render_text_image` page."""
    return make_png_gray(
        render_text_image(lines, preserve_case=preserve_case, scale=scale)
    )


def render_table_image(
    rows: list[list[str]],
    margin: int = 4,
    cell_pad: int = 3,
    ink: int = 20,
    bg: int = 250,
):
    """Render a RULED table into a grayscale page image: 1px horizontal
    rules above/below every row, 1px vertical rules around every column,
    cell text in the 5x7 bitmap font — the fixture generator for the
    pixels-backend table-structure round trip (the model-free analogue
    of the reference's TableFormer input: a table is ink geometry, not
    markup). Column widths size to the widest cell; ``cell_pad`` px of
    whitespace insets text from the rules (must stay < the recognizer's
    word-space gap so cells don't grow phantom spaces). Returns numpy
    (h, w) uint8."""
    import numpy as np

    from docstrange_ray.extract.glyphs import ADVANCE, GLYPH_H, GLYPH_W, glyph_bitmap

    rows = [[str(c).upper() for c in r] for r in rows]
    ncols = max(len(r) for r in rows)
    rows = [r + [""] * (ncols - len(r)) for r in rows]
    col_w = [
        max(max(len(r[j]) for r in rows) * ADVANCE - 1, 1) + 2 * cell_pad
        for j in range(ncols)
    ]
    cell_h = GLYPH_H + 2 * cell_pad
    w = 2 * margin + sum(col_w) + ncols + 1
    h = 2 * margin + len(rows) * cell_h + len(rows) + 1
    img = np.full((h, w), bg, dtype=np.uint8)
    ys = [margin + k * (cell_h + 1) for k in range(len(rows) + 1)]
    xs = [margin]
    for cw in col_w:
        xs.append(xs[-1] + 1 + cw)
    for y in ys:
        img[y, xs[0] : xs[-1] + 1] = ink
    for x in xs:
        img[ys[0] : ys[-1] + 1, x] = ink
    for ri, r in enumerate(rows):
        ty = ys[ri] + 1 + cell_pad
        for ci, cell in enumerate(r):
            tx = xs[ci] + 1 + cell_pad
            for k, ch in enumerate(cell):
                if ch == " ":
                    continue
                x0 = tx + k * ADVANCE
                img[ty : ty + GLYPH_H, x0 : x0 + GLYPH_W][glyph_bitmap(ch)] = ink
    return img


def make_table_png(rows: list[list[str]]) -> bytes:
    """PNG-encoded :func:`render_table_image` page."""
    return make_png_gray(render_table_image(rows))


def make_wav_square(
    freq: int, duration_ms: int, sample_rate: int = 8000, amp: int = 12000
) -> bytes:
    """A PCM16 WAV square wave with EXACT integer samples: sample j is
    ``+amp`` when ``(j * 2 * freq) // sample_rate`` is even, ``-amp``
    otherwise. Every derived feature is an exact rational (RMS =
    amp/32768, ZCR = flips/(n-1)), which is what makes the
    audio_features driver query SQL-oracle-able — a sine tone's
    int16 quantization depends on libm ulps, a square wave's doesn't."""
    import io as _io
    import wave

    import numpy as np

    n = int(sample_rate * duration_ms / 1000)
    j = np.arange(n, dtype=np.int64)
    sgn = np.where(((j * 2 * freq) // sample_rate) % 2 == 0, amp, -amp)
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(sgn.astype("<i2").tobytes())
    return buf.getvalue()


def make_jpeg_header(width: int, height: int) -> bytes:
    """A structurally valid JPEG prefix (SOI, JFIF APP0, SOF0 with the
    given dimensions, EOI) — header-sniffable; carries no entropy-coded
    scan data (writing a decodable JPEG needs a codec; metadata is the
    tested surface here)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"  # 1 component
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


# Standard luminance Huffman tables (ITU-T T.81 Annex K — public spec).
_JPEG_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_SYMBOLS = list(range(12))
_JPEG_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_enc_table(counts, symbols):
    """{symbol: (code, length)} from canonical counts/symbols."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s
        return bytes(self.out)


def make_jpeg(img, quant: int = 1) -> bytes:
    """Encode a grayscale ``numpy (h, w) uint8`` image as a REAL
    baseline JFIF JPEG — from-scratch stdlib+numpy: 8x8 DCT, flat
    ``quant`` quantization, zigzag run-length + canonical Huffman with
    the Annex-K luminance tables, byte stuffing. With ``quant=1`` the
    round trip through :func:`ops.media_meta.decode_jpeg_gray` is exact
    to within DCT float rounding (±1 intensity level)."""
    import numpy as np

    from docstrange_ray.ops.media_meta import _JPEG_ZIGZAG

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[-1:, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2.0)

    qtable = np.full(64, quant, dtype=np.int64)
    dc_tab = _jpeg_enc_table(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac_tab = _jpeg_enc_table(_JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS)
    writer = _JpegBitWriter()
    pred = 0

    def magnitude(v: int) -> tuple[int, int]:
        s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    zz = np.asarray(_JPEG_ZIGZAG)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coefs = C @ block @ C.T
            q = np.round(coefs.reshape(-1) / qtable).astype(np.int64)[zz]
            s, bits = magnitude(int(q[0]) - pred)
            pred = int(q[0])
            code, length = dc_tab[s]
            writer.write(code, length)
            writer.write(bits, s)
            run = 0
            nz = np.nonzero(q[1:])[0]
            last = nz[-1] + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(q[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                s, bits = magnitude(v)
                code, length = ac_tab[(run << 4) | s]
                writer.write(code, length)
                writer.write(bits, s)
                run = 0
            if last < 63:
                code, length = ac_tab[0x00]  # EOB
                writer.write(code, length)

    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0x00]) + bytes(qtable[zz].astype(np.uint8).tolist())
    sof0 = b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMBOLS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMBOLS)
    sos = b"\x01\x01\x00\x00\x3f\x00"
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + writer.flush()
        + b"\xff\xd9"
    )


# bump when write_fixture_corpus's file set/content changes — cached
# fixture dirs under /tmp are keyed on it (stale caches otherwise
# survive across rounds)
FIXTURE_VERSION = 4


def real_media_table(n: int = 60):
    """Deterministic media table of REAL bytes — valid PNGs/GIFs/WAVs/
    BMPs/TIFFs (both endiannesses)/WebP-VP8X containers plus fully
    decodable baseline JPEGs (and one header-only JPEG per cycle to
    exercise the metadata-without-scan path) — for the real-metadata
    and real-decode paths (`ops/media_meta`). Columns
    (media_ref, payload)."""
    import numpy as np
    import pyarrow as pa

    refs, payloads = [], []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            data = make_png(16 + (i % 5) * 8, 16 + (i % 3) * 8, shade=(i * 37) % 256)
        elif kind == 1:
            data = make_gif(8 + (i % 4) * 4, 8 + (i % 2) * 4)
        elif kind == 2:
            data = make_wav(50 + (i % 5) * 25)
        elif kind == 3:
            w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
            img = (
                np.add.outer(np.arange(h) * (2 + i % 3), np.arange(w)) + i * 11
            ) % 256
            data = make_jpeg(img.astype(np.uint8))
        elif kind == 4:
            data = make_jpeg_header(32 + (i % 3) * 16, 24 + (i % 2) * 8)
        elif kind == 5:
            w, h = 12 + (i % 4) * 4, 10 + (i % 3) * 4
            img = (np.add.outer(np.arange(h) * 5, np.arange(w) * 3) + i) % 256
            data = make_bmp_gray(img.astype(np.uint8))
        elif kind == 6:
            w, h = 14 + (i % 3) * 6, 9 + (i % 4) * 3
            img = (np.add.outer(np.arange(h) * 7, np.arange(w) * 2) + i) % 256
            data = make_tiff_gray(img.astype(np.uint8), big_endian=(i % 16 == 6))
        else:
            data = make_webp_vp8x(20 + (i % 5) * 10, 15 + (i % 2) * 5)
        refs.append(f"media://real/{i}")
        payloads.append(data)
    return pa.Table.from_arrays(
        [pa.array(refs), pa.array(payloads, type=pa.binary())],
        names=["media_ref", "payload"],
    )


def _fixture_jpeg() -> bytes:
    """Deterministic decodable baseline JPEG for the fixture corpus."""
    import numpy as np

    img = (np.add.outer(np.arange(32) * 4, np.arange(48) * 3) % 256).astype(
        np.uint8
    )
    return make_jpeg(img)


def write_fixture_corpus(out_dir: str) -> list[str]:
    """Write the deterministic mixed-format fixture corpus used by the
    ``real_format_extract`` driver query; returns the file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    files: dict[str, bytes] = {
        "report.docx": make_docx(
            [
                ("Annual Report", "Title"),
                ("Overview", "Heading1"),
                ("The year went well.", ""),
                ("Details", "Heading2"),
                ("first item", "ListParagraph"),
                ("second item", "ListParagraph"),
            ],
            tables=[[["metric", "value"], ["revenue", "100"], ["costs", "40"]]],
        ),
        "numbers.xlsx": make_xlsx(
            [
                ("Summary", [["region", "total"], ["north", 10], ["south", 7]]),
                ("Detail", [["day", "count"], ["mon", 3], ["tue", 4]]),
            ]
        ),
        "deck.pptx": make_pptx(
            [["Quarterly Update", "Prepared by the team"], ["Thanks!\nQuestions?"]]
        ),
        "paper.pdf": make_pdf(
            [
                "Introduction\nThis paper explains the approach in detail, "
                "covering background and methods over several sentences.",
                "Results\nEverything improved across the board in every "
                "measured dimension of the study, as the tables show.",
            ]
        ),
        "scan.pdf": make_pdf(["", ""]),  # textless: routes to the OCR path
        "legacy.doc": make_doc(
            ["Legacy memo.", "Written long ago in the binary format."]
        ),
        "ledger.xls": make_xls(
            [("Accounts", [["account", "balance"], ["ops", 250], ["eng", 410]])]
        ),
        "talk.ppt": make_ppt([["Old Deck", "Legacy bullets"], ["The End"]]),
        "photo.png": make_png(48, 32, shade=90),
        "scan.jpg": _fixture_jpeg(),
        "data.csv": b"name,qty\nwidget,3\ngadget,5\n",
        "notes.txt": "plain notes\nwith two lines\n".encode("utf-8"),
        "page.html": (
            b"<html><head><title>A Page</title><script>x()</script></head>"
            b"<body><main><h1>Hello</h1><p>World body text.</p></main></body></html>"
        ),
    }
    paths = []
    for name, data in sorted(files.items()):
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(data)
        paths.append(path)
    return paths


def make_bmp(width: int, height: int, shade: int = 128) -> bytes:
    """A fully valid 8-bit-per-pixel-free 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows padded to 4 bytes)."""
    import struct

    row = (bytes([shade, shade, shade]) * width + b"\x00" * 3)[
        : (width * 3 + 3) // 4 * 4
    ]
    pixel_data = row * height
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(pixel_data), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
        + pixel_data
    )


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """From-scratch GIF LZW encoder (LSB-first variable-width codes,
    early width change, CLEAR-on-full reset) — the exact inverse of
    ``ops.media_meta._gif_lzw_decode``."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {(i,): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    buf = ()
    for k in indices:
        k = int(k)
        cand = buf + (k,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        # encoder adds one step ahead of the decoder, hence the +1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        buf = (k,)
        if next_code == 4096:
            emit(clear, width)
            table, next_code, width = fresh()
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_rows(h: int):
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def make_gif_animated(
    frames,
    *,
    interlace: bool = False,
    transparent_idx: int | None = None,
    rects=None,
    disposals=None,
    bg_index: int = 0,
) -> bytes:
    """A fully valid animated GIF89a from grayscale ``(h, w) uint8``
    numpy frames, written from scratch (256-entry gray palette where
    ``palette[i] == (i, i, i)``, so decode luma round-trips EXACTLY).

    ``rects`` (optional) gives each frame an ``(x, y)`` placement of a
    smaller patch on the logical screen; ``disposals`` the per-frame
    disposal method (0/1 leave, 2 restore-to-background); both exercise
    the decoder's composition model. ``transparent_idx`` marks one
    palette index transparent in every frame's graphic control block."""
    import struct

    sh, sw = frames[0].shape if rects is None else (
        max(y + f.shape[0] for f, (x, y) in zip(frames, rects)),
        max(x + f.shape[1] for f, (x, y) in zip(frames, rects)),
    )
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | 0x07, bg_index, 0])  # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    for fi, frame in enumerate(frames):
        x, y = (0, 0) if rects is None else rects[fi]
        disposal = 0 if disposals is None else disposals[fi]
        packed = (disposal & 0x07) << 2
        tr = 0
        if transparent_idx is not None:
            packed |= 0x01
            tr = transparent_idx
        out += bytes([0x21, 0xF9, 4, packed, 2, 0, tr, 0])  # GCE, delay=2cs
        h, w = frame.shape
        iflags = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHH", x, y, w, h) + bytes([iflags])
        rows = frame
        if interlace:
            rows = frame[_gif_interlace_rows(h)]
        data = _gif_lzw_encode(rows.reshape(-1), 8)
        out += bytes([8])  # LZW min code size (256-color palette)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def synth_gif_frames(n_frames: int, width: int, height: int, seed: int = 0):
    """Deterministic grayscale frames (gradient + per-frame phase) for
    GIF fixtures — varied enough to exercise the LZW dictionary."""
    import hashlib as _hashlib

    import numpy as np

    h = _hashlib.md5(f"gif:{seed}".encode()).digest()
    yy, xx = np.mgrid[0:height, 0:width]
    frames = []
    for i in range(n_frames):
        phase = (h[i % 16] + 17 * i) % 251
        frames.append(((yy * 3 + xx * 7 + phase * 5) % 256).astype(np.uint8))
    return frames


def make_wav_tone(
    freq_hz: float, duration_ms: int, sample_rate: int = 8000, amplitude: float = 0.5
) -> bytes:
    """A fully valid PCM16 WAV carrying a sine tone (stdlib ``wave`` +
    math) — a non-trivial fixture for the real audio decode path."""
    import io as _io
    import math
    import wave

    n = int(sample_rate * duration_ms / 1000)
    frames = bytearray()
    for i in range(n):
        v = int(amplitude * 32767 * math.sin(2 * math.pi * freq_hz * i / sample_rate))
        frames += v.to_bytes(2, "little", signed=True)
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def make_bmp_gray(pixels) -> bytes:
    """24-bit uncompressed BMP from a grayscale (h, w) uint8 array
    (equal B=G=R channels, bottom-up rows, 4-byte padding) — the
    pixel-level sibling of ``make_bmp`` for decode round-trips."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = np.repeat(px, 3, axis=1)  # B = G = R = gray
    pixel_data = rows[::-1].tobytes()  # bottom-up
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(pixel_data), 0, 0, header_size)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
        )
        + pixel_data
    )


def make_tiff_gray(pixels, big_endian: bool = False) -> bytes:
    """Baseline uncompressed 8-bit grayscale TIFF (single strip,
    PhotometricInterpretation=1) from a (h, w) uint8 array — the layout
    ``ops.media_meta.decode_tiff_gray`` reads back."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    end = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    n_entries = 9
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, 1, 8),            # BitsPerSample
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 1),            # Photometric: BlackIsZero
        (273, 4, 1, data_off),     # StripOffsets
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 4, 1, h),            # RowsPerStrip
        (279, 4, 1, w * h),        # StripByteCounts
    ]
    out = bytearray(magic + struct.pack(end + "I", ifd_off))
    out += struct.pack(end + "H", n_entries)
    for tag, typ, cnt, val in entries:
        out += struct.pack(end + "HHI", tag, typ, cnt)
        if typ == 3:  # SHORT is left-justified in the 4-byte value field
            out += struct.pack(end + "H", val) + b"\x00\x00"
        else:
            out += struct.pack(end + "I", val)
    out += struct.pack(end + "I", 0)  # next-IFD terminator
    out += px.tobytes()
    return bytes(out)


def make_webp_vp8x(width: int, height: int) -> bytes:
    """Minimal VALID WebP container with a VP8X chunk carrying the
    canvas size. The inner image chunk is a placeholder (sniff-only —
    a real VP8 bitstream encoder is out of scope; the HEADER path is
    what ``sniff_media`` reads, and this is a structurally valid
    extended-format file)."""
    import struct

    vp8x = b"\x00\x00\x00\x00"  # flags + reserved
    vp8x += (width - 1).to_bytes(3, "little") + (height - 1).to_bytes(3, "little")
    chunks = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    riff_len = 4 + len(chunks)
    return b"RIFF" + struct.pack("<I", riff_len) + b"WEBP" + chunks
