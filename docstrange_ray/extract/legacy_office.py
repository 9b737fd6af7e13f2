"""Legacy binary Office readers: .xls (BIFF8) and .ppt (PowerPoint 97)
— stdlib-only record parsers over the CFB container (`extract.cfb`).

The reference has no real legacy-binary path either (.xls rides pandas'
optional xlrd, .ppt shells out to pypandoc — excel_processor.py:55-58,
pptx_processor.py:67-88); these readers cover the dominant layouts from
the public [MS-XLS] / [MS-PPT] specs and emit the SAME structure
payloads as the modern formats, so .xls extracts exactly like .xlsx and
.ppt like .pptx downstream:

  * BIFF8: Workbook globals (SST shared strings with compressed/UTF-16
    payloads, BOUNDSHEET sheet directory) + per-sheet cell records
    (LABELSST, NUMBER, RK, LABEL) -> ``{"sheets": [{"name", "grid"}]}``
  * PPT97: record walker over the PowerPoint Document stream;
    SlidePersistAtom markers delimit slides, TextCharsAtom (UTF-16) /
    TextBytesAtom (ANSI) carry the text -> ``{"slides": [{"texts"}]}``

Continuation-record splitting (giant SSTs) and rich-text runs beyond
the skip fields are out of scope — a file using them surfaces as the
standard per-document error span.
"""

from __future__ import annotations

import struct

from docstrange_ray.extract.cfb import CfbReader

# --- BIFF8 (.xls) ------------------------------------------------------------

_XLS_SST = 0x00FC
_XLS_BOUNDSHEET = 0x0085
_XLS_LABELSST = 0x00FD
_XLS_NUMBER = 0x0203
_XLS_RK = 0x027E
_XLS_LABEL = 0x0204
_XLS_BOF = 0x0809
_XLS_EOF = 0x000A


def _records(data: bytes, start: int = 0):
    i = start
    n = len(data)
    while i + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", data, i)
        yield rtype, data[i + 4 : i + 4 + rlen], i
        i += 4 + rlen


def _xl_string(buf: bytes, off: int, cch: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at ``off``: returns (text, bytes
    consumed from ``off``)."""
    flags = buf[off]
    pos = off + 1
    c_run = 0
    cb_ext = 0
    if flags & 0x08:  # fRichSt
        (c_run,) = struct.unpack_from("<H", buf, pos)
        pos += 2
    if flags & 0x04:  # fExtSt
        (cb_ext,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    if flags & 0x01:  # fHighByte: UTF-16
        text = buf[pos : pos + 2 * cch].decode("utf-16-le", "replace")
        pos += 2 * cch
    else:  # compressed: low bytes of UTF-16 -> latin-1
        text = buf[pos : pos + cch].decode("latin-1")
        pos += cch
    pos += 4 * c_run + cb_ext
    return text, pos - off


def _rk_value(rk: int) -> float:
    if rk & 0x02:  # integer
        v = rk >> 2
        if v & (1 << 29):  # sign-extend 30-bit
            v -= 1 << 30
        val = float(v)
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return val / 100.0 if rk & 0x01 else val


def _num_str(val: float) -> str:
    return str(int(val)) if float(val).is_integer() else str(val)


def parse_xls_bytes(data: bytes) -> dict:
    """.xls bytes -> the 'xlsx-src' structure payload (sheets in
    BOUNDSHEET order, first row = header — identical downstream
    semantics to parse_xlsx_bytes)."""
    cfb = CfbReader(data)
    wb = cfb.streams.get("Workbook") or cfb.streams.get("Book")
    if not wb:
        raise ValueError("no Workbook stream")

    sst: list[str] = []
    sheets_dir: list[tuple[str, int]] = []  # (name, stream offset)
    for rtype, body, _ in _records(wb):
        if rtype == _XLS_EOF:
            break  # end of workbook globals substream
        if rtype == _XLS_SST:
            pos = 8  # skip cstTotal/cstUnique
            while pos + 3 <= len(body):
                (cch,) = struct.unpack_from("<H", body, pos)
                text, used = _xl_string(body, pos + 2, cch)
                sst.append(text)
                pos += 2 + used
        elif rtype == _XLS_BOUNDSHEET:
            (lb_ply_pos,) = struct.unpack_from("<I", body, 0)
            cch = body[6]
            flags = body[7]
            if flags & 0x01:
                name = body[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
            else:
                name = body[8 : 8 + cch].decode("latin-1")
            sheets_dir.append((name, lb_ply_pos))

    sheets = []
    for name, off in sheets_dir:
        cells: dict[tuple[int, int], str] = {}
        for rtype, body, _ in _records(wb, off):
            if rtype == _XLS_EOF:
                break
            if rtype == _XLS_LABELSST:
                row, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
                cells[(row, col)] = sst[isst] if isst < len(sst) else ""
            elif rtype == _XLS_NUMBER:
                row, col, _ixfe = struct.unpack_from("<HHH", body, 0)
                (val,) = struct.unpack_from("<d", body, 6)
                cells[(row, col)] = _num_str(val)
            elif rtype == _XLS_RK:
                row, col, _ixfe, rk = struct.unpack_from("<HHHI", body, 0)
                cells[(row, col)] = _num_str(_rk_value(rk))
            elif rtype == _XLS_LABEL:
                row, col, _ixfe, cch = struct.unpack_from("<HHHH", body, 0)
                text, _ = _xl_string(body, 8, cch)
                cells[(row, col)] = text
        if not cells:
            continue
        n_rows = max(r for r, _ in cells) + 1
        n_cols = max(c for _, c in cells) + 1
        grid = [
            [cells.get((r, c), "") for c in range(n_cols)] for r in range(n_rows)
        ]
        sheets.append({"name": name, "grid": grid})
    return {"sheets": sheets}


# --- PPT97 (.ppt) ------------------------------------------------------------

_PPT_SLIDE_PERSIST = 0x03F3
_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8


def _walk_ppt(data: bytes, start: int, end: int, out: list[dict]) -> None:
    i = start
    while i + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, i)
        body_start = i + 8
        body_end = min(end, body_start + rlen)
        if (ver_inst & 0x000F) == 0x000F:  # container: recurse
            _walk_ppt(data, body_start, body_end, out)
        elif rtype == _PPT_SLIDE_PERSIST:
            out.append({"texts": []})
        elif rtype in (_PPT_TEXT_CHARS, _PPT_TEXT_BYTES):
            raw = data[body_start:body_end]
            if rtype == _PPT_TEXT_CHARS:
                text = raw.decode("utf-16-le", "replace")
            else:
                text = raw.decode("cp1252", "replace")
            if not out:
                out.append({"texts": []})
            # atoms hold whole text bodies; '\r' separates paragraphs
            cleaned = "\n".join(
                p for p in text.replace("\x0b", "\n").split("\r") if p.strip()
            ).strip()
            if cleaned:
                out[-1]["texts"].append(cleaned)
        i = body_start + rlen


def parse_ppt_bytes(data: bytes) -> dict:
    """.ppt bytes -> the 'pptx-src' structure payload. Slide grouping
    follows SlidePersistAtom markers inside SlideListWithText (the
    standard text-extraction approximation; full persist-directory
    resolution is out of scope)."""
    cfb = CfbReader(data)
    doc = cfb.streams.get("PowerPoint Document")
    if not doc:
        raise ValueError("no PowerPoint Document stream")
    slides: list[dict] = []
    _walk_ppt(doc, 0, len(doc), slides)
    return {"slides": slides}
