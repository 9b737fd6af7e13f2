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

Continuation records ARE handled for the SST (the one record that
splits in practice — string tables above the 8224-byte BIFF8 record
cap): CONTINUE (0x003C) fragments are stitched with the spec's
mid-string rule (a string whose character data crosses a fragment
boundary restarts with a fresh option byte, so the encoding may switch
between compressed and UTF-16 mid-string). Rich-text runs beyond the
skip fields remain out of scope.
"""

from __future__ import annotations

import struct

from docstrange_ray.extract.cfb import CfbReader

# --- BIFF8 (.xls) ------------------------------------------------------------

_XLS_SST = 0x00FC
_XLS_CONTINUE = 0x003C
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


def _parse_sst(fragments: list[bytes]) -> list[str]:
    """Shared string table from the SST record body plus any CONTINUE
    fragment bodies. Spec rules ([MS-XLS] 2.5.294, Continue 2.4.58):
    string headers never straddle a fragment boundary; character data
    may, restarting in the next fragment with a fresh option byte (the
    encoding can flip compressed<->UTF-16 mid-string); rich-run/ext
    payloads continue raw (no option byte)."""
    (total_unique,) = struct.unpack_from("<I", fragments[0], 4)
    out: list[str] = []
    fi, pos = 0, 8  # skip cstTotal/cstUnique in the base fragment
    while len(out) < total_unique:
        while fi < len(fragments) and pos >= len(fragments[fi]):
            fi += 1
            pos = 0  # a NEW string at a boundary starts with its header
        if fi >= len(fragments):
            break  # truncated table: return what parsed
        buf = fragments[fi]
        if pos + 3 > len(buf):
            raise ValueError("SST string header straddles a fragment")
        cch, flags = struct.unpack_from("<HB", buf, pos)
        pos += 3
        c_run = cb_ext = 0
        if flags & 0x08:  # fRichSt
            (c_run,) = struct.unpack_from("<H", buf, pos)
            pos += 2
        if flags & 0x04:  # fExtSt
            (cb_ext,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        wide = bool(flags & 0x01)
        remaining = cch
        parts: list[str] = []
        while remaining:
            buf = fragments[fi]
            avail = len(buf) - pos
            take = min(remaining, (avail // 2) if wide else avail)
            if take <= 0:
                fi += 1
                pos = 0
                if fi >= len(fragments):
                    raise ValueError("truncated SST character data")
                wide = bool(fragments[fi][0] & 0x01)  # continued: option byte
                pos = 1
                continue
            nb = 2 * take if wide else take
            raw = buf[pos : pos + nb]
            parts.append(raw.decode("utf-16-le" if wide else "latin-1", "replace"))
            pos += nb
            remaining -= take
        skip = 4 * c_run + cb_ext
        while skip:  # rich/ext data: raw continuation, no option byte
            buf = fragments[fi]
            avail = len(buf) - pos
            if avail <= 0:
                fi += 1
                pos = 0
                if fi >= len(fragments):
                    raise ValueError("truncated SST rich/ext data")
                continue
            t = min(skip, avail)
            pos += t
            skip -= t
        out.append("".join(parts))
    return out


def parse_xls_bytes(data: bytes) -> dict:
    """.xls bytes -> the 'xlsx-src' structure payload (sheets in
    BOUNDSHEET order, first row = header — identical downstream
    semantics to parse_xlsx_bytes)."""
    cfb = CfbReader(data)
    wb = cfb.streams.get("Workbook") or cfb.streams.get("Book")
    if not wb:
        raise ValueError("no Workbook stream")

    # Materialize the globals substream record list so SST can absorb
    # its trailing CONTINUE fragments.
    globals_recs: list[tuple[int, bytes]] = []
    for rtype, body, _ in _records(wb):
        if rtype == _XLS_EOF:
            break  # end of workbook globals substream
        globals_recs.append((rtype, body))

    sst: list[str] = []
    sheets_dir: list[tuple[str, int]] = []  # (name, stream offset)
    ri = 0
    while ri < len(globals_recs):
        rtype, body = globals_recs[ri]
        if rtype == _XLS_SST:
            frags = [body]
            while (
                ri + 1 < len(globals_recs)
                and globals_recs[ri + 1][0] == _XLS_CONTINUE
            ):
                ri += 1
                frags.append(globals_recs[ri][1])
            sst = _parse_sst(frags)
        elif rtype == _XLS_BOUNDSHEET:
            (lb_ply_pos,) = struct.unpack_from("<I", body, 0)
            cch = body[6]
            flags = body[7]
            if flags & 0x01:
                name = body[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
            else:
                name = body[8 : 8 + cch].decode("latin-1")
            sheets_dir.append((name, lb_ply_pos))
        ri += 1

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
_PPT_USER_EDIT = 0x0FF5
_PPT_PERSIST_DIR = 0x1772


def _walk_ppt(data: bytes, start: int, end: int, out: list[dict]) -> None:
    i = start
    while i + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, i)
        body_start = i + 8
        body_end = min(end, body_start + rlen)
        if (ver_inst & 0x000F) == 0x000F:  # container: recurse
            _walk_ppt(data, body_start, body_end, out)
        elif rtype == _PPT_SLIDE_PERSIST:
            # persistIdRef (first 4 body bytes) points at the slide's
            # Slide container through the persist directory
            pid = (
                struct.unpack_from("<I", data, body_start)[0] if rlen >= 4 else 0
            )
            out.append({"texts": [], "persist_id": pid})
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


def _persist_map(doc: bytes, current_user: bytes | None) -> dict[int, int]:
    """persistId -> stream offset via the UserEditAtom chain: the
    Current User stream's offsetToCurrentEdit locates the newest
    UserEditAtom; each edit names its PersistDirectoryAtom (packed
    (persistId:20, cPersist:12) runs of offsets) and the previous edit.
    Newest entries win ([MS-PPT] 2.3.2, 2.3.4-2.3.5)."""
    if not current_user or len(current_user) < 20:
        return {}
    try:
        (off_edit,) = struct.unpack_from("<I", current_user, 16)
    except struct.error:
        return {}
    mapping: dict[int, int] = {}
    seen: set[int] = set()
    while off_edit and off_edit + 8 <= len(doc) and off_edit not in seen:
        seen.add(off_edit)
        _vi, rtype, rlen = struct.unpack_from("<HHI", doc, off_edit)
        if rtype != _PPT_USER_EDIT:
            break
        body = doc[off_edit + 8 : off_edit + 8 + rlen]
        if len(body) < 16:
            break
        off_last, off_dir = struct.unpack_from("<II", body, 8)
        if off_dir + 8 <= len(doc):
            _v, dtype, dlen = struct.unpack_from("<HHI", doc, off_dir)
            if dtype == _PPT_PERSIST_DIR:
                dbody = doc[off_dir + 8 : off_dir + 8 + dlen]
                p = 0
                while p + 4 <= len(dbody):
                    (word,) = struct.unpack_from("<I", dbody, p)
                    pid, cnt = word & 0xFFFFF, word >> 20
                    p += 4
                    for k in range(cnt):
                        if p + 4 > len(dbody):
                            break
                        (off,) = struct.unpack_from("<I", dbody, p)
                        p += 4
                        mapping.setdefault(pid + k, off)  # newest wins
        off_edit = off_last
    return mapping


def parse_ppt_bytes(data: bytes) -> dict:
    """.ppt bytes -> the 'pptx-src' structure payload. Slide grouping
    follows SlidePersistAtom markers inside SlideListWithText (the
    outline text), and each atom's persistIdRef is resolved through the
    persist directory (Current User -> UserEditAtom chain ->
    PersistDirectoryAtom) to the slide's Slide container, whose
    non-placeholder textbox atoms are appended — text stored only in
    the drawing layer is no longer dropped. Files without a resolvable
    persist directory degrade to the outline-only approximation."""
    cfb = CfbReader(data)
    doc = cfb.streams.get("PowerPoint Document")
    if not doc:
        raise ValueError("no PowerPoint Document stream")
    # Outline pass: walk ONLY the Document container (0x03E8) — the
    # stream also holds top-level Slide containers (persist targets),
    # whose text must attach to ITS slide, not whichever came last.
    slides: list[dict] = []
    found_doc = False
    i = 0
    while i + 8 <= len(doc):
        _vi, rtype, rlen = struct.unpack_from("<HHI", doc, i)
        if rtype == 0x03E8:
            found_doc = True
            _walk_ppt(doc, i + 8, min(len(doc), i + 8 + rlen), slides)
        i += 8 + rlen
    if not found_doc:  # degenerate stream: fall back to a full walk
        _walk_ppt(doc, 0, len(doc), slides)

    persist = _persist_map(doc, cfb.streams.get("Current User"))
    if persist:
        for slide in slides:
            off = persist.get(slide.get("persist_id") or -1)
            if off is None or off + 8 > len(doc):
                continue
            _vi, rtype, rlen = struct.unpack_from("<HHI", doc, off)
            extra: list[dict] = [{"texts": []}]
            _walk_ppt(doc, off + 8, min(len(doc), off + 8 + rlen), extra)
            for bucket in extra:
                for t in bucket["texts"]:
                    if t not in slide["texts"]:
                        slide["texts"].append(t)
    for slide in slides:
        slide.pop("persist_id", None)
    return {"slides": slides}
