"""REAL media metadata: header sniffing over binary payload columns.

Round-1's multimodal stage used fake metadata columns end-to-end. This
module makes the METADATA path real with stdlib-only container parsers —
magic-number detection plus header field extraction for PNG / JPEG /
GIF / BMP images and WAV audio. Pixel/sample DECODE stays behind the
gated fake backends (`ops/multimodal.py` — no PIL/ffmpeg here), exactly
the reference's split between cheap metadata and model-bearing decode.

Scale shape: a stateless ``map_batches`` over the media table's binary
column — header bytes only are touched (the first ~few hundred bytes of
each payload), vectorization is the batch, no shuffle.
"""

from __future__ import annotations

import functools
import struct
import zlib

import pyarrow as pa


def _normalize_parse_errors(fn):
    """Decode entry points promise: malformed input raises ValueError.

    A truncated header raises struct.error, truncated block data
    IndexError, a corrupt LZW code KeyError, corrupt DEFLATE zlib.error
    — all are EXPECTED inputs for a decoder fed arbitrary bytes, so
    they normalize to ValueError here rather than crashing actor tasks
    whose fallback paths catch ValueError (ADVICE-r3 #2)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except (KeyError, IndexError, struct.error, zlib.error, EOFError, OverflowError) as e:
            raise ValueError(
                f"malformed payload in {fn.__name__}: {type(e).__name__}: {e}"
            ) from e

    return wrapped


def sniff_media(data: bytes) -> dict:
    """``{mime, width, height, channels, sample_rate, duration_ms}``
    from container magic + header fields ('' / -1 when not applicable
    or unparseable)."""
    out = {
        "mime": "",
        "width": -1,
        "height": -1,
        "channels": -1,
        "sample_rate": -1,
        "duration_ms": -1,
    }
    if not data or len(data) < 12:
        return out
    # PNG: 8-byte signature, IHDR is always the first chunk
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        out["mime"] = "image/png"
        if len(data) >= 24 and data[12:16] == b"IHDR":
            out["width"], out["height"] = struct.unpack(">II", data[16:24])
        return out
    # GIF: logical screen descriptor right after the 6-byte version
    if data[:6] in (b"GIF87a", b"GIF89a"):
        out["mime"] = "image/gif"
        out["width"], out["height"] = struct.unpack("<HH", data[6:10])
        return out
    # BMP: BITMAPINFOHEADER at offset 14
    if data[:2] == b"BM" and len(data) >= 26:
        out["mime"] = "image/bmp"
        out["width"], out["height"] = struct.unpack("<ii", data[18:26])
        out["height"] = abs(out["height"])  # top-down BMPs store negative
        return out
    # JPEG: walk markers to the first SOF0/SOF1/SOF2 frame header
    if data[:2] == b"\xff\xd8":
        out["mime"] = "image/jpeg"
        i = 2
        n = len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2) and i + 9 <= n:
                out["height"], out["width"] = struct.unpack(
                    ">HH", data[i + 5 : i + 9]
                )
                return out
            i += 2 + seg_len
        return out
    # TIFF: II*\0 (LE) / MM\0* (BE); walk IFD0 for tags 256/257
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        out["mime"] = "image/tiff"
        end = "<" if data[:2] == b"II" else ">"
        try:
            (ifd_off,) = struct.unpack(end + "I", data[4:8])
            (n_entries,) = struct.unpack(end + "H", data[ifd_off : ifd_off + 2])
            for e in range(n_entries):
                o = ifd_off + 2 + e * 12
                tag, typ = struct.unpack(end + "HH", data[o : o + 4])
                if tag in (256, 257):
                    if typ == 3:  # SHORT: value in the first 2 bytes
                        (val,) = struct.unpack(end + "H", data[o + 8 : o + 10])
                    elif typ == 4:  # LONG
                        (val,) = struct.unpack(end + "I", data[o + 8 : o + 12])
                    else:
                        continue
                    out["width" if tag == 256 else "height"] = val
        except struct.error:
            pass
        return out
    # WebP: RIFF/WEBP with VP8X (canvas), VP8 (lossy) or VP8L (lossless)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        out["mime"] = "image/webp"
        four = data[12:16]
        if four == b"VP8X" and len(data) >= 30:
            out["width"] = 1 + int.from_bytes(data[24:27], "little")
            out["height"] = 1 + int.from_bytes(data[27:30], "little")
        elif four == b"VP8 " and len(data) >= 30 and data[23:26] == b"\x9d\x01\x2a":
            out["width"] = struct.unpack("<H", data[26:28])[0] & 0x3FFF
            out["height"] = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        elif four == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
            bits = int.from_bytes(data[21:25], "little")
            out["width"] = 1 + (bits & 0x3FFF)
            out["height"] = 1 + ((bits >> 14) & 0x3FFF)
        return out
    # WAV: RIFF/WAVE with an fmt chunk
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        out["mime"] = "audio/wav"
        i = 12
        n = len(data)
        byte_rate = 0
        data_size = 0
        while i + 8 <= n:
            cid = data[i : i + 4]
            size = struct.unpack("<I", data[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                out["channels"], out["sample_rate"], byte_rate = struct.unpack(
                    "<HII", data[i + 10 : i + 20]
                )
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)
        if byte_rate and data_size:
            out["duration_ms"] = int(round(1000 * data_size / byte_rate))
        return out
    return out


@_normalize_parse_errors
def decode_png(data: bytes):
    """REAL stdlib PNG decode -> grayscale ``numpy (h, w) uint8``:
    IDAT inflate + per-scanline unfiltering (None/Sub/Up/Average/Paeth)
    for 8-bit grayscale, RGB and RGBA color types (palette/16-bit out of
    scope). Color converts via the standard luma weights. This makes the
    image DECODE path real for PNG payloads with zero dependencies —
    JPEG decode still needs a codec (the gated PIL backend)."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(data):
        (length,) = _struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = _struct.unpack(">IIBB", body[:10])
            # byte 12 is the interlace flag: Adam7 payloads have per-pass
            # scanline layout, so the sequential unfilter below would
            # emit garbage pixels — reject clearly instead.
            if len(body) >= 13 and body[12] != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length
    if width is None or bit_depth != 8 or color_type not in (0, 2, 6):
        raise ValueError(f"unsupported PNG (depth={bit_depth}, color={color_type})")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * channels
    raw = _zlib.decompress(bytes(idat))
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG data")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += stride + 1
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the left neighbor: sequential pass
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    v = line[x] + a
                elif ftype == 3:  # Average
                    v = line[x] + (a + b) // 2
                elif ftype == 4:  # Paeth
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = v & 0xFF
        out[y] = cur
        prev = cur

    pixels = out.reshape(height, width, channels)
    if channels == 1:
        return pixels[:, :, 0]
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    )
    return np.round(luma).astype(np.uint8)


# --- baseline JPEG decode (stdlib + numpy, from scratch) --------------------

# Zigzag scan order: _JPEG_ZIGZAG[k] = row-major index of the k-th
# scanned coefficient (ITU-T T.81 Figure 5 — public spec).
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import numpy as np

    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2.0)
    return C


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.buf = (self.buf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # marker ahead: pad with zero bits, leave pos on it
                    self.buf = (self.buf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected JPEG marker 0xff{nxt:02x} in scan")
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Byte-align and consume an RSTn marker (DRI intervals)."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _huff_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _receive_extend(reader: _JpegBitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.bits(s)
    if v < (1 << (s - 1)):  # negative branch (T.81 EXTEND)
        v -= (1 << s) - 1
    return v


@_normalize_parse_errors
def decode_jpeg_gray(data: bytes):
    """REAL stdlib+numpy baseline-JPEG decode -> grayscale ``numpy
    (h, w) uint8``. From-scratch ITU-T T.81 baseline path: marker walk,
    DQT/DHT/DRI/SOF0/SOS parse, canonical Huffman entropy decode with
    byte-unstuffing and restart intervals, dequantize + 8x8 IDCT.
    Supports 1- and 3-component frames with sampling factors 1-2; only
    the luma component is inverse-transformed (output is grayscale, the
    same contract as :func:`decode_png`), but chroma blocks are still
    entropy-decoded to keep the bitstream in sync. Progressive (SOF2),
    arithmetic-coded, and 12-bit frames raise ValueError — they route
    to the gated codec backend."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq == 0:
                    vals = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                    j += 65
                else:
                    vals = np.frombuffer(
                        body[j + 1 : j + 129], dtype=">u2"
                    ).astype(np.int64)
                    j += 129
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZIGZAG] = vals
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                counts = list(body[j + 1 : j + 17])
                total = sum(counts)
                symbols = list(body[j + 17 : j + 17 + total])
                huff[(tc, th)] = _huff_table(counts, symbols)
                j += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported (progressive/arithmetic)")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                scan_tables[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan_tables, qt, huff,
                restart_interval,
            )
        elif marker == 0xD9:
            break
        i += 2 + seg_len
    raise ValueError("no JPEG scan data found")


def _decode_scan(data, pos, frame, scan_tables, qt, huff, restart_interval):
    import numpy as np

    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("JPEG sampling factors above 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = comps[0]
    ly_blocks_w = mcus_x * luma["h"]
    ly_blocks_h = mcus_y * luma["v"]
    # collect dequantized luma coefficient blocks; IDCT once, batched
    lcoefs = np.zeros((ly_blocks_h * ly_blocks_w, 8, 8), dtype=np.float64)
    reader = _JpegBitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = {c["id"]: 0 for c in comps}
            for ci, c in enumerate(comps):
                dc_t = huff.get((0, scan_tables[c["id"]][0]))
                ac_t = huff.get((1, scan_tables[c["id"]][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing JPEG Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, dc_t)
                        preds[c["id"]] += _receive_extend(reader, s)
                        coefs[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[_JPEG_ZIGZAG[k]] = _receive_extend(reader, s)
                            k += 1
                        if ci == 0:  # luma only: dequant + store for IDCT
                            bi = (my * c["v"] + by) * ly_blocks_w + (
                                mx * c["h"] + bx
                            )
                            lcoefs[bi] = (coefs * qt[c["tq"]]).reshape(8, 8)
            mcu_count += 1
    C = _idct_matrix()
    spatial = np.einsum("ki,nkl,lj->nij", C, lcoefs, C) + 128.0
    plane = np.zeros((ly_blocks_h * 8, ly_blocks_w * 8), dtype=np.float64)
    for bi in range(lcoefs.shape[0]):
        by, bx = divmod(bi, ly_blocks_w)
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial[bi]
    # luma plane covers ceil(w * h_luma / hmax) samples; crop to the
    # component's true sample grid, then (factors 1 or 2) it IS the
    # image grid for the common 4:2:0 / 4:4:4 / grayscale layouts
    lw = -(-w * luma["h"] // hmax)
    lh = -(-h * luma["v"] // vmax)
    return np.clip(np.round(plane[:lh, :lw]), 0, 255).astype(np.uint8)


_META_FIELDS = (
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int64()),
)


def media_metadata(ds, payload_col: str = "payload"):
    """Dataset op: append sniffed metadata columns to a media table.
    Replaces any same-named fake columns (the sniffed values are the
    source of truth once payloads are real bytes)."""

    def sniff(batch: pa.Table) -> pa.Table:
        metas = [sniff_media(p or b"") for p in batch.column(payload_col).to_pylist()]
        for name, typ in _META_FIELDS:
            arr = pa.array([m[name] for m in metas], type=typ)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, arr
                )
            else:
                batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(sniff, batch_format="pyarrow")


# --- GIF decode (stdlib + numpy, from scratch) -------------------------------
#
# Animated GIF is the one multi-frame container decodable without a codec
# library, which makes it the honest stand-in for the reference's video
# frame-sampling stage: LZW entropy coding, palette indirection, optional
# interlacing, per-frame transparency and disposal are all real work, and
# the output is real pixels. GIF89a spec is public (CompuServe 1990).

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> "np.ndarray":
    """Decode a GIF LZW code stream into ``expected`` palette indices.

    Codes are packed little-endian (LSB first) in a byte stream; the
    code width grows from ``min_code_size + 1`` up to 12 bits, resetting
    on a CLEAR code. The dictionary maps codes to index strings; entry
    ``next_code`` is built from the previous string + first index of the
    current one (the classic KwKwK case handled explicitly)."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset_table():
        return {i: (i,) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: tuple | None = None
    while n_out < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # KwKwK
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        if next_code == (1 << width) and width < 12:
            width += 1
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        prev = entry
    if n_out < expected:
        raise ValueError("GIF LZW stream ended early")
    return out


def _gif_deinterlace(idx: "np.ndarray", w: int, h: int) -> "np.ndarray":
    """Rows of an interlaced image arrive in 4 passes (8/8 offset 0,
    8/8 offset 4, 4/4 offset 2, 2/2 offset 1); scatter them back."""
    import numpy as np

    out = np.empty((h, w), dtype=np.uint8)
    rows = idx.reshape(h, w)
    src = 0
    for start, step in _GIF_INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _luma(rgb: "np.ndarray") -> "np.ndarray":
    import numpy as np

    return np.round(
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.uint8)


@_normalize_parse_errors
def decode_gif_frames(data: bytes, max_frames: int = 0):
    """REAL stdlib GIF decode -> list of grayscale ``numpy (h, w) uint8``
    frames, composed per the GIF89a disposal model.

    Full from-scratch pipeline: logical screen descriptor, global/local
    color tables, graphic-control extensions (transparency + disposal),
    interlaced images, and the LZW code stream itself. Frames compose
    onto a persistent canvas: disposal 0/1 leave the rendered region,
    2 restores it to the background color, 3 (restore-to-previous) is
    rejected clearly rather than approximated. ``max_frames`` > 0 stops
    the (sequential by format design) decode early — frame sampling of
    a long payload does not pay for frames past the last one needed."""
    import struct as _struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_index, _ = _struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    bg_rgb = gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3)
    canvas = np.broadcast_to(bg_rgb.astype(np.uint8), (sh, sw, 3)).copy()

    frames = []
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                packed = data[pos + 1]
                disposal = (packed >> 2) & 0x07
                transparent = data[pos + 4] if packed & 0x01 else -1
                pos += 1 + size
            while data[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if disposal == 3:
            raise ValueError("GIF disposal 3 (restore-to-previous) unsupported")
        ix, iy, iw, ih, iflags = _struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(b"".join(chunks), min_code, iw * ih)
        if iflags & 0x40:
            idx2d = _gif_deinterlace(idx, iw, ih)
        else:
            idx2d = idx.reshape(ih, iw)
        region = canvas[iy : iy + ih, ix : ix + iw]
        rgb = ct[np.minimum(idx2d, len(ct) - 1)]
        if transparent >= 0:
            mask = idx2d != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(_luma(canvas))
        if max_frames and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb.astype(np.uint8)
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


@_normalize_parse_errors
def gif_frame_count(data: bytes) -> int:
    """Count image descriptors by walking the block structure WITHOUT
    entropy decoding — the cheap metadata path for frame sampling."""
    import struct as _struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    count = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW min code size
        while data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
        count += 1
    return count


@_normalize_parse_errors
def decode_wav(data: bytes):
    """REAL stdlib-free WAV decode -> ``(samples int16 (n, channels),
    sample_rate)``: RIFF chunk walk (same walk as sniff_media), fmt
    validation, little-endian PCM16 payload via one zero-copy
    ``np.frombuffer``. Non-PCM (compressed) and non-16-bit WAVs are
    rejected clearly — PCM16 is the overwhelmingly dominant layout and
    the only one decodable without a codec."""
    import struct as _struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    n = len(data)
    fmt = None
    payload = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = _struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            fmt = _struct.unpack("<HHIIHH", data[i + 8 : i + 24])
        elif cid == b"data":
            payload = data[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV (format {audio_format}) unsupported")
    if bits != 16:
        raise ValueError(f"{bits}-bit WAV unsupported (PCM16 only)")
    frames = len(payload) // (2 * channels)
    samples = np.frombuffer(
        payload, dtype="<i2", count=frames * channels
    ).reshape(frames, channels)
    return samples, sample_rate


@_normalize_parse_errors
def decode_bmp_gray(data: bytes):
    """REAL BMP decode -> grayscale ``numpy (h, w) uint8``: uncompressed
    BITMAPINFOHEADER payloads, 24-bit BGR and 8-bit grayscale-palette,
    bottom-up (positive height) and top-down (negative) row orders,
    4-byte row padding. Color converts via the same luma weights as
    ``decode_png`` so mixed-format corpora hash consistently."""
    import struct as _struct

    import numpy as np

    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = _struct.unpack("<I", data[10:14])
    hdr_size, width, height = _struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = _struct.unpack("<HHI", data[26:34])
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24):
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    nch = bpp // 8
    stride = (width * nch + 3) // 4 * 4
    need = pix_off + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pix_off
    ).reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # assume the standard grayscale palette (index == intensity);
        # exotic palettes would need the color table at offset 54
        return rows[:, :width].copy()
    px = rows[:, : width * 3].reshape(height, width, 3)  # B, G, R order
    luma = 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]
    return np.round(luma).astype(np.uint8)


@_normalize_parse_errors
def decode_tiff_gray(data: bytes):
    """REAL TIFF decode -> grayscale ``numpy (h, w) uint8``: baseline
    uncompressed 8-bit grayscale (PhotometricInterpretation 1,
    Compression 1), single or multi strip, both endiannesses — the
    layout ``synth_files.make_tiff_gray`` writes and the common
    scanner-output shape. Anything fancier raises (honest gate)."""
    import struct as _struct

    import numpy as np

    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF")
    end = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = _struct.unpack(end + "I", data[4:8])
    (n_entries,) = _struct.unpack(end + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        o = ifd_off + 2 + e * 12
        tag, typ, cnt = _struct.unpack(end + "HHI", data[o : o + 8])
        if typ == 3:
            if cnt == 1:
                vals = [_struct.unpack(end + "H", data[o + 8 : o + 10])[0]]
            else:
                (voff,) = _struct.unpack(end + "I", data[o + 8 : o + 12])
                vals = [
                    _struct.unpack(end + "H", data[voff + 2 * j : voff + 2 * j + 2])[0]
                    for j in range(cnt)
                ]
        elif typ == 4:
            if cnt == 1:
                vals = [_struct.unpack(end + "I", data[o + 8 : o + 12])[0]]
            else:
                (voff,) = _struct.unpack(end + "I", data[o + 8 : o + 12])
                vals = [
                    _struct.unpack(end + "I", data[voff + 4 * j : voff + 4 * j + 4])[0]
                    for j in range(cnt)
                ]
        else:
            continue
        tags[tag] = vals
    width = tags.get(256, [0])[0]
    height = tags.get(257, [0])[0]
    bits = tags.get(258, [1])[0]
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    if not (width and height and offsets and counts):
        raise ValueError("TIFF missing required baseline tags")
    if bits != 8 or comp != 1 or spp != 1:
        raise ValueError(f"unsupported TIFF (bits={bits}, comp={comp}, spp={spp})")
    buf = bytearray()
    for off, cnt in zip(offsets, counts):
        if len(data) < off + cnt:
            raise ValueError("truncated TIFF strip")
        buf += data[off : off + cnt]
    if len(buf) < width * height:
        raise ValueError("TIFF strips shorter than image")
    return (
        np.frombuffer(bytes(buf), dtype=np.uint8, count=width * height)
        .reshape(height, width)
        .copy()
    )


@_normalize_parse_errors
def decode_image_gray(data: bytes):
    """Magic-dispatch REAL image decode -> grayscale (h, w) uint8:
    PNG / baseline JPEG / GIF (first frame) / BMP / baseline TIFF.
    One entry point so format-agnostic consumers (perceptual dedup,
    feature extraction) treat a re-encoded copy of the same pixels
    identically regardless of container. Raises ValueError for
    non-image or unsupported payloads (the normalization contract)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg_gray(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_frames(data, max_frames=1)[0]
    if data[:2] == b"BM":
        return decode_bmp_gray(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff_gray(data)
    raise ValueError("unrecognized image container")
