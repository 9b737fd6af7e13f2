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

import struct

import pyarrow as pa


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
