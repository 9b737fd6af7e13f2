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
