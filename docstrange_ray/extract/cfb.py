"""Minimal Compound File Binary (OLE2 / CFB) reader + writer, stdlib
only.

Legacy Office formats (.doc/.xls/.ppt) are CFB containers of named
streams ([MS-CFB]). The reference routes .doc through pypandoc
(docx_processor.py:63-84 — S5); no such binary is available here, so the
container layer is re-implemented from the public spec: 512-byte
sectors, DIFAT-addressed FAT chains, directory entries, and the
mini-FAT/mini-stream for streams under the 4096-byte cutoff.

``CfbReader`` handles both regular and mini streams (real-world .doc
files keep small streams in the mini stream). ``build_cfb`` writes a
valid single-FAT-sector container with streams padded to the cutoff so
every stream lives in regular sectors — enough for fixture files that
real readers accept.
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_SECT = 512
_MINI_SECT = 64
_MINI_CUTOFF = 4096
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


class CfbError(ValueError):
    pass


class CfbReader:
    """Parse a CFB container; ``streams`` maps stream name -> bytes."""

    def __init__(self, data: bytes):
        if data[:8] != _MAGIC:
            raise CfbError("not a CFB container")
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.first_dir,) = struct.unpack_from("<I", data, 48)
        (self.first_minifat,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.first_difat,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self._data = data

        # FAT sector list: 109 header DIFAT entries + DIFAT chain sectors
        fat_sectors = [
            s
            for (s,) in struct.iter_unpack("<I", data[76:512])
            if s not in (_FREESECT, _ENDOFCHAIN)
        ]
        difat = self.first_difat
        for _ in range(self.n_difat):
            if difat in (_ENDOFCHAIN, _FREESECT):
                break
            sec = self._sector(difat)
            entries = list(struct.unpack(f"<{_SECT // 4}I", sec))
            fat_sectors.extend(
                s for s in entries[:-1] if s not in (_FREESECT, _ENDOFCHAIN)
            )
            difat = entries[-1]
        fat = []
        for s in fat_sectors:
            fat.extend(struct.unpack(f"<{_SECT // 4}I", self._sector(s)))
        self._fat = fat

        # directory entries
        self._dir_raw = self._read_chain(self.first_dir)
        self.entries = []
        for off in range(0, len(self._dir_raw), 128):
            e = self._dir_raw[off : off + 128]
            if len(e) < 128:
                break
            (name_len,) = struct.unpack_from("<H", e, 64)
            if name_len < 2:
                continue
            name = e[: name_len - 2].decode("utf-16-le", "replace")
            etype = e[66]
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            self.entries.append(
                {"name": name, "type": etype, "start": start, "size": size}
            )

        root = next((e for e in self.entries if e["type"] == 5), None)
        mini_container = (
            self._read_chain(root["start"])[: root["size"]] if root else b""
        )
        minifat: list[int] = []
        if self.n_minifat and self.first_minifat not in (_ENDOFCHAIN, _FREESECT):
            raw = self._read_chain(self.first_minifat)
            minifat = [s for (s,) in struct.iter_unpack("<I", raw)]

        self.streams: dict[str, bytes] = {}
        for e in self.entries:
            if e["type"] != 2:
                continue
            if e["size"] < _MINI_CUTOFF:
                self.streams[e["name"]] = self._read_mini_chain(
                    mini_container, minifat, e["start"]
                )[: e["size"]]
            else:
                self.streams[e["name"]] = self._read_chain(e["start"])[: e["size"]]

    def _sector(self, n: int) -> bytes:
        off = _SECT + n * _SECT
        return self._data[off : off + _SECT]

    def _read_chain(self, start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (_ENDOFCHAIN, _FREESECT) and seen <= len(self._fat):
            out += self._sector(s)
            if s >= len(self._fat):
                break
            s = self._fat[s]
            seen += 1
        return bytes(out)

    def _read_mini_chain(self, container: bytes, minifat: list[int], start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (_ENDOFCHAIN, _FREESECT) and seen <= max(1, len(minifat)):
            out += container[s * _MINI_SECT : (s + 1) * _MINI_SECT]
            if s >= len(minifat):
                break
            s = minifat[s]
            seen += 1
        return bytes(out)


def _dir_entry(
    name: str, etype: int, start: int, size: int, left=_FREESECT, right=_FREESECT, child=_FREESECT
) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def build_cfb(streams: dict[str, bytes]) -> bytes:
    """Write a valid CFB container. Every stream is padded to the mini
    cutoff (4096) so it lives in regular sectors (no mini stream needed);
    declared sizes are the padded sizes — the formats written here (Word
    FIB offsets) ignore trailing zero padding."""
    padded = {}
    for name, body in streams.items():
        size = max(_MINI_CUTOFF, len(body))
        size = (size + _SECT - 1) // _SECT * _SECT
        padded[name] = body + b"\x00" * (size - len(body))

    # sector layout: [0]=FAT, [1]=directory, then stream chains
    n_dir_sectors = 1
    assert (1 + len(padded)) * 128 <= _SECT * n_dir_sectors
    chains: dict[str, tuple[int, int]] = {}  # name -> (start, n_sectors)
    next_sector = 1 + n_dir_sectors
    for name, body in padded.items():
        n = len(body) // _SECT
        chains[name] = (next_sector, n)
        next_sector += n
    total_sectors = next_sector
    if total_sectors > _SECT // 4:
        raise CfbError("fixture CFB writer supports a single FAT sector")

    fat = [_FREESECT] * (_SECT // 4)
    fat[0] = _FATSECT
    fat[1] = _ENDOFCHAIN  # single directory sector
    for start, n in chains.values():
        for i in range(n):
            fat[start + i] = start + i + 1 if i < n - 1 else _ENDOFCHAIN

    names = list(padded)
    # root's child points at the first stream entry; further entries chain
    # via right-sibling links (flat tree — readers accept it)
    entries = [_dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1 if names else _FREESECT)]
    for i, name in enumerate(names):
        start, _ = chains[name]
        right = i + 2 if i + 1 < len(names) else _FREESECT
        entries.append(_dir_entry(name, 2, start, len(padded[name]), right=right))
    dir_sector = b"".join(entries)
    dir_sector += b"\x00" * (_SECT * n_dir_sectors - len(dir_sector))

    header = bytearray(512)
    header[:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # first directory sector
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    body = struct.pack(f"<{_SECT // 4}I", *fat) + dir_sector
    for name in names:
        body += padded[name]
    return bytes(header) + body
