"""Encoding repair + unicode normalization (the ftfy/Dolma cleanup family).

Web corpora are full of MOJIBAKE: UTF-8 byte sequences that were at
some point decoded as cp1252/latin-1, turning ``é`` (C3 A9) into
``Ã©``. The reference ingests already-clean text; a 100-TB crawl
pipeline cannot assume that, so this module provides the standard
repair pass (the core trick of ftfy — Speer 2019, "ftfy: fixes text
for you" — reimplemented from scratch):

    repair(s) = sloppy_cp1252_encode(s).decode('utf-8'),
    accepted only when the bytes decode as valid UTF-8 containing a
    multi-byte sequence (i.e. the decode is strictly shorter),
    repeated up to ``max_passes`` times for doubly-encoded text.

Acceptance-gated repair is what makes the pass safe to run corpus-wide:
legitimately-accented text ("café") re-encodes to bytes that are NOT
valid UTF-8 (the accent is followed by an ASCII letter, an illegal
continuation) and is left alone; only genuine mojibake passes the
decode. ``badness()`` is kept as the mojibake-rate STATISTIC (marker
chars + C1 controls), not the gate. Both ops are pure per-row functions (shuffle-free
scans) with an ``isascii()`` fast path — ASCII rows (the overwhelming
majority of a real corpus) never enter the slow path.

SQL-oracle strategy: the driver queries corrupt the (all-ASCII) test
corpus DETERMINISTICALLY inside the Ray plan (accent injection +
cp1252 mis-decode) and the oracle rebuilds the expected CLEAN text
arithmetically — so the repair must actually invert the corruption,
not merely leave text unchanged.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa

# Chars that are individually rare in clean text but appear as the
# cp1252 rendering of UTF-8 lead/continuation bytes: C3/C2/C5/C6/CE/
# CF/D0/D1 leads, 80-9F continuations (cp1252 punctuation block), and
# the replacement char. Counting THEM (not all non-ASCII) keeps real
# accented text from looking broken.
_SUSPECT = set("ÃÂÅÆÊÎÏÐÑ�") | {
    "€", "‚", "ƒ", "„", "…", "†", "‡", "ˆ", "‰", "Š", "‹", "Œ", "Ž",
    "‘", "’", "“", "”", "•", "–", "—", "˜", "™", "š", "›", "œ", "ž", "Ÿ",
}
_C1 = {chr(c) for c in range(0x80, 0xA0)}


def badness(s: str) -> int:
    """Deterministic mojibake score: count of suspect marker chars +
    raw C1 controls + replacement chars."""
    return sum(1 for ch in s if ch in _SUSPECT or ch in _C1)


def sloppy_cp1252_encode(s: str) -> bytes | None:
    """ftfy's "sloppy windows-1252" idea: cp1252 with the five unmapped
    bytes (81 8D 8F 90 9D) passed through as raw C1 controls — because
    that is exactly what a lenient decoder produced when the mojibake
    happened. Chars <= U+00FF not in cp1252 take their latin-1 byte;
    anything higher that cp1252 cannot encode aborts (returns None):
    that char cannot have come from a single-byte mis-decode."""
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if 0x80 <= o <= 0x9F:
            out.append(o)
            continue
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            if o <= 0xFF:
                out.append(o)
            else:
                return None
    return bytes(out)


def sloppy_cp1252_decode(b: bytes) -> str:
    """Inverse direction (what the lenient mis-decoder did): cp1252 with
    the five holes decoded as C1 controls."""
    return "".join(
        chr(x) if x in _CP1252_HOLES else bytes([x]).decode("cp1252")
        for x in b
    )


_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def fix_text_encoding(s: str, max_passes: int = 2) -> str:
    """Repair cp1252/latin-1 mojibake; returns the input unchanged when
    no repair is justified. Deterministic.

    Acceptance rule (ftfy's core heuristic): if the sloppy-cp1252
    re-encoding of the text decodes as VALID UTF-8 with at least one
    multi-byte sequence (=> the decode is strictly shorter), it almost
    certainly WAS UTF-8 — the probability of natural single-byte text
    forming valid multi-byte UTF-8 is negligible (every accented char
    would have to be followed by exactly a continuation-image char;
    'café', 'naïve', 'über' all fail the decode and are left alone).
    """
    for _ in range(max_passes):
        if s.isascii():
            return s
        raw = sloppy_cp1252_encode(s)
        if raw is None:
            return s
        try:
            cand = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if len(cand) >= len(s):
            return s
        s = cand
    return s


def nfc_normalize(s: str) -> str:
    """NFC with an ASCII fast path (ASCII is NFC-invariant)."""
    if s.isascii():
        return s
    return unicodedata.normalize("NFC", s)


def _map_text(ds, fn, col: str = "text"):
    def apply(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        fixed = [fn(t) for t in texts]
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pa.array(fixed, pa.string()))

    return ds.map_batches(apply, batch_format="pyarrow")


def fix_mojibake(ds, col: str = "text", max_passes: int = 2):
    """Shuffle-free encoding-repair scan over ``col``."""
    return _map_text(ds, lambda s: fix_text_encoding(s, max_passes), col)


def normalize_nfc(ds, col: str = "text"):
    """Shuffle-free NFC normalization scan over ``col``."""
    return _map_text(ds, nfc_normalize, col)
