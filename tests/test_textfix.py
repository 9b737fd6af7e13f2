"""Encoding repair + NFC normalization (ops/textfix.py)."""

import pyarrow as pa
import pytest

import ray

from docstrange_ray.ops.textfix import (
    badness,
    fix_mojibake,
    fix_text_encoding,
    nfc_normalize,
    normalize_nfc,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _mojibake(s: str) -> str:
    """The corruption under repair: UTF-8 bytes mis-decoded by a lenient
    cp1252 reader (the five cp1252 holes come through as C1 controls —
    ftfy's 'sloppy windows-1252' model, mirrored in the module)."""
    from docstrange_ray.ops.textfix import sloppy_cp1252_decode

    return sloppy_cp1252_decode(s.encode("utf-8"))


class TestFixTextEncoding:
    def test_classic_accent_mojibake(self):
        assert fix_text_encoding("cafÃ©") == "café"  # 'Ã©' -> 'é'

    def test_roundtrip_inverts_corruption(self):
        for s in [
            "café crème brûlée",
            "niño piñata jalapeño",
            "em — dash and “quotes”",
            "façade á ö ü",
        ]:
            assert fix_text_encoding(_mojibake(s)) == s

    def test_double_encoded_needs_two_passes(self):
        s = "résumé"
        twice = _mojibake(_mojibake(s))
        assert fix_text_encoding(twice) == s
        # one pass only gets halfway
        assert fix_text_encoding(twice, max_passes=1) == _mojibake(s)

    def test_clean_accented_text_untouched(self):
        # genuinely-accented text must NOT be "repaired": its cp1252
        # bytes are not valid UTF-8 (é alone = E9) or non-improving
        for s in ["café", "naïve résumé", "über"]:
            assert fix_text_encoding(s) == s

    def test_ascii_fast_path_identity(self):
        assert fix_text_encoding("plain ascii text.") == "plain ascii text."

    def test_unmappable_char_untouched(self):
        # U+2206 is in neither cp1252 nor latin-1: no repair attempted
        s = "area ∆x grows"
        assert fix_text_encoding(s) == s

    def test_badness_scores(self):
        assert badness("plain") == 0
        assert badness("café") == 0  # real accent is not suspect
        assert badness("Ã©") == 1  # the mojibake marker 'Ã'
        assert badness("â€”") >= 1  # 'â€”' em-dash mojibake


class TestNfc:
    def test_recomposes_combining_mark(self):
        assert nfc_normalize("café") == "café"

    def test_ascii_identity(self):
        assert nfc_normalize("abc") == "abc"

    def test_already_composed_identity(self):
        assert nfc_normalize("café") == "café"


class TestDatasetOps:
    def test_fix_mojibake_ds(self):
        clean = ["café one", "plain two", "naïve three"]
        corrupted = [_mojibake(clean[0]), clean[1], _mojibake(clean[2])]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": [1, 2, 3], "text": corrupted})
        )
        got = {r["doc_id"]: r["text"] for r in fix_mojibake(ds).take_all()}
        assert got == {1: clean[0], 2: clean[1], 3: clean[2]}

    def test_normalize_nfc_ds_preserves_other_columns(self):
        ds = ray.data.from_arrow(
            pa.table(
                {"doc_id": [1, 2], "text": ["étude", "plain"], "n": [7, 8]}
            )
        )
        rows = sorted(normalize_nfc(ds).take_all(), key=lambda r: r["doc_id"])
        assert rows[0]["text"] == "étude"
        assert rows[1]["text"] == "plain"
        assert [r["n"] for r in rows] == [7, 8]


class TestFuzzRoundtrip:
    def test_random_latin_text_roundtrips(self):
        # any text over latin-1/cp1252-mappable chars must be exactly
        # recovered from its lenient mis-decode
        import random

        rng = random.Random(42)
        alphabet = (
            "abcdefghij ,.!?"
            "éèüñçöáâê"
            "—’“”…€"
        )
        for _ in range(200):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
            got = fix_text_encoding(_mojibake(s))
            assert got == s, (s, _mojibake(s), got)
