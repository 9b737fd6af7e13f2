"""Perceptual image dedup (ops/imagedup.py): dHash kernel pinned
against an independent brute-force reference, invariance properties,
decode-failure sentinel path, and pairing completeness vs an all-pairs
scan (the pigeonhole blocking guarantee for hamming <= 3)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from docstrange_ray.ops.imagedup import (
    _SENTINEL,
    dhash_gray,
    image_dhash_table,
    image_near_dup_pairs,
)
from docstrange_ray.synth_files import make_png_gray


def _brute_dhash(img, rows=8, cols=8):
    h, w = img.shape
    out = 0
    for r in range(rows):
        for c in range(cols - 1):
            def cell(rr, cc):
                y0, y1 = rr * h // rows, (rr + 1) * h // rows
                x0, x1 = cc * w // cols, (cc + 1) * w // cols
                return int(img[y0:y1, x0:x1].astype(int).sum()), (y1 - y0) * (x1 - x0)

            sa, na = cell(r, c)
            sb, nb = cell(r, c + 1)
            if sa * nb > sb * na:
                out |= 1 << (r * 7 + c)
    return out


def _fixture_pixels(i):
    b = i - 1 if i % 10 == 9 else i
    y, x = np.mgrid[0:32, 0:32]
    p = ((7 + (b * 13) % 97) * y + (5 + (b * 29) % 89) * x + y * x + b) % 256
    if i % 10 == 9:
        m = (y < 4) & (x < 4)
        p = np.where(m, np.minimum(p + 100, 255), p)
    return p.astype(np.uint8)


class TestDhashKernel:
    def test_matches_brute_reference(self):
        for seed in range(4):
            for shape in [(32, 32), (17, 23), (8, 8), (100, 37), (9, 65)]:
                img = np.random.default_rng(seed).integers(
                    0, 256, size=shape
                ).astype(np.uint8)
                assert dhash_gray(img) == _brute_dhash(img), (seed, shape)

    def test_56_bit_positive(self):
        img = np.zeros((8, 8), dtype=np.uint8)
        img[:, ::2] = 255  # alternating columns: every comparison fires
        h = dhash_gray(img)
        assert 0 <= h < (1 << 56)

    def test_brightness_contrast_invariant(self):
        # invariance holds for EXACT affine transforms a*x + b (a > 0):
        # the cross-multiplied sum comparison cancels both a and b.
        # (Floor-divided "contrast" like x // 2 is NOT affine and can
        # legitimately flip near-tie comparisons.)
        img = np.random.default_rng(1).integers(0, 200, size=(32, 32)).astype(np.int64)
        assert dhash_gray(img) == dhash_gray(img * 3 + 20)

    def test_single_cell_perturbation_flips_at_most_two_bits(self):
        img = np.random.default_rng(2).integers(0, 150, size=(32, 32)).astype(np.uint8)
        pert = img.copy()
        pert[8:12, 8:12] = np.minimum(pert[8:12, 8:12].astype(int) + 100, 255).astype(
            np.uint8
        )  # exactly cell (2, 2): left operand of one comparison, right of another
        assert bin(dhash_gray(img) ^ dhash_gray(pert)).count("1") <= 2

    def test_too_small_raises(self):
        with pytest.raises(ValueError, match="smaller"):
            dhash_gray(np.zeros((4, 32), dtype=np.uint8))


class TestImageDedup:
    def _media_ds(self, n=80):
        rows = [
            {"img_id": i, "payload": make_png_gray(_fixture_pixels(i))}
            for i in range(n)
        ]
        rows.append({"img_id": n, "payload": b"JUNK not an image"})
        return ray.data.from_items(rows), rows

    def test_hash_table_and_sentinel(self, ray_session):
        ds, rows = self._media_ds()
        got = {
            r["img_id"]: (r["dhash"], r["ok"])
            for r in image_dhash_table(ds, id_col="img_id").take_all()
        }
        for i in range(80):
            assert got[i] == (dhash_gray(_fixture_pixels(i)), True)
        assert got[80] == (_SENTINEL, False)

    def test_pairs_complete_vs_brute(self, ray_session):
        ds, _ = self._media_ds()
        hs = {i: dhash_gray(_fixture_pixels(i)) for i in range(80)}
        brute = sorted(
            (a, b, bin(hs[a] ^ hs[b]).count("1"))
            for a, b in itertools.combinations(range(80), 2)
            if bin(hs[a] ^ hs[b]).count("1") <= 3
        )
        got = sorted(
            (r["doc_id_a"], r["doc_id_b"], r["hamming"])
            for r in image_near_dup_pairs(ds, max_hamming=3, id_col="img_id").take_all()
        )
        assert got == brute
        # every planted brightened-cell copy is found
        planted = {(i - 1, i) for i in range(9, 80, 10)}
        assert planted <= {(a, b) for a, b, _ in got}


class TestCrossFormat:
    def test_same_pixels_hash_identically_across_containers(self, ray_session):
        """The dedup case byte-level hashing can never see: one image
        stored as PNG, BMP and TIFF (lossless containers) produces ONE
        dhash and pairs at hamming 0."""
        from docstrange_ray.synth_files import make_bmp_gray, make_tiff_gray

        px = _fixture_pixels(3)
        ds = ray.data.from_items(
            [
                {"img_id": 0, "payload": make_png_gray(px)},
                {"img_id": 1, "payload": make_bmp_gray(px)},
                {"img_id": 2, "payload": make_tiff_gray(px)},
                {"img_id": 3, "payload": make_png_gray(_fixture_pixels(40))},
            ]
        )
        hs = {
            r["img_id"]: r["dhash"]
            for r in image_dhash_table(ds, id_col="img_id").take_all()
        }
        assert hs[0] == hs[1] == hs[2] != hs[3]
        pairs = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in image_near_dup_pairs(ds, max_hamming=0, id_col="img_id").take_all()
        }
        assert pairs == {(0, 1), (0, 2), (1, 2)}


class TestHotBucketExactness:
    def test_65_plus_copies_emit_all_pairs(self, ray_session):
        """Review finding: the inherited MAX_BUCKET_PAIRWISE=64 star cap
        silently broke pigeonhole completeness for 65+ copies of one
        image — exactly the primary dedup target. bucket_cap=None makes
        the pair set the full clique."""
        px = _fixture_pixels(1)
        n = 70
        ds = ray.data.from_items(
            [{"img_id": i, "payload": make_png_gray(px)} for i in range(n)]
        )
        pairs = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in image_near_dup_pairs(ds, max_hamming=0, id_col="img_id").take_all()
        }
        assert len(pairs) == n * (n - 1) // 2  # full clique, not a star
        assert (1, 2) in pairs  # the pair a star cap would lose
