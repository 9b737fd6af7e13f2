"""Kneser-Ney trigram scoring (ops/kneser.py): hand-derivable fixture,
Fraction-exact independent reference, fluency ordering, min-length,
parallelism invariance."""

from fractions import Fraction

import math

import pandas as pd
import pytest

import ray.data

from docstrange_ray.ops.kneser import D, kn_score, trigram_types

pytestmark = pytest.mark.usefixtures("ray_session")


def _ref_bits(rows):
    """Independent exact-Fraction KN reference (probabilities in
    rationals except the final discount arithmetic, which mirrors the
    documented float chain only at the end)."""
    tris = {}
    for r in rows:
        ws = r["text"].lower().split()
        for k in zip(ws, ws[1:], ws[2:]):
            tris[k] = tris.get(k, 0) + 1
    c12, n3, n1 = {}, {}, {}
    for (a, b, c), v in tris.items():
        c12[(a, b)] = c12.get((a, b), 0) + v
        n3[(a, b)] = n3.get((a, b), 0) + 1
        n1[(b, c)] = n1.get((b, c), 0) + 1
    mt, ty, nc = {}, {}, {}
    for (b, c), v in n1.items():
        mt[b] = mt.get(b, 0) + v
        ty[b] = ty.get(b, 0) + 1
        nc[c] = nc.get(c, 0) + 1
    B = len(n1)
    out = {}
    for r in rows:
        ws = r["text"].lower().split()
        if len(ws) < 3:
            continue
        bits = []
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            p3 = nc[c] / B
            p23 = max(n1[(b, c)] - D, 0.0) / mt[b] + D * ty[b] / mt[b] * p3
            p = (
                max(tris[(a, b, c)] - D, 0.0) / c12[(a, b)]
                + D * n3[(a, b)] / c12[(a, b)] * p23
            )
            bits.append(-math.log2(p))
        s = sum(bits) / len(bits)
        out[r["doc_id"]] = round(
            math.copysign(math.floor(abs(s) * 1e6 + 0.5) / 1e6, s), 6
        )
    return out


def _rows():
    fluent = "the cat sat on the mat and the cat ran to the mat again"
    return [
        {"doc_id": f"f{i}", "text": fluent} for i in range(6)
    ] + [
        {"doc_id": "g0", "text": "mat the on ran cat again to sat and the"},
        {"doc_id": "s0", "text": "one two"},  # < 3 words: no row
    ]


class TestKnScore:
    def test_matches_fraction_reference(self):
        rows = _rows()
        got = pd.DataFrame(
            kn_score(ray.data.from_items(rows).repartition(3)).take_all()
        )
        exp = _ref_bits(rows)
        by = dict(zip(got["doc_id"], got["bits_per_trigram"]))
        assert set(by) == set(exp)  # s0 excluded on both sides
        for d, v in exp.items():
            assert by[d] == pytest.approx(v, abs=2e-6), d

    def test_repeated_docs_score_lower_than_scrambled(self):
        rows = _rows()
        got = pd.DataFrame(kn_score(ray.data.from_items(rows)).take_all())
        by = dict(zip(got["doc_id"], got["bits_per_trigram"]))
        assert by["f0"] < by["g0"]  # repeated phrasing = fewer bits

    def test_parallelism_invariant(self):
        rows = _rows()
        a = pd.DataFrame(
            kn_score(ray.data.from_items(rows).repartition(2)).take_all()
        ).sort_values("doc_id").reset_index(drop=True)
        b = pd.DataFrame(
            kn_score(ray.data.from_items(rows).repartition(7)).take_all()
        ).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_trigram_types_exact(self):
        rows = [{"doc_id": "a", "text": "x y z x y z"}]
        tri = pd.DataFrame(
            trigram_types(ray.data.from_items(rows)).take_all()
        )
        got = {
            (r.w1, r.w2, r.w3): r.c for r in tri.itertuples(index=False)
        }
        assert got == {
            ("x", "y", "z"): 2,
            ("y", "z", "x"): 1,
            ("z", "x", "y"): 1,
        }

    def test_min_count_prune(self):
        rows = [{"doc_id": "a", "text": "x y z x y z"},
                {"doc_id": "b", "text": "p q r"}]
        got = pd.DataFrame(
            kn_score(ray.data.from_items(rows), trigram_min_count=2).take_all()
        )
        by = dict(zip(got["doc_id"], got["bits_per_trigram"]))
        # only (x,y,z) survives the prune; doc b's trigram is unseen
        # and bottoms out at the eps floor (large bits)
        assert by["b"] > by["a"]
        assert by["b"] > 30  # -log2(eps) ≈ 39.86
