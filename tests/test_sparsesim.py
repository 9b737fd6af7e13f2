"""Sparse tf-idf cosine join (ops/sparsesim.py): pinned against a
brute-force all-pairs reference (different algorithm, identical
integer arithmetic), plus the lemma-level properties — stop-word
suppression via idf and the conservative prefix filter."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from docstrange_ray.numerics import round6


pytestmark = pytest.mark.usefixtures("ray_session")

NUM, DEN, Q = 35, 100, 1000


def _corpus(rng, n=50, vocab=40):
    words = [f"w{i}" for i in rng.integers(0, 10**6, vocab)]
    texts, ids = [], []
    for i in range(n):
        k = rng.integers(5, 15)
        texts.append(" ".join(rng.choice(words, k)))
        ids.append(i)
    return ids, texts


def _ds(ids, texts, parts=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(parts)


def _brute(ids, texts, num=NUM, den=DEN, q=Q):
    n = len(ids)
    tf, df = {}, {}
    for i, t in zip(ids, texts):
        c: dict = {}
        for w in t.lower().split():
            c[w] = c.get(w, 0) + 1
        tf[i] = c
        for w in c:
            df[w] = df.get(w, 0) + 1
    idf = {
        w: int(math.floor(math.log(n / d) * q + 0.5)) for w, d in df.items()
    }
    vec = {i: {w: c * idf[w] for w, c in tf[i].items()} for i in ids}
    n2 = {i: sum(v * v for v in vec[i].values()) for i in ids}
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sorted((ids[x], ids[y]))
            if n2[a] == 0 or n2[b] == 0:
                continue
            dot = sum(vec[a][w] * vec[b].get(w, 0) for w in vec[a])
            if dot < 0 or den * den * dot * dot < num * num * n2[a] * n2[b]:
                continue
            out[(a, b)] = (
                dot,
                float(round6(dot / math.sqrt(float(n2[a]) * float(n2[b])))),
            )
    return out


class TestTfidfCosineJoin:
    def test_matches_brute(self):
        from docstrange_ray.ops.sparsesim import tfidf_cosine_join

        rng = np.random.default_rng(3)
        ids, texts = _corpus(rng)
        # planted near-identical pair + a universal stop word
        texts.append("alpha beta gamma delta epsilon zeta")
        texts.append("alpha beta gamma delta epsilon eta")
        ids += [100, 101]
        texts = [t + " the" for t in texts]
        got = {
            (r["a"], r["b"]): (r["dot_q"], r["cos6"])
            for r in tfidf_cosine_join(
                _ds(ids, texts), NUM, DEN, Q
            ).take_all()
        }
        ref = _brute(ids, texts)
        assert got == ref
        assert (100, 101) in got and got[(100, 101)][1] > 0.5

    def test_stop_word_only_overlap_scores_zero(self):
        """Docs sharing ONLY a universal word: idf('the') = ln(1) = 0,
        weight 0, dot 0 — no pair at any positive threshold."""
        from docstrange_ray.ops.sparsesim import tfidf_cosine_join

        ids = [1, 2, 3]
        texts = ["the apple fruit", "the car engine", "the piano music"]
        got = tfidf_cosine_join(_ds(ids, texts, 2), 10, 100, Q).take_all()
        assert got == []

    def test_identical_docs_cos_one(self):
        from docstrange_ray.ops.sparsesim import tfidf_cosine_join

        ids = [7, 8, 9]
        texts = ["alpha beta gamma", "alpha beta gamma", "unrelated words here"]
        got = {
            (r["a"], r["b"]): r["cos6"]
            for r in tfidf_cosine_join(_ds(ids, texts, 2), 90, 100, Q).take_all()
        }
        assert got == {(7, 8): 1.0}

    def test_threshold_monotone(self):
        """Raising the threshold can only shrink the pair set, and the
        survivors are exactly the high-cos subset of the loose run."""
        from docstrange_ray.ops.sparsesim import tfidf_cosine_join

        rng = np.random.default_rng(11)
        ids, texts = _corpus(rng, n=40, vocab=25)
        ds = _ds(ids, texts)
        loose = {
            (r["a"], r["b"]): r["cos6"]
            for r in tfidf_cosine_join(ds, 30, 100, Q).take_all()
        }
        tight = {
            (r["a"], r["b"]): r["cos6"]
            for r in tfidf_cosine_join(ds, 60, 100, Q).take_all()
        }
        assert set(tight) <= set(loose)
        brute60 = _brute(ids, texts, 60, 100, Q)
        assert tight == {k: v for k, v in loose.items() if k in brute60}
