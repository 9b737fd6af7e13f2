"""Clipped n-gram pair overlap (BLEU/ROUGE numerators): pinned
against an independent per-pair reference that counts via sorted
gram lists (no Counter), plus invariants (identity pairs saturate,
matches bounded by both totals, short-doc zero-gram convention)."""

import pandas as pd
import pyarrow as pa
import ray

from docstrange_ray.ops.overlap import pair_ngram_overlap


def _ref_overlap(ta, tb, n):
    """Sorted-list two-pointer min-count intersection (independent of
    the Counter kernel)."""
    def grams(t):
        ws = t.lower().split()
        if n == 1:
            return sorted(ws)
        return sorted(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    ga, gb = grams(ta), grams(tb)
    i = j = m = 0
    while i < len(ga) and j < len(gb):
        if ga[i] == gb[j]:
            m += 1
            i += 1
            j += 1
        elif ga[i] < gb[j]:
            i += 1
        else:
            j += 1
    return m, len(ga), len(gb)


def _run(texts, pairs, orders=(1, 2)):
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(3)
    pr = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["doc_id_a", "doc_id_b"])
    )
    return (
        pair_ngram_overlap(docs, pr, orders=orders)
        .to_pandas()
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )


TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the hat and the cat ran",
    "a completely different sentence here",
    "the the the the",
    "one",
    "",
    "ONE",
]


def test_matches_sorted_list_reference():
    pairs = [(0, 1), (0, 2), (1, 3), (3, 3), (4, 6), (5, 0)]
    got = _run(TEXTS, pairs)
    for _, r in got.iterrows():
        for n in (1, 2):
            m, ta, tb = _ref_overlap(
                TEXTS[int(r.doc_id_a)], TEXTS[int(r.doc_id_b)], n
            )
            assert (r[f"m{n}"], r[f"total{n}_a"], r[f"total{n}_b"]) == (
                m, ta, tb
            ), (r.doc_id_a, r.doc_id_b, n)


def test_identity_pair_saturates():
    got = _run(TEXTS, [(1, 1)])
    r = got.iloc[0]
    assert r.m1 == r.total1_a == r.total1_b == 10
    assert r.m2 == r.total2_a == r.total2_b == 9


def test_clipping_counts_repeats_min():
    # 'the' x3 in a, x4 in b -> clipped match 3
    got = _run(["the the the", "the the the the x"], [(0, 1)])
    assert got.iloc[0].m1 == 3


def test_bounds_and_short_docs():
    got = _run(TEXTS, [(4, 5), (4, 4), (0, 4)])
    for _, r in got.iterrows():
        for n in (1, 2):
            assert r[f"m{n}"] <= min(r[f"total{n}_a"], r[f"total{n}_b"])
    one = got[(got.doc_id_a == 4) & (got.doc_id_b == 4)].iloc[0]
    assert one.total2_a == 0 and one.m2 == 0  # 1-word doc: no bigrams
    empty = got[(got.doc_id_a == 4) & (got.doc_id_b == 5)].iloc[0]
    assert empty.total1_b == 0 and empty.m1 == 0


def test_case_folding():
    got = _run(TEXTS, [(4, 6)])
    assert got.iloc[0].m1 == 1  # 'one' vs 'ONE' matches after lower()
