"""Hard-EM PLSA: the distributed trainer is pinned assignment-for-
assignment against an independent pure-Python dict/Counter reference
(same math, structurally unrelated plan), plus partitioning
invariance, determinism, OOV-floor behavior, and doc_topics/
topic_top_words reductions."""

from collections import Counter

import pandas as pd
import pytest
import ray

from docstrange_ray.numerics import md5_key52
from docstrange_ray.ops.topics import (
    SCALE,
    build_plsa_table,
    doc_topics,
    plsa_train,
    topic_top_words,
    topic_word_counts,
)


def _ref_plsa(texts, k, iters, vocab_limit=10**9):
    """Reference: {doc_id: {word: [occ, z]}} with synchronous updates."""
    state = {}
    for d, t in enumerate(texts):
        cnt = Counter(t.lower().split())
        state[d] = {w: [c, md5_key52(f"{d} {w}") % k] for w, c in cnt.items()}
    for _ in range(iters):
        nwz, nz, vocab = Counter(), Counter(), Counter()
        for d, ws in state.items():
            for w, (occ, z) in ws.items():
                nwz[(w, z)] += occ
                nz[z] += occ
                vocab[w] += occ
        if not vocab:
            break
        V = len(vocab)
        keep = set(sorted(vocab, key=lambda w: (-vocab[w], w))[:vocab_limit])
        den = [nz[z] + V for z in range(k)]
        new_state = {}
        for d, ws in state.items():
            ndz = Counter()
            for w, (occ, z) in ws.items():
                ndz[z] += occ
            new_ws = {}
            for w, (occ, _z) in ws.items():
                best = None
                for z in range(k):
                    c = nwz[(w, z)] if w in keep else 0
                    wgt = (SCALE * (c + 1)) // den[z]
                    s = (ndz[z] + 1) * wgt
                    if best is None or s > best[0]:
                        best = (s, z)
                new_ws[w] = [occ, best[1]]
            new_state[d] = new_ws
        state = new_state
    return state


TEXTS = [
    "apple banana apple cherry",
    "banana banana cherry date",
    "dog emu dog fox",
    "emu fox fox dog dog",
    "apple dog mixed banana fox",
    "",
    "single",
    "apple apple apple apple",
]


def _docs(texts, parts=3):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(parts)


def _got_state(table):
    out = {}
    for r in table.to_pandas().itertuples():
        out[int(r.doc_id)] = {
            w: [int(o), int(z)]
            for w, o, z in zip(r.words, r.occs, r.zs)
        }
    return out


@pytest.mark.parametrize("k,iters", [(2, 1), (3, 3), (6, 4)])
def test_matches_reference(k, iters):
    table = plsa_train(_docs(TEXTS), k=k, iters=iters)
    assert _got_state(table) == _ref_plsa(TEXTS, k, iters)


def test_partitioning_invariance():
    a = _got_state(plsa_train(_docs(TEXTS, parts=1), k=3, iters=2))
    b = _got_state(plsa_train(_docs(TEXTS, parts=7), k=3, iters=2))
    assert a == b


def test_vocab_limit_oov_floor():
    # with vocab_limit=1 only the top word keeps a learned weight; the
    # reference applies the same OOV floor, so results still agree
    table = plsa_train(_docs(TEXTS), k=3, iters=2, vocab_limit=1)
    assert _got_state(table) == _ref_plsa(TEXTS, 3, 2, vocab_limit=1)


def test_init_counts_match_reference():
    got = (
        topic_word_counts(build_plsa_table(_docs(TEXTS), 4), 4)
        .to_pandas()
        .sort_values(["w", "z"])
        .reset_index(drop=True)
    )
    ref = Counter()
    for d, t in enumerate(TEXTS):
        for w, c in Counter(t.lower().split()).items():
            ref[(w, md5_key52(f"{d} {w}") % 4)] += c
    assert {(r.w, r.z): r.c for r in got.itertuples()} == dict(ref)


def test_doc_topics_and_top_words():
    table = plsa_train(_docs(TEXTS), k=3, iters=3)
    dt = doc_topics(table, 3).to_pandas().set_index("doc_id")
    state = _got_state(table)
    for d, ws in state.items():
        ndz = Counter()
        tot = 0
        for w, (occ, z) in ws.items():
            ndz[z] += occ
            tot += occ
        row = dt.loc[d]
        if not ws:
            assert row["topic"] == -1 and row["total_tokens"] == 0
            continue
        best = min((z for z in ndz), key=lambda z: (-ndz[z], z))
        assert row["topic"] == best
        assert row["topic_tokens"] == ndz[best]
        assert row["total_tokens"] == tot
    tw = topic_top_words(table, 3, m=2).to_pandas()
    # ranks are 1..m per topic, ordered by (c desc, w asc)
    for z, grp in tw.groupby("z"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        key = list(zip(-grp["c"], grp["w"]))
        assert key == sorted(key)
