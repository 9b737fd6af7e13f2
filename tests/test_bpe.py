"""BPE tokenizer training/encoding tests.

The ground truth below (`ref_merges`, `ref_encode`) is an INDEPENDENT
re-derivation of Sennrich BPE written for these tests (dict-of-tuples
counting, per-word list rewrite) — structurally different from both
plans in docstrange_ray.ops.bpe, so agreement pins the algorithm, not
the implementation.
"""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops import bpe


def ref_merges(texts, n_merges, min_freq=2):
    wf = Counter()
    for t in texts:
        wf.update((t or "").lower().split())
    seqs = {w: tuple(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, seq in seqs.items():
            f = wf[w]
            for pair in zip(seq, seq[1:]):
                pc[pair] += f
        if not pc:
            break
        pair, best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_freq:
            break
        merges.append((pair[0], pair[1], best))
        a, b = pair
        ab = a + b
        for w, seq in list(seqs.items()):
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = tuple(out)
    return merges


def ref_encode_word(word, merges):
    seq = list(word)
    for a, b, *_ in merges:
        out, j = [], 0
        while j < len(seq):
            if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(seq[j])
                j += 1
        seq = out
    return seq


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown tree",
    "quick quick brown foxes love lazy afternoons",
    "over and over the dog jumps",
    "a bb ccc dddd eeeee",
    "",
    "the the the lowest lowest lower low",
    "unicode wörds weiß straße über",
    "x y z single chars only",
]


def docs_ds():
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    )


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    def test_pair_counts_vs_bruteforce(self):
        got = pd.DataFrame(bpe.pair_counts(docs_ds(), top_k=1000).take_all())
        pc = Counter()
        wf = Counter()
        for t in TEXTS:
            wf.update(t.lower().split())
        for w, f in wf.items():
            for a, b in zip(w, w[1:]):
                pc[(a, b)] += f
        exp = (
            pd.DataFrame(
                [(a, b, c) for (a, b), c in pc.items()],
                columns=["left_sym", "right_sym", "freq"],
            )
            .sort_values(["freq", "left_sym", "right_sym"], ascending=[False, True, True])
            .reset_index(drop=True)
        )
        got = got.sort_values(
            ["freq", "left_sym", "right_sym"], ascending=[False, True, True]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_local_plan_matches_reference(self):
        got = bpe.bpe_train(docs_ds(), n_merges=24, plan="local")
        exp = ref_merges(TEXTS, 24)
        assert list(zip(got["left_sym"], got["right_sym"], got["freq"])) == exp

    def test_distributed_plan_parity(self):
        loc = bpe.bpe_train(docs_ds(), n_merges=12, plan="local")
        dist = bpe.bpe_train(docs_ds(), n_merges=12, plan="distributed")
        pd.testing.assert_frame_equal(loc, dist)

    def test_auto_gate_picks_distributed_above_limit(self):
        # word_type_limit=1 forces the counted gate to the distributed
        # plan; output must be unchanged.
        dist = bpe.bpe_train(docs_ds(), n_merges=6, word_type_limit=1)
        loc = bpe.bpe_train(docs_ds(), n_merges=6, plan="local")
        pd.testing.assert_frame_equal(loc, dist)

    def test_tie_break_deterministic(self):
        # "ab" and "cd" tie at freq 4; ('a','b') < ('c','d') wins.
        texts = ["ab ab ab ab cd cd cd cd"]
        ds = ray.data.from_items([{"doc_id": 0, "text": texts[0]}])
        got = bpe.bpe_train(ds, n_merges=1, plan="local")
        assert (got.loc[0, "left_sym"], got.loc[0, "right_sym"]) == ("a", "b")
        assert got.loc[0, "freq"] == 4

    def test_min_freq_stops(self):
        ds = ray.data.from_items([{"doc_id": 0, "text": "abc def ghi"}])
        got = bpe.bpe_train(ds, n_merges=10, min_freq=2, plan="local")
        assert len(got) == 0  # every pair occurs once

    def test_encode_counts_vs_per_word_reference(self):
        ds = docs_ds()
        merges = bpe.bpe_train(ds, n_merges=24, plan="local")
        got = (
            pd.DataFrame(bpe.bpe_encode_counts(ds, merges).take_all())
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ml = list(zip(merges["left_sym"], merges["right_sym"]))
        for i, t in enumerate(TEXTS):
            ws = t.lower().split()
            exp_tok = sum(len(ref_encode_word(w, ml)) for w in ws)
            row = got[got["doc_id"] == i].iloc[0]
            assert row["n_words"] == len(ws)
            assert row["n_bpe_tokens"] == exp_tok, (i, t)

    def test_merge_is_boundary_safe(self):
        # After merging ('l','o'), symbol 'lo' must not merge with a
        # following 'w' unless ('lo','w') is itself learned; the regex
        # lookarounds guarantee whole-symbol matches only.
        ds = ray.data.from_items(
            [{"doc_id": 0, "text": "low low low slow slow glow"}]
        )
        merges = bpe.bpe_train(ds, n_merges=3, plan="local")
        exp = ref_merges(["low low low slow slow glow"], 3)
        assert list(zip(merges["left_sym"], merges["right_sym"], merges["freq"])) == exp

    def test_empty_corpus(self):
        ds = ray.data.from_items([{"doc_id": 0, "text": ""}])
        got = bpe.bpe_train(ds, n_merges=4, plan="local")
        assert len(got) == 0
        enc = pd.DataFrame(bpe.bpe_encode_counts(ds, got).take_all())
        assert enc.loc[0, "n_bpe_tokens"] == 0

    def test_encode_distinct_kernel(self):
        words = np.asarray(["low", "lower", "x", ""], dtype=object)
        out = bpe._encode_distinct(words, [("l", "o"), ("lo", "w")])
        assert out.tolist() == [1, 3, 1, 0]

    def test_backslash_symbols_substitute_literally(self):
        # A merged symbol containing '\1' must not be interpreted as a
        # regex group reference in the replacement template.
        words = np.asarray(["a\\1b", "low"], dtype=object)
        out = bpe._encode_distinct(
            words, [("\\", "1"), ("a", "\\1"), ("l", "o")]
        )
        assert out.tolist() == [2, 2]

    def test_backslash_corpus_end_to_end(self):
        texts = ["a\\1b a\\1b a\\1b c\\d c\\d"]
        ds = ray.data.from_items([{"doc_id": 0, "text": texts[0]}])
        loc = bpe.bpe_train(ds, n_merges=4, plan="local")
        dist = bpe.bpe_train(ds, n_merges=4, plan="distributed")
        pd.testing.assert_frame_equal(loc, dist)
        exp = ref_merges(texts, 4)
        assert list(zip(loc["left_sym"], loc["right_sym"], loc["freq"])) == exp
