"""WordPiece trainer/encoder tests.

The training reference below re-derives the loop with Counters and
fractions.Fraction (exact rational argmax) — structurally different
from ops/wordpiece's pandas/cross-multiplication path, so agreement
pins the method and the exact-selection claim.
"""

from collections import Counter
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest
import ray

from docstrange_ray.ops import wordpiece as wp

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low new wide lower newer",
] * 3


def ref_train(texts, n_merges, min_pair_freq=2):
    wf = Counter()
    for t in texts:
        wf.update(t.lower().split())
    seqs = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc, sc = Counter(), Counter()
        for w, f in wf.items():
            seq = seqs[w]
            for s in seq:
                sc[s] += f
            for a, b in zip(seq, seq[1:]):
                pc[(a, b)] += f
        cands = [
            (Fraction(p, sc[a] * sc[b]), (a, b), p, sc[a], sc[b])
            for (a, b), p in pc.items()
            if p >= min_pair_freq
        ]
        if not cands:
            break
        # max score; ties -> lexicographically smallest pair
        best = min(cands, key=lambda c: (-c[0], c[1]))
        (a, b), p, lf, rf = best[1], best[2], best[3], best[4]
        merges.append((a, b, p, lf, rf))
        merged = a + b
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = out
    return merges


def docs_ds():
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    )


class TestWordPieceTrain:
    def test_local_matches_fraction_reference(self):
        got = wp.wordpiece_train(docs_ds(), n_merges=12, plan="local")
        ref = ref_train(CORPUS, 12)
        assert len(got) == len(ref)
        for row, (a, b, p, lf, rf) in zip(got.itertuples(index=False), ref):
            assert (row.left_sym, row.right_sym, row.pair_freq,
                    row.left_freq, row.right_freq) == (a, b, p, lf, rf)

    def test_distributed_plan_parity(self):
        loc = wp.wordpiece_train(docs_ds(), n_merges=10, plan="local")
        dist = wp.wordpiece_train(docs_ds(), n_merges=10, plan="distributed")
        pd.testing.assert_frame_equal(
            loc.reset_index(drop=True), dist.reset_index(drop=True)
        )

    def test_score_beats_raw_frequency(self):
        """The defining WordPiece property: a rare-but-exclusive pair
        outranks a frequent-but-promiscuous one."""
        texts = ["xy xy xy", "a b a c a d a e a f a g"]  # 'xy' exclusive
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        got = wp.wordpiece_train(ds, n_merges=1, min_pair_freq=2, plan="local")
        assert (got["left_sym"].iloc[0], got["right_sym"].iloc[0]) == ("x", "y")


class TestWordPieceEncode:
    def test_greedy_longest_match(self):
        init = {"unaff", "un", "aff", "able", "ffable"}
        cont = {"affable", "able", "ff"}
        # greedy: 'unaff' (longest initial), then 'able' as continuation
        assert wp.wordpiece_encode("unaffable", init, cont) == [
            "unaff", "##able"]

    def test_char_fallback_never_unk(self):
        assert wp.wordpiece_encode("zq", set(), set()) == ["z", "##q"]

    def test_counts_pipeline_matches_loop(self):
        merges = wp.wordpiece_train(docs_ds(), n_merges=8, plan="local")
        got = wp.wordpiece_encode_counts(docs_ds(), merges).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        init, cont = wp.wordpiece_vocab(merges)
        for i, t in enumerate(CORPUS):
            exp = sum(
                len(wp.wordpiece_encode(w, init, cont))
                for w in t.lower().split()
            )
            assert int(got.loc[i, "n_tokens"]) == exp


class TestPairStats:
    def test_matches_fraction_reference_round0(self):
        got = wp.pair_stats(docs_ds(), top_k=20).to_pandas()
        ref = ref_train(CORPUS, 1)  # round-0 stats = first merge's view
        a, b, p, lf, rf = ref[0]
        top = got.iloc[0]
        assert (top["left_sym"], top["right_sym"]) == (a, b)
        assert (int(top["pair_freq"]), int(top["left_freq"]),
                int(top["right_freq"])) == (p, lf, rf)
        # scores non-increasing
        s = got["pair_freq"] / (got["left_freq"] * got["right_freq"])
        assert (np.diff(s.to_numpy()) <= 1e-15).all()


class TestEncodeUnkRule:
    def test_overlong_word_becomes_unk(self):
        # BERT's max_input_chars_per_word rule
        assert wp.wordpiece_encode("x" * 65, set(), set()) == ["[UNK]"]
        assert wp.wordpiece_encode("x" * 64, set(), set()) != ["[UNK]"]
