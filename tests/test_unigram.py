"""Unigram-LM tokenizer training/encoding tests.

`ref_train` / `ref_viterbi` below are an INDEPENDENT re-derivation of
the module's documented semantics (Counter-based seed counting,
recursive-free DP over candidate tables) — structurally different from
docstrange_ray.ops.unigram, so agreement pins the algorithm, not the
implementation.
"""

from collections import Counter

import math

import pandas as pd
import pytest
import ray

from docstrange_ray.ops import unigram


def ref_viterbi(word, logp, max_len):
    """Independent DP: builds the candidate table per cell and picks by
    the documented per-cell order (score DESC, n_pieces ASC, arriving
    piece ASC)."""
    n = len(word)
    cells = {0: (0.0, 0, [])}
    for i in range(1, n + 1):
        cands = []
        for L in range(1, min(max_len, i) + 1):
            j = i - L
            if j not in cells:
                continue
            piece = word[j:i]
            if piece not in logp:
                continue
            s, np_, seq = cells[j]
            cands.append((-(s + logp[piece]), np_ + 1, piece, seq + [piece]))
        if cands:
            cands.sort(key=lambda c: (c[0], c[1], c[2]))
            best = cands[0]
            cells[i] = (-best[0], best[1], best[3])
    if n > 0 and n not in cells:
        return list(word), -math.inf
    return (cells[n][2], cells[n][0]) if n else ([], 0.0)


def ref_train(texts, vocab_size, max_len, seed_size, n_iters, shrink):
    wf = Counter()
    for t in texts:
        wf.update((t or "").lower().split())
    counts = Counter()
    for w, f in wf.items():
        for L in range(1, max_len + 1):
            for st in range(len(w) - L + 1):
                counts[w[st : st + L]] += f

    def prune(c, keep):
        chars = {p: v for p, v in c.items() if len(p) == 1}
        multi = sorted(
            ((p, v) for p, v in c.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(keep - len(chars), 0)]
        out = dict(chars)
        out.update(multi)
        return out

    def mstep(c):
        tot = sum(c.values())
        return {p: math.log(v) - math.log(tot) for p, v in c.items() if v > 0}

    counts = prune(counts, seed_size)
    logp = mstep(counts)
    size = len(counts)
    for _ in range(n_iters):
        ec = Counter()
        for w, f in wf.items():
            for p in ref_viterbi(w, logp, max_len)[0]:
                ec[p] += f
        size = max(vocab_size, int(size * shrink))
        ec = prune(ec, size)
        logp = mstep(ec)
        if len(ec) <= vocab_size:
            break
    return logp


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown tree",
    "quick quick brown foxes love lazy afternoons",
    "over and over the dog jumps",
    "lowering the lowest lower low lowland",
    "",
    "unicode wörds weiß straße über",
    "aaaa aaaa aaaa bbbb",
]


def docs_ds():
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    )


@pytest.mark.usefixtures("ray_session")
class TestUnigram:
    def test_seed_counts_vs_bruteforce(self):
        got = pd.DataFrame(
            unigram.seed_counts(docs_ds(), max_piece_len=3, top_k=10_000).take_all()
        )
        wf = Counter()
        for t in TEXTS:
            wf.update(t.lower().split())
        exp_c = Counter()
        for w, f in wf.items():
            for L in range(1, 4):
                for st in range(len(w) - L + 1):
                    exp_c[w[st : st + L]] += f
        exp = (
            pd.DataFrame(sorted(exp_c.items()), columns=["piece", "freq"])
            .sort_values(["freq", "piece"], ascending=[False, True])
            .reset_index(drop=True)
        )
        got = got.sort_values(["freq", "piece"], ascending=[False, True]).reset_index(
            drop=True
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_local_plan_matches_reference(self):
        got = unigram.unigram_train(
            docs_ds(), vocab_size=48, max_piece_len=4, seed_size=200,
            n_iters=3, plan="local",
        )
        exp = ref_train(TEXTS, 48, 4, 200, 3, 0.75)
        got_map = dict(zip(got["piece"], got["logp"]))
        assert set(got_map) == set(exp)
        for p, v in exp.items():
            assert got_map[p] == pytest.approx(v, abs=0, rel=0), p

    def test_distributed_plan_bit_identical(self):
        loc = unigram.unigram_train(
            docs_ds(), vocab_size=48, seed_size=200, n_iters=3, plan="local"
        )
        dist = unigram.unigram_train(
            docs_ds(), vocab_size=48, seed_size=200, n_iters=3,
            plan="distributed",
        )
        pd.testing.assert_frame_equal(loc, dist)  # exact, incl. float logp

    def test_auto_gate_picks_distributed_above_limit(self):
        dist = unigram.unigram_train(
            docs_ds(), vocab_size=48, seed_size=200, n_iters=2,
            word_type_limit=1,
        )
        loc = unigram.unigram_train(
            docs_ds(), vocab_size=48, seed_size=200, n_iters=2, plan="local"
        )
        pd.testing.assert_frame_equal(loc, dist)

    def test_single_chars_survive_pruning(self):
        got = unigram.unigram_train(
            docs_ds(), vocab_size=8, seed_size=64, n_iters=4, plan="local"
        )
        pieces = set(got["piece"])
        used_chars = {c for t in TEXTS for w in t.lower().split() for c in w}
        # every character that survives into some Viterbi path must be
        # present; at minimum the vocabulary can segment every word
        logp = dict(zip(got["piece"], got["logp"]))
        for t in TEXTS:
            for w in t.lower().split():
                pieces_w, score = unigram.viterbi_segment(w, logp, 4)
                assert "".join(pieces_w) == w
        assert pieces  # non-empty

    def test_viterbi_prefers_fewer_pieces_on_ties(self):
        logp = {"a": math.log(0.25), "aa": math.log(0.0625)}
        # "aa" as one piece scores log(1/16); as two pieces also
        # log(1/16) — fewer pieces wins.
        pieces, _ = unigram.viterbi_segment("aa", logp, 2)
        assert pieces == ["aa"]

    def test_viterbi_unknown_char_fallback(self):
        logp = {"a": math.log(0.5)}
        pieces, score = unigram.viterbi_segment("axa", logp, 2)
        assert pieces == ["a", "x", "a"]
        assert score == -math.inf

    def test_encode_counts_vs_reference(self):
        ds = docs_ds()
        vocab = unigram.unigram_train(
            ds, vocab_size=48, seed_size=200, n_iters=3, plan="local"
        )
        got = (
            pd.DataFrame(unigram.unigram_encode_counts(ds, vocab).take_all())
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        logp = dict(zip(vocab["piece"], vocab["logp"]))
        for i, t in enumerate(TEXTS):
            ws = t.lower().split()
            exp_tok = sum(len(ref_viterbi(w, logp, 4)[0]) for w in ws)
            row = got[got["doc_id"] == i].iloc[0]
            assert row["n_words"] == len(ws)
            assert row["n_unigram_tokens"] == exp_tok, (i, t)

    def test_empty_corpus(self):
        ds = ray.data.from_items([{"doc_id": 0, "text": ""}])
        got = unigram.unigram_train(ds, vocab_size=8, plan="local")
        assert len(got) == 0
        enc = pd.DataFrame(unigram.unigram_encode_counts(ds, got).take_all())
        assert enc.loc[0, "n_unigram_tokens"] == 0
