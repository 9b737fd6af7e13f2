"""Distributed WordPiece tokenizer training + encoding (Schuster &
Nakajima 2012, "Japanese and Korean voice search"; the BERT tokenizer).

Differs from BPE (ops/bpe.py) in exactly two places, and shares its
kernels for everything else:

  * the merge criterion is the LIKELIHOOD GAIN score
    ``freq(ab) / (freq(a) * freq(b))`` — the pair whose merge most
    increases corpus likelihood under a unigram piece model — rather
    than raw pair frequency;
  * encoding is greedy longest-match-first over the learned piece
    vocabulary with ``##`` continuation pieces (whole word -> [UNK]
    when any tail cannot match), rather than merge replay.

Scale shape (identical to BPE's): ONE pre-reduced word exchange folds
the corpus to the word-type table; each training iteration does one
bounded exchange over DISTINCT adjacent symbol pairs plus one over
DISTINCT symbols (the symbol inventory — alphabet + merges-so-far —
is broadcast-small by construction). Selection is EXACT: blocks
pre-rank candidates by float64 score, and the final compares the
shortlisted fractions by integer cross-multiplication (Python bigint,
no float tie ambiguity); ties break (left, right) ascending. Both
plans produce byte-identical merge lists (pinned by tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.ops.bpe import (
    _adjacent_pairs_block,
    _empty_pairs,
    _merge_pattern,
    _merge_repl,
    _pair_sum,
    word_table,
)
from docstrange_ray.shuffle import (
    adaptive_final,
    arrow_out,
    coalesced_blocks,
)

_UNK = "[UNK]"


def _symbol_counts_block(syms: pd.Series, freqs: np.ndarray) -> pd.DataFrame:
    """Symbol occurrence histogram for one block of space-joined
    symbol sequences, weighted by word frequency."""
    lists = syms.str.split(" ")
    lens = lists.str.len().to_numpy(np.int64)
    if not len(lists):
        return pd.DataFrame({"sym": pd.Series([], dtype=object),
                             "sfreq": pd.Series([], dtype=np.int64)})
    from itertools import chain

    flat = np.empty(int(lens.sum()), dtype=object)
    flat[:] = list(chain.from_iterable(lists))
    out = pd.DataFrame({"sym": flat, "sfreq": np.repeat(freqs, lens)})
    return out.groupby("sym", as_index=False)["sfreq"].sum()


def _sym_sum(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby("sym", as_index=False)["sfreq"].sum()


def _select_exact(cands: pd.DataFrame, sym_counts: dict[str, int]):
    """Argmax of pair_freq/(left_freq*right_freq) by integer
    cross-multiplication (exact); ties (left, right) ascending.
    Returns (left, right, p, lf, rf) or None."""
    best = None
    for r in cands.itertuples(index=False):
        lf = int(sym_counts[r.left_sym])
        rf = int(sym_counts[r.right_sym])
        cur = (int(r.freq), lf, rf, str(r.left_sym), str(r.right_sym))
        if best is None:
            best = cur
            continue
        # cur > best  <=>  p1/(l1 r1) > p0/(l0 r0)  <=>  p1 l0 r0 > p0 l1 r1
        lhs = cur[0] * best[1] * best[2]
        rhs = best[0] * cur[1] * cur[2]
        if lhs > rhs or (lhs == rhs and (cur[3], cur[4]) < (best[3], best[4])):
            best = cur
    if best is None:
        return None
    p, lf, rf, left, right = best
    return left, right, p, lf, rf


def pair_stats(ds, top_k: int = 50, num_partitions=None):
    """First-iteration WordPiece statistics: the ``top_k`` character
    pairs by likelihood-gain score, emitted as the INT columns
    (left_sym, right_sym, pair_freq, left_freq, right_freq) — the
    score is the derived ratio, kept out of the emit so the oracle
    hashes integers. Selection order: float64 score DESC (the same
    division the SQL oracle computes), then (left, right) ASC."""
    words = word_table(ds, num_partitions).materialize()

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_pairs()
        spaced = df["w"].astype(str).map(lambda w: " ".join(w))
        return _adjacent_pairs_block(spaced, df["f"].to_numpy(np.int64))

    def block_syms(df: pd.DataFrame) -> pd.DataFrame:
        spaced = df["w"].astype(str).map(lambda w: " ".join(w))
        return _symbol_counts_block(spaced, df["f"].to_numpy(np.int64))

    pairs = adaptive_final(
        words.map_batches(arrow_out(block_pairs), batch_format="pandas",
                          batch_size=None),
        _pair_sum, ["left_sym", "right_sym"], num_partitions=num_partitions,
    )
    syms = adaptive_final(
        words.map_batches(arrow_out(block_syms), batch_format="pandas",
                          batch_size=None),
        _sym_sum, ["sym"], num_partitions=num_partitions,
    ).to_pandas()  # symbol inventory: alphabet-bounded
    scount = dict(zip(syms["sym"], syms["sfreq"].astype(np.int64)))

    import ray

    ref = ray.put(scount)

    def top_block(df: pd.DataFrame) -> pd.DataFrame:
        sc = ray.get(ref)
        if len(df) == 0:
            return _wp_stats_frame([], [], [], [], [])
        lf = df["left_sym"].map(sc).to_numpy(np.int64)
        rf = df["right_sym"].map(sc).to_numpy(np.int64)
        score = df["freq"].to_numpy(np.float64) / (lf.astype(np.float64) * rf)
        out = df.assign(left_freq=lf, right_freq=rf, _score=score)
        out = out.sort_values(["_score", "left_sym", "right_sym"],
                              ascending=[False, True, True]).head(top_k)
        return _wp_stats_frame(out["left_sym"], out["right_sym"],
                               out["freq"], out["left_freq"],
                               out["right_freq"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        score = df["pair_freq"].to_numpy(np.float64) / (
            df["left_freq"].to_numpy(np.float64)
            * df["right_freq"].to_numpy(np.float64)
        )
        out = df.assign(_score=score).sort_values(
            ["_score", "left_sym", "right_sym"], ascending=[False, True, True]
        ).head(top_k)
        return out.drop(columns=["_score"])

    return coalesced_blocks(
        pairs.map_batches(arrow_out(top_block), batch_format="pandas",
                          batch_size=None),
        final,
    )


def _wp_stats_frame(l, r, p, lf, rf) -> pd.DataFrame:
    return pd.DataFrame(
        {"left_sym": pd.Series(list(l), dtype=object),
         "right_sym": pd.Series(list(r), dtype=object),
         "pair_freq": pd.Series(list(p), dtype=np.int64),
         "left_freq": pd.Series(list(lf), dtype=np.int64),
         "right_freq": pd.Series(list(rf), dtype=np.int64)}
    )


def _sequential_wp_merges(wf: dict[str, int], n_merges: int,
                          min_pair_freq: int) -> list[tuple]:
    """In-memory WordPiece loop (ground truth below the gate): exact
    integer-fraction argmax each round."""
    seqs = [list(w) for w in wf]
    freqs = list(wf.values())
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for seq, f in zip(seqs, freqs):
            for s in seq:
                sc[s] = sc.get(s, 0) + f
            for a, b in zip(seq, seq[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        cands = pd.DataFrame(
            {"left_sym": [k[0] for k in pc],
             "right_sym": [k[1] for k in pc],
             "freq": list(pc.values())}
        )
        cands = cands[cands["freq"] >= min_pair_freq]
        sel = _select_exact(cands, sc)
        if sel is None:
            break
        left, right, p, lf, rf = sel
        merges.append(sel)
        merged = left + right
        for i, seq in enumerate(seqs):
            j, out = 0, []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == left and seq[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
    return merges


def wordpiece_train(ds, n_merges: int = 24, min_pair_freq: int = 2,
                    num_partitions=None, word_type_limit: int = 2_000_000,
                    plan: str = "auto") -> pd.DataFrame:
    """Learn ``n_merges`` WordPiece merges. Returns (rank, left_sym,
    right_sym, pair_freq, left_freq, right_freq) in merge order —
    all-integer (the score is the derived exact fraction).

    ``plan='auto'`` mirrors bpe_train's gate: in-memory loop when the
    word-type table fits ``word_type_limit``, the distributed loop
    above it. Distributed iteration = bounded pair exchange + bounded
    symbol exchange; blocks shortlist the top-16 candidates by float64
    score and the driver finishes with the exact integer-fraction
    compare over the shortlist (a true argmax demoted below a block's
    16th place would need 16 pairs within one float64 ulp of it)."""
    if plan not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    words = word_table(ds, num_partitions).materialize()
    if plan == "auto":
        plan = "local" if words.count() <= word_type_limit else "distributed"

    if plan == "local":
        wf: dict[str, int] = {}
        for blk in words.iter_batches(batch_format="pandas", batch_size=None):
            for w, f in zip(blk["w"], blk["f"]):
                wf[w] = wf.get(w, 0) + int(f)
        merges = _sequential_wp_merges(wf, n_merges, min_pair_freq)
    else:
        merges = _distributed_wp_merges(words, n_merges, min_pair_freq,
                                        num_partitions)
    return pd.DataFrame(
        {"rank": np.arange(1, len(merges) + 1, dtype=np.int64),
         "left_sym": [m[0] for m in merges],
         "right_sym": [m[1] for m in merges],
         "pair_freq": np.asarray([m[2] for m in merges], dtype=np.int64),
         "left_freq": np.asarray([m[3] for m in merges], dtype=np.int64),
         "right_freq": np.asarray([m[4] for m in merges], dtype=np.int64)}
    )


def _distributed_wp_merges(words, n_merges: int, min_pair_freq: int,
                           num_partitions) -> list[tuple]:
    import ray

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"sym": df["w"].astype(str).map(lambda w: " ".join(w)),
             "f": df["f"].to_numpy(np.int64)}
        )

    table = words.map_batches(arrow_out(to_syms), batch_format="pandas",
                              batch_size=None).materialize()
    merges: list[tuple] = []
    for _ in range(n_merges):
        syms = adaptive_final(
            table.map_batches(
                arrow_out(lambda df: _symbol_counts_block(
                    df["sym"], df["f"].to_numpy(np.int64))),
                batch_format="pandas", batch_size=None,
            ),
            _sym_sum, ["sym"], num_partitions=num_partitions,
        ).to_pandas()
        scount = {s: int(f) for s, f in zip(syms["sym"], syms["sfreq"])}
        ref = ray.put(scount)

        def shortlist(df: pd.DataFrame) -> pd.DataFrame:
            sc = ray.get(ref)
            df = df[df["freq"] >= min_pair_freq]
            if len(df) == 0:
                return _empty_pairs()
            lf = df["left_sym"].map(sc).to_numpy(np.int64)
            rf = df["right_sym"].map(sc).to_numpy(np.int64)
            score = df["freq"].to_numpy(np.float64) / (
                lf.astype(np.float64) * rf)
            out = df.assign(_score=score).sort_values(
                ["_score", "left_sym", "right_sym"],
                ascending=[False, True, True],
            ).head(16)
            return out[["left_sym", "right_sym", "freq"]]

        pairs = adaptive_final(
            table.map_batches(
                arrow_out(lambda df: _adjacent_pairs_block(
                    df["sym"], df["f"].to_numpy(np.int64))
                    if len(df) else _empty_pairs()),
                batch_format="pandas", batch_size=None,
            ),
            _pair_sum, ["left_sym", "right_sym"],
            num_partitions=num_partitions,
        )
        cands = coalesced_blocks(
            pairs.map_batches(arrow_out(shortlist), batch_format="pandas",
                              batch_size=None),
            lambda df: df,
        ).to_pandas()  # <= 16 x n_blocks rows
        cands = cands[cands["freq"] >= min_pair_freq]
        sel = _select_exact(cands, scount) if len(cands) else None
        if sel is None:
            break
        merges.append(sel)
        left, right = sel[0], sel[1]
        pat = _merge_pattern(left, right)
        repl = _merge_repl(left, right)

        def rewrite(df: pd.DataFrame, pat=pat, repl=repl) -> pd.DataFrame:
            out = df.copy()
            out["sym"] = out["sym"].str.replace(pat, repl, regex=True)
            return out

        table = table.map_batches(arrow_out(rewrite), batch_format="pandas",
                                  batch_size=None).materialize()
    return merges


def wordpiece_vocab(merges: pd.DataFrame) -> tuple[set, set]:
    """(initial_pieces, continuation_pieces) implied by the merge
    list: merge products are usable at either position (the ``##``
    marker is notational at encode time), and single characters always
    match implicitly — BERT's character fallback, so no word with
    known characters ever becomes [UNK]."""
    pieces = {r.left_sym + r.right_sym for r in merges.itertuples(index=False)}
    return set(pieces), set(pieces)


def wordpiece_encode(word: str, init: set, cont: set,
                     max_len: int = 64) -> list[str]:
    """Greedy longest-match-first (BERT WordPieceTokenizer semantics):
    single characters always match (character fallback, so a word with
    known characters never fails mid-way), and — as in BERT's
    ``max_input_chars_per_word`` rule — a word LONGER than ``max_len``
    characters becomes one [UNK] outright."""
    n = len(word)
    if n == 0 or n > max_len:
        return [_UNK]
    out = []
    i = 0
    while i < n:
        table = init if i == 0 else cont
        j = n
        while j > i + 1 and word[i:j] not in table:
            j -= 1
        # j == i+1 -> the single-character fallback (always matches)
        out.append(word[i:j] if i == 0 else "##" + word[i:j])
        i = j
    return out


def wordpiece_encode_counts(ds, merges: pd.DataFrame, num_partitions=None):
    """Per-doc token counts under the learned WordPiece vocabulary:
    broadcast (init, cont) piece sets once, factorize each batch's
    DISTINCT words, greedy-encode each distinct word once —
    shuffle-free. Returns Dataset[(doc_id, n_tokens)]."""
    import ray

    init, cont = wordpiece_vocab(merges)
    ref = ray.put((init, cont))

    def encode(batch: pa.Table) -> pd.DataFrame:
        ini, con = ray.get(ref)
        texts = batch.column("text").to_pylist()
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        word_lists = [(t or "").lower().split() for t in texts]
        all_words = [w for ws in word_lists for w in ws]
        n_tok = np.zeros(len(texts), dtype=np.int64)
        if all_words:
            codes, uniq = pd.factorize(np.asarray(all_words, dtype=object))
            tok_per = np.asarray(
                [len(wordpiece_encode(w, ini, con)) for w in uniq],
                dtype=np.int64,
            )
            per_word = tok_per[codes]
            pos = 0
            for i, ws in enumerate(word_lists):
                k = len(ws)
                n_tok[i] = per_word[pos : pos + k].sum()
                pos += k
        return pd.DataFrame({"doc_id": ids, "n_tokens": n_tok})

    return ds.map_batches(arrow_out(encode), batch_format="pyarrow")
