"""Distributed unigram-LM tokenizer training + encoding (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates", ACL — the SentencePiece unigram
model).

Why this op exists: together with :mod:`docstrange_ray.ops.bpe` this
completes the tokenizer-TRAINING story the reference outsources to a
pretrained downloadable artifact (tiktoken,
``mcp_server_module/server.py:69-86``). BPE learns merges bottom-up;
the unigram model starts from a large seed vocabulary of substrings and
iteratively prunes it with EM — the other standard subword algorithm.

Determinism choice (documented divergence from Kudo): the E-step here
is HARD (Viterbi) rather than forward-backward soft EM. With Viterbi
counts every expected count is an exact int64 (a sum of word-type
frequencies), so the local and distributed plans are bit-identical and
the per-iteration exchange carries integers, not floats. Kudo's soft
EM differs only in smoothing the same counts; the pruning dynamics are
qualitatively identical and every tie-break here is total and
documented.

Scale shape
-----------
Like BPE, the working set is the WORD-TYPE table (Heaps-bounded), not
the corpus:

1. ONE word exchange builds (word, freq) — reuses ``bpe.word_table``.
2. Seed vocabulary = top ``seed_size`` substrings (length <=
   ``max_piece_len``) of word types weighted by word frequency —
   per-block vectorized substring histogram, pre-reduced, ONE exchange
   over distinct substrings (bounded by |word types| x max_piece_len²).
   The first-iteration statistic is pure substring arithmetic, hence
   the ``unigram_seed_counts`` SQL oracle.
3. Each EM round: broadcast the (piece -> logp) dict once
   (``ray.put``); per block, Viterbi-segment each word type and emit
   integer piece counts (pre-reduced); ONE bounded exchange over the
   vocabulary sums them; the driver M-steps (probs from exact counts)
   and prunes the lowest-utility pieces (never single characters, so
   every string stays segmentable). The driver holds only
   vocabulary-sized state.
4. Encoding broadcasts the final vocab once and Viterbi-segments each
   batch's DISTINCT words (factorize) — shuffle-free.

Viterbi tie-break (total order, pinned by tests): at each DP cell the
higher score wins; at equal score the candidate with FEWER pieces
wins; still equal -> the candidate whose ARRIVING piece is
lexicographically smaller wins (a per-cell rule, applied identically
everywhere, so it is deterministic even though it is not a global
lexicographic order over whole segmentations). Scores compare
identical float64s in every plan (vocab probs are driver-computed from
exact integer counts), so ties resolve identically everywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from docstrange_ray.ops.bpe import word_table
from docstrange_ray.shuffle import adaptive_final, arrow_out, coalesced_blocks


def _empty_pieces() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "piece": pd.Series([], dtype=object),
            "freq": pd.Series([], dtype=np.int64),
        }
    )


def _piece_sum(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby("piece", as_index=False)["freq"].sum()


def _top_pieces(df: pd.DataFrame, k: int) -> pd.DataFrame:
    return df.sort_values(["freq", "piece"], ascending=[False, True]).head(k)


def _substring_counts_block(df: pd.DataFrame, max_piece_len: int) -> pd.DataFrame:
    """All substrings of length 1..max_piece_len of each word type,
    weighted by word frequency; every OCCURRENCE counts (SentencePiece's
    seed statistic). Vectorized: one pandas ``.str.slice`` sweep per
    (length, start-offset) pair — max_piece_len x max_word_len column
    kernels, never a per-occurrence Python loop."""
    if len(df) == 0:
        return _empty_pieces()
    words = df["w"].astype(str)
    freqs = df["f"].to_numpy(np.int64)
    wlens = words.str.len().to_numpy(np.int64)
    max_wlen = int(wlens.max()) if len(wlens) else 0
    parts = []
    for L in range(1, max_piece_len + 1):
        for st in range(0, max_wlen - L + 1):
            keep = wlens >= st + L
            if not keep.any():
                break
            sl = words[keep].str.slice(st, st + L)
            parts.append(pd.DataFrame({"piece": sl.to_numpy(),
                                       "freq": freqs[keep]}))
    if not parts:
        return _empty_pieces()
    return _piece_sum(pd.concat(parts, ignore_index=True))


def seed_counts(ds, max_piece_len: int = 4, top_k: int = 100,
                num_partitions: int | None = None):
    """Top-``top_k`` seed-substring counts — the statistic the initial
    unigram vocabulary ranks by. SQL-expressible exactly (substring
    arithmetic over the word table), hence the ``unigram_seed_counts``
    oracle. Ties break (freq DESC, piece ASC)."""
    words = word_table(ds, num_partitions)
    partials = words.map_batches(
        arrow_out(lambda df: _substring_counts_block(df, max_piece_len)),
        batch_format="pandas",
        batch_size=None,
    )
    summed = adaptive_final(partials, _piece_sum, ["piece"],
                            num_partitions=num_partitions)
    return coalesced_blocks(
        summed.map_batches(
            arrow_out(lambda df: _top_pieces(df, top_k)),
            batch_format="pandas", batch_size=None,
        ),
        lambda df: _top_pieces(df, top_k),
    )


def _viterbi(word: str, logp: dict[str, float], max_piece_len: int):
    """Best segmentation of ``word`` under piece log-probs.

    Returns (pieces, score). Single characters seen in TRAINING are
    never pruned, so every training word segments; a word containing a
    character absent from the vocab (possible at encode time on unseen
    data) falls back to per-character segmentation with score -inf
    (UNK-per-char semantics). Tie-break is the module-documented
    per-cell total order: score DESC, n_pieces ASC, arriving-piece
    lexicographic ASC."""
    n = len(word)
    # best[i] = (score, n_pieces, back_pos, piece) for prefix of length i
    NEG = -math.inf
    best_score = [NEG] * (n + 1)
    best_np = [0] * (n + 1)
    back = [(0, "")] * (n + 1)
    best_score[0] = 0.0
    for i in range(1, n + 1):
        for L in range(1, min(max_piece_len, i) + 1):
            j = i - L
            if best_score[j] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            s = best_score[j] + lp
            np_ = best_np[j] + 1
            if s > best_score[i] or (
                s == best_score[i]
                and (
                    np_ < best_np[i]
                    or (np_ == best_np[i] and piece < back[i][1])
                )
            ):
                best_score[i] = s
                best_np[i] = np_
                back[i] = (j, piece)
    if n > 0 and best_score[n] == NEG:
        return list(word), NEG
    pieces = []
    i = n
    while i > 0:
        j, piece = back[i]
        pieces.append(piece)
        i = j
    pieces.reverse()
    return pieces, best_score[n]


# public name: encode-time callers and tests segment single words with it
viterbi_segment = _viterbi


def _viterbi_counts_block(
    df: pd.DataFrame, logp: dict[str, float], max_piece_len: int
) -> pd.DataFrame:
    """Hard-EM E-step for one block of word types: integer piece counts
    weighted by word frequency (pre-reduced per block)."""
    if len(df) == 0:
        return _empty_pieces()
    acc: dict[str, int] = {}
    for w, f in zip(df["w"].astype(str), df["f"].to_numpy(np.int64)):
        for p in _viterbi(w, logp, max_piece_len)[0]:
            acc[p] = acc.get(p, 0) + int(f)
    return pd.DataFrame(
        {"piece": list(acc.keys()),
         "freq": np.fromiter(acc.values(), np.int64, count=len(acc))}
    )


def _m_step(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c) - math.log(total) for p, c in counts.items() if c > 0}


def _prune(
    counts: dict[str, int], keep: int
) -> dict[str, int]:
    """Keep the ``keep`` highest-count pieces plus ALL single
    characters (segmentability invariant). Drop order: (count ASC,
    piece DESC) so the kept set is deterministic."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = {p: c for p, c in counts.items() if len(p) > 1}
    room = max(keep - len(chars), 0)
    kept = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:room]
    out = dict(chars)
    out.update(kept)
    return out


def _seed_vocab_local(wf: dict[str, int], max_piece_len: int, seed_size: int) -> dict[str, int]:
    counts: dict[str, int] = {}
    for w, f in wf.items():
        for L in range(1, max_piece_len + 1):
            for st in range(len(w) - L + 1):
                p = w[st : st + L]
                counts[p] = counts.get(p, 0) + f
    return _prune(counts, seed_size)


def _sequential_unigram(
    wf: dict[str, int],
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    n_iters: int,
    shrink: float,
) -> dict[str, float]:
    """In-memory reference loop (below the gate AND the ground truth the
    distributed plan must reproduce bit-identically)."""
    counts = _seed_vocab_local(wf, max_piece_len, seed_size)
    logp = _m_step(counts)
    size = len(counts)
    for _ in range(n_iters):
        ecounts: dict[str, int] = {}
        for w, f in wf.items():
            for p in _viterbi(w, logp, max_piece_len)[0]:
                ecounts[p] = ecounts.get(p, 0) + f
        size = max(vocab_size, int(size * shrink))
        ecounts = _prune(ecounts, size)
        logp = _m_step(ecounts)
        if len(ecounts) <= vocab_size:
            break
    return logp


def unigram_train(
    ds,
    vocab_size: int = 64,
    max_piece_len: int = 4,
    seed_size: int = 512,
    n_iters: int = 4,
    shrink: float = 0.75,
    num_partitions: int | None = None,
    word_type_limit: int = 2_000_000,
    plan: str = "auto",
) -> pd.DataFrame:
    """Learn a unigram-LM piece vocabulary from the corpus.

    Returns (piece, logp) sorted by (logp DESC, piece ASC).
    ``plan='auto'`` counts the word-type table and runs the in-memory
    loop when it fits ``word_type_limit``, the distributed hard-EM loop
    above it ('local'/'distributed' force a plan for tests); both are
    bit-identical because every E-step count is an exact int64 and the
    M-step/prune run on the driver in both plans."""
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
        logp = _sequential_unigram(
            wf, vocab_size, max_piece_len, seed_size, n_iters, shrink
        )
    else:
        logp = _distributed_unigram(
            words, vocab_size, max_piece_len, seed_size, n_iters, shrink,
            num_partitions,
        )

    items = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "piece": [p for p, _ in items],
            "logp": np.asarray([v for _, v in items], dtype=np.float64),
        }
    )


def _counts_to_driver(summed) -> dict[str, int]:
    """Pull a VOCABULARY-scale (piece, freq) dataset to the driver.
    Bounded by seed_size after the first prune; the seed exchange
    itself is bounded by |word types| x max_piece_len² — the same
    Heaps-law bound the BPE/tf-idf broadcasts rely on."""
    out: dict[str, int] = {}
    for blk in summed.iter_batches(batch_format="pandas", batch_size=None):
        for p, c in zip(blk["piece"], blk["freq"]):
            out[p] = out.get(p, 0) + int(c)
    return out


def _distributed_unigram(
    words,
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    n_iters: int,
    shrink: float,
    num_partitions: int | None,
) -> dict[str, float]:
    import ray

    words = words.materialize()
    seed_partials = words.map_batches(
        arrow_out(lambda df: _substring_counts_block(df, max_piece_len)),
        batch_format="pandas",
        batch_size=None,
    )
    seed_summed = adaptive_final(seed_partials, _piece_sum, ["piece"],
                                 num_partitions=num_partitions)
    counts = _prune(_counts_to_driver(seed_summed), seed_size)
    logp = _m_step(counts)
    size = len(counts)
    for _ in range(n_iters):
        logp_ref = ray.put(logp)

        def estep(df: pd.DataFrame, _ref=logp_ref, _L=max_piece_len) -> pd.DataFrame:
            import ray as _ray

            return _viterbi_counts_block(df, _ray.get(_ref), _L)

        partials = words.map_batches(
            arrow_out(estep), batch_format="pandas", batch_size=None
        )
        summed = adaptive_final(partials, _piece_sum, ["piece"],
                                num_partitions=num_partitions)
        ecounts = _counts_to_driver(summed)
        size = max(vocab_size, int(size * shrink))
        ecounts = _prune(ecounts, size)
        logp = _m_step(ecounts)
        if len(ecounts) <= vocab_size:
            break
    return logp


def unigram_encode_counts(
    ds, vocab: pd.DataFrame, max_piece_len: int = 4,
):
    """Per-document unigram token counts under a learned vocabulary:
    (doc_id, n_words, n_unigram_tokens). The vocab broadcasts once via
    ``ray.put``; each batch Viterbi-segments only its DISTINCT words
    (factorize) — shuffle-free (the ``bpe_encode_counts`` shape)."""
    import pyarrow as pa
    import ray

    logp = dict(zip(vocab["piece"].astype(str), vocab["logp"].astype(float)))
    vocab_ref = ray.put(logp)

    def encode(batch: pa.Table) -> pd.DataFrame:
        lp = ray.get(vocab_ref)
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        word_lists = [(t or "").lower().split() for t in texts]
        lens = np.fromiter((len(ws) for ws in word_lists), np.int64,
                           count=len(word_lists))
        flat = np.asarray([w for ws in word_lists for w in ws], dtype=object)
        if len(flat):
            codes, uniques = pd.factorize(flat)
            per_word = np.fromiter(
                (len(_viterbi(str(u), lp, max_piece_len)[0]) for u in uniques),
                np.int64,
                count=len(uniques),
            )[codes]
            doc_of = np.repeat(np.arange(len(word_lists)), lens)
            tok = np.zeros(len(word_lists), dtype=np.int64)
            np.add.at(tok, doc_of, per_word)
        else:
            tok = np.zeros(len(word_lists), dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": doc_ids, "n_words": lens, "n_unigram_tokens": tok}
        )

    return ds.map_batches(arrow_out(encode), batch_format="pyarrow",
                          batch_size=4096)
