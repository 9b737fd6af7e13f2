"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL).

Why this op exists: the reference counts tokens with a PRE-trained BPE
(tiktoken, ``mcp_server_module/server.py:69-86``) whose vocabulary is a
downloadable artifact, not public source (divergence bound documented at
``projections.spans_to_chunks``). This module supplies the *training*
side from scratch — the standard large-scale pipeline step of learning a
subword vocabulary from the corpus itself — plus a deterministic encoder
for token-budget accounting.

Scale shape
-----------
BPE's working set is the WORD-TYPE table (distinct words x frequency),
not the corpus: Sennrich's reference implementation folds the corpus to
word types first and every merge iteration rewrites only that table.
Word types grow sub-linearly (Heaps' law) — the same bound tf-idf's
document-frequency broadcast relies on — so the plan is:

1. ONE word exchange builds the (word, freq) table (pre-reduced
   partials, the ``vocab_encode`` shape).
2. A measured gate (``word_type_limit``): when the counted table fits,
   the merge loop runs in-memory on the driver (the classic algorithm,
   zero per-iteration overhead); above the gate the SAME loop runs
   distributed — per-iteration partial pair counts -> ``adaptive_final``
   global sums -> top-1, then a vectorized regex rewrite of the symbol
   column, re-materialized so lineage stays flat and each pass is one
   scan of the object-store-resident table. Per iteration that is one
   bounded exchange over DISTINCT symbol pairs (pre-reduced per block),
   never the corpus.
3. Encoding broadcasts the learned merge list once (``ray.put``) and
   encodes each batch's DISTINCT words with one regex pass per merge
   over a single concatenated string — shuffle-free.

Both plans produce byte-identical merge lists (pinned by tests); ties
break deterministically by (freq DESC, left ASC, right ASC).

No end-of-word marker: merges apply within words only, so the
first-iteration pair statistics are exactly reproducible in SQL
(``bpe_pair_counts`` oracle) from character arithmetic.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.ops.textstats import word_counts
from docstrange_ray.shuffle import adaptive_final, arrow_out, coalesced_blocks, grouped_blocks

def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "left_sym": pd.Series([], dtype=object),
            "right_sym": pd.Series([], dtype=object),
            "freq": pd.Series([], dtype=np.int64),
        }
    )


def word_table(ds, num_partitions: int | None = None):
    """(word, freq) over the corpus — ONE pre-reduced word exchange.

    Tokenization is the engine-wide :func:`word_counts` contract
    (lowercase whitespace split, empties dropped)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = word_counts(batch.column("text").to_pylist())
        return pd.DataFrame({"w": vc.index, "f": vc.to_numpy(dtype=np.int64)})

    return grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["w"],
        lambda df: df.groupby("w", as_index=False)["f"].sum(),
        num_partitions,
        batch_format="pandas",
    )


def _adjacent_pairs_block(syms: pd.Series, freqs: np.ndarray) -> pd.DataFrame:
    """Vectorized adjacent-symbol-pair histogram for one block.

    ``syms`` holds space-joined symbol sequences (one per word type);
    the flatten/boundary-mask trick counts every within-word pair with
    numpy indexing — no per-position Python loop."""
    lists = syms.str.split(" ")
    lens = lists.str.len().to_numpy(np.int64)
    keep = lens >= 2
    if not keep.any():
        return _empty_pairs()
    lists = lists[keep]
    lens = lens[keep]
    freqs = freqs[keep]
    from itertools import chain

    flat = np.empty(int(lens.sum()), dtype=object)
    flat[:] = list(chain.from_iterable(lists))
    ends = np.cumsum(lens)
    mask = np.ones(len(flat), dtype=bool)
    mask[ends - 1] = False  # last symbol of each word starts no pair
    idx = np.nonzero(mask)[0]
    out = pd.DataFrame(
        {
            "left_sym": flat[idx],
            "right_sym": flat[idx + 1],
            "freq": np.repeat(freqs, lens - 1),
        }
    )
    return out.groupby(["left_sym", "right_sym"], as_index=False)["freq"].sum()


def _pair_sum(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby(["left_sym", "right_sym"], as_index=False)["freq"].sum()


def _top_pairs(df: pd.DataFrame, k: int) -> pd.DataFrame:
    return df.sort_values(
        ["freq", "left_sym", "right_sym"], ascending=[False, True, True]
    ).head(k)


def pair_counts(ds, top_k: int = 50, num_partitions: int | None = None):
    """Top-``top_k`` first-iteration BPE pair counts: adjacent CHARACTER
    pairs within words, weighted by word frequency — the statistic the
    first merge maximizes. SQL-expressible exactly (character arithmetic
    over the word table), hence the ``bpe_pair_counts`` oracle."""

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_pairs()
        spaced = df["w"].astype(str).map(lambda w: " ".join(w))
        return _adjacent_pairs_block(spaced, df["f"].to_numpy(np.int64))

    words = word_table(ds, num_partitions)
    partials = words.map_batches(
        arrow_out(block_pairs), batch_format="pandas", batch_size=None
    )
    summed = adaptive_final(partials, _pair_sum, ["left_sym", "right_sym"],
                            num_partitions=num_partitions)
    final = coalesced_blocks(
        summed.map_batches(
            arrow_out(lambda df: _top_pairs(df, top_k)), batch_format="pandas",
            batch_size=None,
        ),
        lambda df: _top_pairs(df, top_k),
    )
    return final


def _merge_pattern(left: str, right: str) -> re.Pattern:
    # Sennrich's boundary-safe rewrite: the pair as whole space-separated
    # symbols, never a suffix/prefix of a longer symbol.
    return re.compile(r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")


def _merge_repl(left: str, right: str) -> str:
    # re.sub replacement TEMPLATE: backslash is its only metacharacter,
    # and corpus symbols may contain it — escape so a word like 'a\1b'
    # substitutes literally instead of as a group reference.
    return (left + right).replace("\\", "\\\\")


def _sequential_merges(
    wf: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """The classic in-memory Sennrich loop over a word-frequency dict.
    Used below the gate AND as the tie-broken ground truth the
    distributed plan must reproduce."""
    seqs: list[list[str]] = [list(w) for w in wf]
    freqs = np.fromiter(wf.values(), dtype=np.int64, count=len(wf))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(f)
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best < min_freq:
            break
        merges.append((left, right, best))
        merged = left + right
        for i, seq in enumerate(seqs):
            if len(seq) < 2:
                continue
            j = 0
            out = []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == left and seq[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
    return merges


def bpe_train(
    ds,
    n_merges: int = 32,
    min_freq: int = 2,
    num_partitions: int | None = None,
    word_type_limit: int = 2_000_000,
    plan: str = "auto",
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns a DataFrame (rank, left_sym, right_sym, freq) in merge
    order. ``plan='auto'`` counts the word-type table and runs the
    in-memory loop when it fits ``word_type_limit`` (the tf-idf
    broadcast-gate idiom), the distributed loop above it; 'local' /
    'distributed' force a plan for tests."""
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
        merges = _sequential_merges(wf, n_merges, min_freq)
    else:
        merges = _distributed_merges(words, n_merges, min_freq, num_partitions)

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left_sym": [m[0] for m in merges],
            "right_sym": [m[1] for m in merges],
            "freq": np.asarray([m[2] for m in merges], dtype=np.int64),
        }
    )


def _distributed_merges(
    words, n_merges: int, min_freq: int, num_partitions: int | None
) -> list[tuple[str, str, int]]:
    """Per-iteration: bounded pair exchange -> global top-1 -> vectorized
    regex rewrite of the symbol column -> re-materialize (flat lineage,
    one scan per pass). The driver only ever pulls ONE row per
    iteration."""

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "sym": df["w"].astype(str).map(lambda w: " ".join(w)),
                "f": df["f"].to_numpy(np.int64),
            }
        )

    table = words.map_batches(
        arrow_out(to_syms), batch_format="pandas", batch_size=None
    ).materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        partials = table.map_batches(
            arrow_out(
                lambda df: _adjacent_pairs_block(
                    df["sym"], df["f"].to_numpy(np.int64)
                )
                if len(df)
                else _empty_pairs()
            ),
            batch_format="pandas",
            batch_size=None,
        )
        summed = adaptive_final(partials, _pair_sum, ["left_sym", "right_sym"],
                                num_partitions=num_partitions)
        top = coalesced_blocks(
            summed.map_batches(
                arrow_out(lambda df: _top_pairs(df, 1)), batch_format="pandas",
                batch_size=None,
            ),
            lambda df: _top_pairs(df, 1),
        ).take_all()  # exactly one row — bounded by construction
        if not top:
            break
        best = top[0]
        if int(best["freq"]) < min_freq:
            break
        left, right = str(best["left_sym"]), str(best["right_sym"])
        merges.append((left, right, int(best["freq"])))
        pat = _merge_pattern(left, right)
        merged = _merge_repl(left, right)

        def rewrite(df: pd.DataFrame, pat=pat, merged=merged) -> pd.DataFrame:
            out = df.copy()
            out["sym"] = out["sym"].str.replace(pat, merged, regex=True)
            return out

        table = table.map_batches(
            arrow_out(rewrite), batch_format="pandas", batch_size=None
        ).materialize()
    return merges


def _encode_distinct(words: np.ndarray, merge_list: list[tuple[str, str]]) -> np.ndarray:
    """Token count per distinct word after applying merges in rank order.
    One regex pass per merge over a single newline-separated
    concatenation of the batch's distinct words: '\\n' satisfies the
    boundary lookarounds (it is whitespace, so word-initial symbols
    still match) but never matches the pattern's literal ' ' joiner, so
    merges cannot span words — and symbols themselves can never contain
    whitespace (words come from .split())."""
    if len(words) == 0:
        return np.zeros(0, dtype=np.int64)
    blob = "\n".join(" ".join(w) for w in words)
    for left, right in merge_list:
        blob = _merge_pattern(left, right).sub(_merge_repl(left, right), blob)
    return np.fromiter(
        (seq.count(" ") + 1 if seq else 0 for seq in blob.split("\n")),
        dtype=np.int64,
        count=len(words),
    )


def bpe_encode_counts(ds, merges: pd.DataFrame, num_partitions: int | None = None):
    """Per-document BPE token counts under a learned merge list:
    (doc_id, n_words, n_bpe_tokens). The merge list broadcasts once via
    ``ray.put``; each batch encodes only its DISTINCT words (factorize)
    and sums per document — shuffle-free."""
    import ray

    merge_list = list(zip(merges["left_sym"].astype(str), merges["right_sym"].astype(str)))
    merges_ref = ray.put(merge_list)

    def encode(batch: pa.Table) -> pd.DataFrame:
        ml = ray.get(merges_ref)
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        word_lists = [(t or "").lower().split() for t in texts]
        lens = np.fromiter((len(ws) for ws in word_lists), np.int64, count=len(word_lists))
        flat = np.asarray(
            [w for ws in word_lists for w in ws], dtype=object
        )
        if len(flat):
            codes, uniques = pd.factorize(flat)
            per_word = _encode_distinct(np.asarray(uniques, dtype=object), ml)[codes]
            doc_of = np.repeat(np.arange(len(word_lists)), lens)
            tok = np.zeros(len(word_lists), dtype=np.int64)
            np.add.at(tok, doc_of, per_word)
        else:
            tok = np.zeros(len(word_lists), dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": doc_ids, "n_words": lens, "n_bpe_tokens": tok}
        )

    return ds.map_batches(arrow_out(encode), batch_format="pyarrow", batch_size=4096)
