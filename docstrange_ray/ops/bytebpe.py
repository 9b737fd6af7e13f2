"""Byte-level BPE (GPT-2-style) training + encoding with byte fallback.

Complements the word-level BPE / WordPiece / unigram-LM trainers
(``ops/bpe.py`` etc. — VERDICT r4 #3): the tokenizer variant real LLM
pipelines actually train (Radford et al. 2019, "Language Models are
Unsupervised Multitask Learners"; reference analogue: the tiktoken seam,
``mcp_server_module/server.py:69-86``). Differences from word-level BPE:

  * The initial alphabet is the 256 BYTES, each mapped to a printable
    unicode stand-in (the published GPT-2 byte↔unicode bijection:
    printable latin ranges keep themselves, the rest shift to
    U+0100+k) — so every possible input byte has a base token and
    encoding can NEVER hit an unknown symbol (byte fallback by
    construction).
  * Text splits into PRE-TOKENS by a regex before pair counting, and
    merges never cross pre-token boundaries. The pattern here is the
    ASCII-class analogue of GPT-2's::

        '(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+

    Two documented divergences from the original: ``\\p{L}/\\p{N}``
    become ASCII classes, and the trailing-whitespace lookahead
    ``\\s+(?!\\S)`` is dropped — RE2 (DuckDB, the oracle engine) has no
    lookarounds, and the engine-wide discipline is that every contract
    regex must mean the same thing in Python ``re`` and RE2 (the RAKE
    NBSP lesson). Neither changes any algorithmic property.

Scale shape: identical to ``bpe.py`` — the working set is the distinct
PRE-TOKEN table (Heaps-bounded), ONE exchange builds it, the merge loop
reuses ``bpe._sequential_merges`` / ``bpe._distributed_merges``
unchanged (mapped symbols never contain whitespace, so the space-joined
symbol-string machinery and its boundary-safe rewrite patterns apply
verbatim). Plan parity (local == distributed merge list) is pinned by
tests the same way.

Round-trip contract: ``decode_ids(encode_bytes(b)) == b`` for ARBITRARY
bytes — pre-tokenization operates on the latin-1 view of the input (a
bijection between bytes and U+00-U+FF chars), which partitions but never
alters the byte sequence. For valid UTF-8 text this splits multi-byte
chars slightly differently than GPT-2's unicode-aware scan (documented
divergence; ASCII text is identical).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.ops.bpe import (
    _adjacent_pairs_block,
    _distributed_merges,
    _empty_pairs,
    _pair_sum,
    _sequential_merges,
    _top_pairs,
)
from docstrange_ray.shuffle import (
    adaptive_final,
    arrow_out,
    coalesced_blocks,
    grouped_blocks,
)

# The contract pre-tokenizer (module docstring). Shared VERBATIM with the
# byte_bpe_pair_counts SQL oracle.
BYTE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

_PRETOKEN_RE = re.compile(BYTE_PRETOKEN_PATTERN)


def byte_to_unicode() -> dict[int, str]:
    """The GPT-2 byte↔unicode bijection: bytes in the printable latin
    ranges ``! .. ~``, ``¡ .. ¬``, ``® .. ÿ`` map to their own
    codepoint; the remaining 68 bytes map to ``U+0100 + k`` in byte
    order (so e.g. space 0x20 → ``Ġ`` U+0120). Every mapped char is
    non-whitespace and printable — the property the space-joined
    symbol-sequence machinery relies on."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: dict[int, str] = {}
    shift = 0
    keep_set = set(keep)
    for b in range(256):
        if b in keep_set:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


_B2U = byte_to_unicode()
_U2B = {c: b for b, c in _B2U.items()}


def map_pretoken(raw: str) -> str:
    """latin-1 pre-token chars → mapped symbol string (one symbol char
    per byte)."""
    return "".join(_B2U[ord(c)] for c in raw)


def pretokenize_bytes(data: bytes) -> list[str]:
    """Partition arbitrary bytes into pre-tokens (latin-1 view; a
    bijective re-labeling, so concatenation reconstructs the input)."""
    return _PRETOKEN_RE.findall(data.decode("latin-1"))


def pretoken_table(ds, text_col: str = "text", num_partitions: int | None = None):
    """(w, f) distinct MAPPED pre-token table over the corpus — ONE
    pre-reduced exchange (the bpe.word_table shape; column names match
    so the merge loops apply unchanged). Case is preserved (byte-level
    BPE never lowercases)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks: list[str] = []
        for t in batch.column(text_col).to_pylist():
            toks.extend(pretokenize_bytes((t or "").encode("utf-8")))
        if not toks:
            return pd.DataFrame(
                {"w": pd.Series(dtype=object), "f": pd.Series(dtype=np.int64)}
            )
        vc = pd.Series(toks, dtype=object).value_counts()
        return pd.DataFrame(
            {
                "w": [map_pretoken(w) for w in vc.index],
                "f": vc.to_numpy(dtype=np.int64),
            }
        )

    return grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["w"],
        lambda df: df.groupby("w", as_index=False)["f"].sum(),
        num_partitions,
        batch_format="pandas",
    )


def byte_pair_counts(ds, top_k: int = 50, num_partitions: int | None = None):
    """Top-``top_k`` first-iteration byte-BPE pair counts: adjacent
    MAPPED-BYTE pairs within pre-tokens, weighted by pre-token
    frequency. SQL-expressible exactly (RE2 pre-tokenization + the
    byte-map VALUES lookup + LEAD pairing), hence the
    ``byte_bpe_pair_counts`` oracle."""

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_pairs()
        spaced = df["w"].astype(str).map(lambda w: " ".join(w))
        return _adjacent_pairs_block(spaced, df["f"].to_numpy(np.int64))

    words = pretoken_table(ds, num_partitions=num_partitions)
    partials = words.map_batches(
        arrow_out(block_pairs), batch_format="pandas", batch_size=None
    )
    summed = adaptive_final(
        partials, _pair_sum, ["left_sym", "right_sym"], num_partitions=num_partitions
    )
    return coalesced_blocks(
        summed.map_batches(
            arrow_out(lambda df: _top_pairs(df, top_k)),
            batch_format="pandas",
            batch_size=None,
        ),
        lambda df: _top_pairs(df, top_k),
    )


def byte_bpe_train(
    ds,
    n_merges: int = 32,
    min_freq: int = 2,
    num_partitions: int | None = None,
    word_type_limit: int = 2_000_000,
    plan: str = "auto",
) -> pd.DataFrame:
    """Learn ``n_merges`` byte-level merges. Same measured local-vs-
    distributed gate and byte-identical-plans contract as
    ``bpe.bpe_train`` — the merge loops are literally shared."""
    if plan not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown plan {plan!r}")
    words = pretoken_table(ds, num_partitions=num_partitions).materialize()
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


# --- encode / decode (byte fallback + round-trip contract) ------------------


def _apply_merges(syms: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE encode: repeatedly merge the LOWEST-RANK adjacent
    pair (leftmost on rank ties) until none applies — the GPT-2
    encoder's priority rule, used by BOTH encode paths here so encoding
    is a single deterministic contract."""
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2 :]
        )
    return syms


def _vocab_ids(merges: pd.DataFrame) -> dict[str, int]:
    """Symbol → token id: ids 0-255 are the 256 base bytes (id = byte
    value); merged symbol of rank r gets id 255 + r. Total vocabulary =
    256 + n_merges, no unknown id."""
    ids = {c: b for b, c in _B2U.items()}
    for r, l, rt in zip(merges["rank"], merges["left_sym"], merges["right_sym"]):
        ids[str(l) + str(rt)] = 255 + int(r)
    return ids


def encode_bytes(data: bytes, merges: pd.DataFrame) -> list[int]:
    """Arbitrary bytes → token ids (byte fallback: every byte has a
    base id, so this total function never fails)."""
    ranks = {
        (str(l), str(r)): int(k)
        for k, l, r in zip(merges["rank"], merges["left_sym"], merges["right_sym"])
    }
    ids = _vocab_ids(merges)
    out: list[int] = []
    for tok in pretokenize_bytes(data):
        syms = _apply_merges([_B2U[ord(c)] for c in tok], ranks)
        out.extend(ids[s] for s in syms)
    return out


def decode_ids(ids: list[int], merges: pd.DataFrame) -> bytes:
    """Token ids → bytes (inverse of :func:`encode_bytes`)."""
    id2sym = {v: k for k, v in _vocab_ids(merges).items()}
    return b"".join(
        bytes(_U2B[c] for c in id2sym[i]) for i in ids
    )


def byte_bpe_token_counts(ds, merges: pd.DataFrame, num_partitions: int | None = None):
    """Per-document byte-BPE token counts under a learned merge list:
    (doc_id, n_bytes, n_tokens). Merge list broadcast once (ray.put);
    each batch encodes only its DISTINCT pre-tokens — shuffle-free."""
    import ray

    merges_ref = ray.put(
        list(
            zip(
                merges["rank"].astype(int),
                merges["left_sym"].astype(str),
                merges["right_sym"].astype(str),
            )
        )
    )

    def encode(batch: pa.Table) -> pd.DataFrame:
        ml = ray.get(merges_ref)
        ranks = {(l, r): k for k, l, r in ml}
        doc_ids = batch.column("doc_id").to_pylist()
        texts = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        tok_lists = [pretokenize_bytes(t) for t in texts]
        cache: dict[str, int] = {}
        n_tok = np.zeros(len(texts), dtype=np.int64)
        for di, toks in enumerate(tok_lists):
            total = 0
            for tok in toks:
                c = cache.get(tok)
                if c is None:
                    c = cache[tok] = len(
                        _apply_merges([_B2U[ord(ch)] for ch in tok], ranks)
                    )
                total += c
            n_tok[di] = total
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_bytes": pd.Series([len(t) for t in texts], dtype="int64"),
                "n_tokens": n_tok,
            }
        )

    return ds.map_batches(arrow_out(encode), batch_format="pyarrow", batch_size=4096)
