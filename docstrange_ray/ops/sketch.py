"""Mergeable-sketch operators: bounded-memory approximations whose
communication volume is independent of the key cardinality, closed with
an exact verify pass so the emitted answer is EXACT.

``heavy_tokens`` is the canonical shape (Misra-Gries summaries, the
mergeable-summary construction of Agarwal et al., "Mergeable Summaries",
PODS 2012 — public literature): at 100 TB a token-frequency question
over an unbounded vocabulary cannot afford a full token shuffle, but a
k-counter sketch per batch ships O(k) rows regardless of batch token
count, and the MG merge guarantee (any token with global count
> n/(k+1) survives with lower bound >= count - n/(k+1)) makes the small
candidate set provably complete for the asked threshold. A second,
shuffle-free broadcast pass counts ONLY the candidates exactly, so the
final answer equals the naive GROUP BY — which is exactly what the
DuckDB oracle runs.

Contrast with ``textstats.top_ngrams``: that op hash-shuffles one
partial row per distinct gram per batch (right when a ranked top-k of
the whole distribution is wanted); this one never shuffles the
vocabulary at all (right when only the few heavy keys matter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# str.split() never yields an empty string, so "" is a safe sentinel
# token for carrying per-batch word totals through the same columns.
_TOTAL = ""


def _mg_compress(vc: pd.Series, k: int) -> pd.Series:
    """Misra-Gries compression of an EXACT count histogram to <= k
    counters: subtract the (k+1)-th largest count from the top k and
    drop non-positive remainders. Per-input error <= total/(k+1)."""
    if len(vc) <= k:
        return vc
    vc = vc.sort_values(ascending=False, kind="mergesort")
    d = int(vc.iloc[k])
    kept = vc.head(k) - d
    return kept[kept > 0]


def heavy_tokens(ds, fraction: float = 0.01, k: int | None = None):
    """Exact corpus tokens occurring in >= ``fraction`` of all token
    instances, computed WITHOUT a vocabulary shuffle.

    Phase 1 (candidates): each batch builds an exact word histogram and
    MG-compresses it to k counters (k defaults to max(ceil(2/fraction),
    64), so the merged sketch error n/(k+1) < fraction*n/2 and no true
    heavy hitter can be pruned). Sketch rows (<= k+1 per batch,
    including a "" sentinel carrying the batch word total) merge by
    token — the only exchange in the op, and it moves sketch rows, not
    the vocabulary. Candidates = tokens with merged lower bound >=
    (fraction - 1/(k+1)) * n.

    Phase 2 (exact verify): the bounded candidate list broadcasts via
    ``ray.put``; each batch emits exact counts restricted to it plus its
    word total; a bounded coalesced combine applies the exact HAVING
    count >= fraction * n. Returns Dataset[(token, n_occurrences)].
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    if not 0 < fraction < 1:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    if k is None:
        k = max(int(np.ceil(2.0 / fraction)), 64)

    def mg_partial(batch: pa.Table) -> pd.DataFrame:
        words: list[str] = []
        for t in batch.column("text").to_pylist():
            words.extend((t or "").lower().split())
        vc = _mg_compress(pd.Series(words, dtype=object).value_counts(), k)
        return pd.DataFrame(
            {
                "token": np.append(vc.index.to_numpy(dtype=object), _TOTAL),
                "lb": np.append(
                    vc.to_numpy(dtype=np.int64), np.int64(len(words))
                ),
            }
        )

    merged = grouped_blocks(
        ds.map_batches(arrow_out(mg_partial), batch_format="pyarrow", batch_size=65536),
        ["token"],
        lambda df: df.groupby("token", as_index=False)["lb"].sum(),
        batch_format="pandas",
    )

    def pick_candidates(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df.loc[df["token"] == _TOTAL, "lb"].sum())
        floor = (fraction - 1.0 / (k + 1)) * n
        cand = df[(df["token"] != _TOTAL) & (df["lb"] >= floor)]
        return cand[["token"]]

    candidates = [
        r["token"] for r in coalesced_blocks(merged, pick_candidates).take_all()
    ]
    cand_ref = ray.put(frozenset(candidates))

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        words: list[str] = []
        for t in batch.column("text").to_pylist():
            words.extend((t or "").lower().split())
        vc = pd.Series(words, dtype=object).value_counts()
        vc = vc[vc.index.isin(cand)]
        return pd.DataFrame(
            {
                "token": np.append(vc.index.to_numpy(dtype=object), _TOTAL),
                "n_occurrences": np.append(
                    vc.to_numpy(dtype=np.int64), np.int64(len(words))
                ),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n_occurrences"].sum()
        n = int(g.loc[g["token"] == _TOTAL, "n_occurrences"].sum())
        out = g[(g["token"] != _TOTAL) & (g["n_occurrences"] >= fraction * n)]
        return out.reset_index(drop=True)

    exact = ds.map_batches(
        arrow_out(exact_partial), batch_format="pyarrow", batch_size=65536
    )
    return coalesced_blocks(exact, final)
