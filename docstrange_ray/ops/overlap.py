"""Pairwise clipped n-gram overlap — the BLEU-n modified-precision
numerator (Papineni et al. 2002) and ROUGE-n recall numerator (Lin
2004) for candidate document pairs: for each gram order n,

    m_n(a, b) = sum_g min(count_a(g), count_b(g))

so BLEU-n precision = m_n/total_n(a) and ROUGE-n recall =
m_n/total_n(b).  The op emits ONLY exact integers (matches + both
totals per order) — consumers divide; the SQL mirror is therefore
unconditional (no float chain to mirror at all).

Scale shape: pairs are a bounded candidate set (dedup/decontam
output, never all-pairs); texts attach through :func:`dedup.
pair_texts`'s bloom-prefiltered two-join tail (corpus text is scanned
once, filtered to docs that actually appear in a pair), then the
clipped-count kernel runs per pair inside ``map_batches`` — a
fidelity kernel (Counter intersection per pair), batch-parallel.

Tokenization contract (shared with the jaccard oracles):
``text.lower().split()`` = lowercase, split on ASCII whitespace,
empties dropped; docs shorter than the gram order contribute zero
n-grams (BLEU's own convention — no whole-text fallback here, unlike
the dedup shingles, because BLEU totals must be position counts).

Serves the eval/decontamination question "how much of candidate b is
lifted from a?" where set-level Jaccard under-weights repeated
phrases and edit distance over-penalizes reordering.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa


def _gram_counts(words: list[str], n: int) -> Counter:
    if n == 1:
        return Counter(words)
    return Counter(
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    )


def pair_ngram_overlap(docs, pairs, orders=(1, 2), num_partitions=None):
    """Dataset[(doc_id_a, doc_id_b, m{n}, total{n}_a, total{n}_b ...)]
    for each gram order in ``orders`` — all exact int64."""
    from docstrange_ray.ops.dedup import pair_texts

    orders = tuple(orders)

    def kernel(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols: dict[str, list] = {
            "doc_id_a": df["doc_id_a"].tolist(),
            "doc_id_b": df["doc_id_b"].tolist(),
        }
        acc = {n: ([], [], []) for n in orders}
        for ta, tb in zip(df["text_a"], df["text_b"]):
            wa = ta.lower().split()
            wb = tb.lower().split()
            for n in orders:
                ca = _gram_counts(wa, n)
                cb = _gram_counts(wb, n)
                m, tot_a, tot_b = acc[n]
                m.append(sum((ca & cb).values()))
                tot_a.append(sum(ca.values()))
                tot_b.append(sum(cb.values()))
        out = {"doc_id_a": cols["doc_id_a"], "doc_id_b": cols["doc_id_b"]}
        for n in orders:
            m, tot_a, tot_b = acc[n]
            out[f"m{n}"] = pd.Series(m, dtype="int64")
            out[f"total{n}_a"] = pd.Series(tot_a, dtype="int64")
            out[f"total{n}_b"] = pd.Series(tot_b, dtype="int64")
        return pa.Table.from_pandas(
            pd.DataFrame(out), preserve_index=False
        )

    pt = pair_texts(docs, pairs, num_partitions)
    return pt.map_batches(kernel, batch_format="pyarrow")
