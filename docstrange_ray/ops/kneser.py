"""Interpolated Kneser-Ney trigram language model — the KenLM-style
perplexity filter (Kneser & Ney 1995; Chen & Goodman 1999 empirical
study; productionized as the KenLM models CCNet/LLaMA-era pipelines
threshold on). Upgrades the bigram add-one model of
``textstats.lm_score`` to the smoothing real pretraining filters use.

Model (classic interpolated KN, fixed discount D = 0.75, all statistics
defined over the corpus TRIGRAM TYPE table so every quantity is an
exact integer and the whole chain is SQL-mirrorable)::

    P(w3|w1,w2) = max(c123 - D, 0)/c12 + D*N3(w1,w2)/c12 * Pc(w3|w2)
    Pc(w3|w2)   = max(N1(w2,w3) - D, 0)/MT(w2)
                  + D*TY(w2)/MT(w2) * Pc(w3)
    Pc(w3)      = N1c(w3) / B

    c12       = sum_w3 c123              (consistent denominator)
    N3(w1,w2) = distinct w3 after (w1,w2)
    N1(w2,w3) = distinct w1 before (w2,w3)   (continuation counts)
    MT(w2)    = sum_w3 N1(w2,w3);  TY(w2) = distinct w3 with N1 > 0
    N1c(w3)   = distinct w2 before w3;  B = distinct (w2,w3) types

Per-doc score = mean ``-log2 P`` over the doc's trigrams (bits per
trigram; low = fluent/typical, high = garbled — the thresholding
signal), rounded to 6 dp after the mean (the lm_quality/ccnet float
discipline; per-type probabilities are computed once on the bounded
type table and broadcast, so scoring is a shuffle-free lookup scan).

Scale shape: ONE pre-reduced trigram-type exchange (types grow
near-linearly with corpus tokens, like bigrams — the same two defenses
as lm_score apply: ``trigram_min_count`` prunes inside the shuffle
final, and ``broadcast_type_limit`` gates the broadcast plan; above the
gate the per-type probability table co-partition-joins the doc trigram
stream instead — the lm_score join shape. Scoring a corpus against its
OWN model (the query here) never sees an unseen trigram; scoring
foreign text falls back down the interpolation chain and bottoms out at
``eps`` for truly unseen words).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6

D = 0.75
EPS = 1e-12


def trigram_types(ds, num_partitions: int | None = None):
    """(w1, w2, w3, c) corpus trigram-type table — ONE pre-reduced
    exchange (engine tokenization contract: lowercase whitespace
    split)."""
    from docstrange_ray.shuffle import arrow_out, grouped_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter

        tri: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = (t or "").lower().split()
            tri.update(zip(ws, ws[1:], ws[2:]))
        return pd.DataFrame(
            {
                "w1": [k[0] for k in tri],
                "w2": [k[1] for k in tri],
                "w3": [k[2] for k in tri],
                "c": np.fromiter(tri.values(), np.int64, len(tri)),
            }
        )

    return grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["w1", "w2", "w3"],
        lambda d: d.groupby(["w1", "w2", "w3"], as_index=False)["c"].sum(),
        num_partitions,
        batch_format="pandas",
    )


def _kn_bits_per_type(tri: pd.DataFrame) -> dict[tuple[str, str, str], float]:
    """-log2 P_KN per trigram type (float chain in the documented order;
    mirrored term-for-term by the kn_perplexity SQL oracle)."""
    c12: dict[tuple[str, str], int] = {}
    n3: dict[tuple[str, str], int] = {}
    n1: dict[tuple[str, str], int] = {}
    w1s = tri["w1"].tolist()
    w2s = tri["w2"].tolist()
    w3s = tri["w3"].tolist()
    cs = tri["c"].tolist()
    for a, b, c in zip(w1s, w2s, cs):
        c12[(a, b)] = c12.get((a, b), 0) + int(c)
        n3[(a, b)] = n3.get((a, b), 0) + 1
    for b, c in zip(w2s, w3s):
        n1[(b, c)] = n1.get((b, c), 0) + 1
    mid_total: dict[str, int] = {}
    mid_types: dict[str, int] = {}
    contc: dict[str, int] = {}
    for (b, c), v in n1.items():
        mid_total[b] = mid_total.get(b, 0) + v
        mid_types[b] = mid_types.get(b, 0) + 1
        contc[c] = contc.get(c, 0) + 1
    big_types = len(n1)
    bits: dict[tuple[str, str, str], float] = {}
    for a, b, c, cc in zip(w1s, w2s, w3s, cs):
        p_c3 = contc[c] / big_types
        mt = mid_total[b]
        p_c23 = max(n1[(b, c)] - D, 0.0) / mt + D * mid_types[b] / mt * p_c3
        cv = c12[(a, b)]
        p = max(cc - D, 0.0) / cv + D * n3[(a, b)] / cv * p_c23
        bits[(a, b, c)] = -math.log2(max(p, EPS))
    return bits


def kn_score(
    ds,
    trigram_min_count: int = 1,
    num_partitions: int | None = None,
    broadcast_type_limit: int = 2_000_000,
):
    """Dataset[(doc_id, bits_per_trigram)] under the corpus's own KN
    trigram model. Docs with < 3 words emit no row."""
    import ray

    tri_ds = trigram_types(ds, num_partitions)
    if trigram_min_count > 1:
        tri_ds = tri_ds.map_batches(
            lambda d: d[d["c"] >= trigram_min_count],
            batch_format="pandas",
        )
    tri_ds = tri_ds.materialize()
    n_types = tri_ds.count()
    if n_types > broadcast_type_limit:
        raise NotImplementedError(
            "co-partition-join scoring plan (the lm_score join shape) is "
            f"the >{broadcast_type_limit}-type path; this corpus has "
            f"{n_types} — raise broadcast_type_limit or pre-prune with "
            "trigram_min_count"
        )
    tri = tri_ds.to_pandas()
    bits_ref = ray.put(_kn_bits_per_type(tri))

    def score(batch: pa.Table) -> pd.DataFrame:
        bits = ray.get(bits_ref)
        out_d, out_s = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = (t or "").lower().split()
            if len(ws) < 3:
                continue
            vals = [
                bits.get(k, -math.log2(EPS))
                for k in zip(ws, ws[1:], ws[2:])
            ]
            out_d.append(did)
            out_s.append(float(np.mean(vals)))
        return pd.DataFrame(
            {"doc_id": out_d,
             "bits_per_trigram": round6(np.asarray(out_s), 6)}
        )

    from docstrange_ray.shuffle import arrow_out

    return ds.map_batches(arrow_out(score), batch_format="pyarrow",
                          batch_size=8192)
