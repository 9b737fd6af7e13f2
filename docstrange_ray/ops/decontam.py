"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark document set.

The standard pretraining-hygiene op (n-gram overlap decontamination as
popularized by the GPT-3 / Gopher appendices): evaluation sets are
small (MBs), the training corpus is not, so the scale shape is
broadcast-benchmark + one streaming scan:

  1. Distill the benchmark side to its DISTINCT n-gram set with a
     per-batch partial (set per batch) and a driver union — the
     collected state is benchmark-scale, never corpus-scale.
  2. ``ray.put`` the frozenset ONCE; every scoring task reads the same
     object-store copy (no per-batch reshipping).
  3. Score the corpus in one shuffle-free ``map_batches`` pass: count
     DISTINCT overlapping n-grams per doc, emit docs with >= 1 overlap.

At 100 TB the corpus side streams block-by-block; only step 1's output
(the benchmark gram set) is materialized. If the "benchmark" were
corpus-scale this would become a gram-keyed co-partition join instead
(same exchange pattern as dedup.near_dup_pairs_ds).
"""

from __future__ import annotations

import pyarrow as pa


def _grams(text: str, n: int) -> set[str]:
    ws = (text or "").lower().split()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def decontaminate(corpus_ds, bench_ds, n: int = 13):
    """Dataset[(doc_id, n_overlap)] for corpus docs sharing >= 1 word
    n-gram with any benchmark doc. ``n_overlap`` counts DISTINCT shared
    grams (the usual thresholding statistic)."""
    import ray

    def bench_partial(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column("text").to_pylist():
            grams |= _grams(t, n)
        return pa.Table.from_arrays([pa.array(sorted(grams))], names=["gram"])

    # Benchmark-scale driver union of per-batch distinct sets.
    bench_grams = frozenset(
        r["gram"]
        for r in bench_ds.map_batches(
            bench_partial, batch_format="pyarrow"
        ).take_all()
    )
    ref = ray.put(bench_grams)

    def score(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        ids, overlaps = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            k = len(_grams(t, n) & grams)
            if k:
                ids.append(did)
                overlaps.append(k)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=batch.schema.field("doc_id").type),
                pa.array(overlaps, type=pa.int64()),
            ],
            names=["doc_id", "n_overlap"],
        )

    return corpus_ds.map_batches(score, batch_format="pyarrow")


def embedding_decontaminate(corpus_ds, bench_ds, threshold: float = 0.8):
    """Semantic decontamination: flag corpus vectors whose max cosine
    against ANY benchmark vector reaches ``threshold`` — the
    embedding-space complement to the n-gram overlap rule (catches
    paraphrased eval leakage that shares no 13-gram; the recipe used
    alongside n-gram decontam in recent open-data pipelines, e.g.
    the FineWeb/Dolma-style audits).

    Same scale shape as :func:`decontaminate`: the benchmark side is
    SMALL by definition, so it is collected once (sorted by vec_id),
    L2-normalized, ``ray.put`` ONCE, and the corpus streams through one
    shuffle-free ``map_batches`` doing a single matmul per batch —
    zero exchanges at any corpus size.

    Emits Dataset[(vec_id, bench_id, max_cos)] for flagged vectors;
    ``bench_id`` is the LOWEST benchmark vec_id attaining the (rounded)
    max — deterministic and SQL-reproducible. Comparisons use the
    6-dp-rounded cosine (house convention, DuckDB parity)."""
    import numpy as np
    import ray

    from docstrange_ray.numerics import round6
    from docstrange_ray.ops.ann import _as_matrix, _normalize

    rows = bench_ds.take_all()  # benchmark-scale only
    if not rows:
        raise ValueError("embedding_decontaminate: benchmark dataset is empty")
    rows.sort(key=lambda r: int(r["vec_id"]))
    bench_ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    bench = _normalize(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    )
    ref = ray.put((bench_ids, bench))

    def score(batch: pa.Table) -> pa.Table:
        bids, bmat = ray.get(ref)
        ids = batch.column("vec_id")
        mat = _normalize(_as_matrix(batch.column("embedding")))
        sims = round6(mat @ bmat.T)  # (rows, n_bench), rounded BEFORE argmax
        best = np.argmax(sims, axis=1)  # first max = lowest bench vec_id
        mx = sims[np.arange(len(best)), best]
        keep = mx >= threshold
        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(ids, dtype=np.int64)[keep], type=pa.int64()),
                pa.array(bids[best[keep]], type=pa.int64()),
                pa.array(mx[keep], type=pa.float64()),
            ],
            names=["vec_id", "bench_id", "max_cos"],
        )

    return corpus_ds.map_batches(score, batch_format="pyarrow")
