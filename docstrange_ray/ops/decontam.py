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
