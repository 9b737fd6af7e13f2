#!/usr/bin/env python
"""Distributed-dedup scale demo: the full near-dup chain (LSH candidates
-> bloom-prefiltered repartition verify -> label-propagation connected
components -> drop list) over a corpus with PLANTED duplicate clusters,
entirely Dataset-to-Dataset.

    python scripts/dedup_demo.py [n_base_docs] [n_clusters]

Corpus: ``n_base_docs`` unique documents (60 deterministic words from a
5k vocabulary) plus duplicate clusters — cluster c replicates base doc c
with one-word-drop mutations (exact-Jaccard ~0.95 >= the 0.8
threshold), cluster sizes cycling 2..8. Every planted duplicate should
resolve to its base representative, so expected drops = total planted
duplicates; the demo reports measured recall and wall time. Prints ONE
JSON line."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_CLUSTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
VOCAB = 5_000
WORDS_PER_DOC = 60
CLUSTER_SIZES = [2, 3, 4, 5, 6, 7, 8]  # cycling


def _words(doc_id: int) -> list[str]:
    out = []
    seed = f"dedup-demo:{doc_id}".encode()
    h = b""
    while len(out) < WORDS_PER_DOC:
        h = hashlib.md5(seed + h).digest()
        for i in range(0, 16, 2):
            out.append(f"w{int.from_bytes(h[i : i + 2], 'big') % VOCAB}")
    return out[:WORDS_PER_DOC]


def make_corpus():
    import pyarrow as pa
    import ray.data

    dup_rows = []
    next_id = N_BASE
    for c in range(N_CLUSTERS):
        size = CLUSTER_SIZES[c % len(CLUSTER_SIZES)]
        base = _words(c)
        for m in range(size - 1):
            mutated = list(base)
            del mutated[(7 * m + 3) % len(mutated)]  # one-word drop
            dup_rows.append({"doc_id": next_id, "text": " ".join(mutated)})
            next_id += 1

    def gen_base(batch):
        ids = batch["id"].tolist() if hasattr(batch["id"], "tolist") else batch["id"]
        return pa.Table.from_arrays(
            [
                pa.array([int(i) for i in ids], type=pa.int64()),
                pa.array([" ".join(_words(int(i))) for i in ids]),
            ],
            names=["doc_id", "text"],
        )

    base = ray.data.range(N_BASE).map_batches(gen_base, batch_format="numpy")
    dups = ray.data.from_arrow(pa.Table.from_pylist(dup_rows))
    return base.union(dups), len(dup_rows)


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from docstrange_ray.ops.dedup import near_dup_drop_list_ds
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()
    ds, n_planted = make_corpus()
    ds = ds.materialize()  # corpus pre-exists in a real deployment
    t0 = time.time()
    drops = near_dup_drop_list_ds(ds, threshold=0.8).take_all()
    wall = time.time() - t0
    drop_ids = {r["doc_id"] for r in drops}
    planted_ids = set(range(N_BASE, N_BASE + n_planted))
    true_hits = len(drop_ids & planted_ids)
    print(
        json.dumps(
            {
                "n_docs": N_BASE + n_planted,
                "n_planted_dups": n_planted,
                "n_dropped": len(drop_ids),
                "recall": round(true_hits / max(1, n_planted), 4),
                "false_drops": len(drop_ids - planted_ids),
                "wall_sec": round(wall, 2),
                "docs_per_sec": round((N_BASE + n_planted) / wall, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
