"""Streaming shared-index dedup tests.

The pair-set cross-check against the batch MinHash chain is the main
oracle: the online index and the shuffle-based pipeline must surface
the SAME signature-verified candidate pairs on the same corpus.
"""

import numpy as np
import ray

from docstrange_ray.ops import dedup
from docstrange_ray.ops.streamdedup import StreamingDedupIndex


def corpus(n=40, dup_every=5):
    """Docs with planted near-dup pairs: every dup_every-th doc is a
    one-word-appended copy of its predecessor."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = []
    for i in range(n):
        if i % dup_every == 1:
            rows.append({"doc_id": i, "text": rows[-1]["text"] + " extra"})
        else:
            rows.append({"doc_id": i, "text": f"{base} unique{i} marker{i * 7}"})
    return rows


def batch_pairs(rows, threshold):
    """Reference: the batch chain's signature-level candidate pairs —
    band-colliding pairs whose MinHash agreement >= threshold."""
    sigs = dedup.minhash_signatures_batch([r["text"] for r in rows])
    keys = dedup._band_keys(sigs)
    ids = [r["doc_id"] for r in rows]
    buckets = {}
    for i, row_keys in enumerate(keys):
        for k in row_keys:
            buckets.setdefault(int(k), []).append(i)
    out = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                agree = float((sigs[i] == sigs[j]).mean())
                if agree >= threshold:
                    out.add((max(ids[i], ids[j]), min(ids[i], ids[j])))
    return out


class TestStreamingDedupIndex:
    def test_pair_set_matches_batch_chain(self):
        rows = corpus()
        idx = StreamingDedupIndex(n_shards=4, threshold=0.5)
        try:
            got = idx.add_corpus(ray.data.from_items(rows)).to_pandas()
            got_pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
            assert got_pairs == batch_pairs(rows, 0.5)
            assert len(got_pairs) >= 7  # the planted dups all collide
        finally:
            idx.shutdown()

    def test_incremental_finds_cross_corpus_dups(self):
        rows_a = corpus(20)
        # corpus B: copies of two A docs (new ids) + fresh docs
        rows_b = [
            {"doc_id": 100, "text": rows_a[0]["text"]},
            {"doc_id": 101, "text": rows_a[7]["text"] + " tail"},
            {"doc_id": 102, "text": "entirely new content nothing shared x y z"},
        ]
        idx = StreamingDedupIndex(n_shards=4, threshold=0.5)
        try:
            idx.add_corpus(ray.data.from_items(rows_a)).to_pandas()
            got = idx.add_corpus(ray.data.from_items(rows_b)).to_pandas()
            pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
            assert (100, 0) in pairs           # exact cross-corpus dup
            assert any(a == 101 for a, _ in pairs)  # near-dup found
            assert not any(a == 102 or b == 102 for a, b in pairs)
            st = idx.stats()
            assert st["entries"] == (len(rows_a) + len(rows_b)) * dedup.BANDS
        finally:
            idx.shutdown()

    def test_order_independent_pair_set(self):
        rows = corpus(15)
        sets = []
        for order in (rows, rows[::-1]):
            idx = StreamingDedupIndex(n_shards=2, threshold=0.5)
            try:
                got = idx.add_corpus(ray.data.from_items(order)).to_pandas()
                sets.append(set(zip(got["doc_id_a"], got["doc_id_b"])))
            finally:
                idx.shutdown()
        assert sets[0] == sets[1]
