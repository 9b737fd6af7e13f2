"""Streaming near-dup detection against a SHARED MUTABLE MinHash index.

The batch dedup chain (ops/dedup.py) answers "which documents in this
corpus duplicate each other" with shuffles. This module answers the
ONLINE question — "does this new document duplicate anything indexed
so far?" — which a Dataset pipeline cannot express: the index is
corpus-scale state that must MUTATE as the stream flows through it.
This is the one place the brief licenses raw Ray actors ("a shared
mutable index"), and the only raw-actor state in the repo.

Design:
  * ``_BandShard`` actors hold disjoint ranges of the LSH band-key
    space (``key % n_shards``); each owns a ``band_key -> [(doc_id,
    signature)]`` bucket map. Actor calls are serialized per shard, so
    query+insert is atomic — no locks, no lost updates.
  * ``StreamingDedupIndex.add_corpus(ds)`` runs a normal
    ``map_batches`` scan; each task computes MinHash signatures and
    band keys with the batch kernels from ops/dedup, groups rows by
    shard, and round-trips ``query_and_insert`` on the owning actors.
    Blocking ``ray.get`` inside map tasks is the documented price of
    shared state (backpressure still applies — a task occupies its CPU
    slot while it waits).
  * Collisions verify at SIGNATURE level (fraction of equal MinHash
    components >= threshold) — the est_jaccard the batch chain uses
    for its candidate filter — so no document text is ever stored or
    re-shipped; the index holds 8-byte keys + signature bytes only.

Determinism: the emitted PAIR SET is order-independent — two docs
sharing a band key always collide regardless of arrival order (the
later one finds the earlier one; with multi-band double-finds the
output normalizes to doc_id_a > doc_id_b and dedups). Pinned by the
cross-check test against the batch candidate chain. A hot-bucket cap
(``bucket_cap``) compares newcomers only against the bucket's current
min-doc entry once the bucket overflows — the batch star cap's
streaming analogue (cap engagement is arrival-order sensitive; leave
None for exact parity with the batch chain).

Reference: the reference engine's only dedup is a driver-local md5
cache (mcp_server_module/server.py:87-89); this is the
training-data-scale replacement the brief asks for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from docstrange_ray.numerics import round6
from docstrange_ray.ops.dedup import (
    BANDS,
    _band_keys,
    minhash_signatures_batch,
)


@ray.remote(num_cpus=0.25)
class _BandShard:
    """One shard of the mutable LSH index: band_key -> [(doc_id, sig)]."""

    def __init__(self, bucket_cap=None):
        self.buckets: dict[int, list[tuple[int, bytes]]] = {}
        # cached min-doc entry per bucket: once bucket_cap engages,
        # each hot-bucket insert compares against ONLY this entry —
        # rescanning the growing bucket per insert would be O(len)
        # each, quadratic overall (the exact blowup the cap exists to
        # prevent; code-review finding, round 4)
        self._min: dict[int, tuple[int, bytes]] = {}
        self.bucket_cap = bucket_cap
        self.n_entries = 0

    def query_and_insert(self, keys, doc_ids, sigs):
        """For each (band_key, doc, sig): report signature-level
        collisions with already-indexed docs in that bucket, then
        insert. One actor call = atomic; rows processed in doc_id
        order so same-call pairs resolve the same way every run."""
        order = np.argsort(np.asarray(doc_ids, dtype=np.int64), kind="stable")
        out: list[tuple[int, int, float]] = []
        for i in order:
            key, did, sig = int(keys[i]), int(doc_ids[i]), sigs[i]
            bucket = self.buckets.setdefault(key, [])
            cand = bucket
            if self.bucket_cap is not None and len(bucket) >= self.bucket_cap:
                cand = [self._min[key]] if key in self._min else []
            new_sig = np.frombuffer(sig, dtype=np.uint64)
            for odid, osig in cand:
                if odid == did:
                    continue
                agree = float(
                    (np.frombuffer(osig, dtype=np.uint64) == new_sig).mean()
                )
                out.append((did, odid, agree))
            bucket.append((did, sig))
            cur = self._min.get(key)
            if cur is None or did < cur[0]:
                self._min[key] = (did, sig)
            self.n_entries += 1
        return out

    def stats(self):
        return {"buckets": len(self.buckets), "entries": self.n_entries}


class StreamingDedupIndex:
    """Sharded online MinHash-LSH dedup index (see module docstring)."""

    def __init__(self, n_shards: int | None = None, threshold: float = 0.8,
                 bucket_cap=None):
        import ray as _ray

        if n_shards is None:
            # size shards to the cluster, and never reserve more than
            # half its CPUs (0.25 each) — shard actors that crowd out
            # the map tasks querying them deadlock a small cluster
            ncpu = int(_ray.cluster_resources().get("CPU", 8)) if \
                _ray.is_initialized() else 8
            n_shards = max(2, min(16, ncpu))
        self.n_shards = n_shards
        self.threshold = threshold
        self.shards = [
            _BandShard.remote(bucket_cap) for _ in range(n_shards)
        ]

    def add_corpus(self, ds, batch_size: int = 4096):
        """Stream a corpus into the index. Returns
        Dataset[(doc_id_a, doc_id_b, est_jaccard)] — every pair whose
        band keys collided and whose signature agreement >= threshold,
        normalized doc_id_a > doc_id_b and deduplicated. Docs indexed
        by PREVIOUS add_corpus calls participate (the incremental
        case)."""
        shards = self.shards
        n_shards = self.n_shards
        threshold = self.threshold

        def scan(batch: pa.Table) -> pa.Table:
            doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            texts = batch.column("text").to_pylist()
            if not len(texts):
                return _pairs_table([], [], [])
            sigs = minhash_signatures_batch(texts)  # (n, NUM_PERM)
            keys = _band_keys(sigs)  # (n, BANDS)
            sig_bytes = [s.tobytes() for s in sigs]
            flat_keys = keys.reshape(-1)
            flat_docs = np.repeat(doc_ids, BANDS)
            flat_sidx = np.repeat(np.arange(len(texts)), BANDS)
            shard_of = (flat_keys % n_shards + n_shards) % n_shards
            futs = []
            for sh in range(n_shards):
                m = shard_of == sh
                if not m.any():
                    continue
                futs.append(shards[sh].query_and_insert.remote(
                    flat_keys[m].tolist(),
                    flat_docs[m].tolist(),
                    [sig_bytes[j] for j in flat_sidx[m]],
                ))
            a, b, est = [], [], []
            seen = set()
            for res in ray.get(futs):
                for did, odid, agree in res:
                    if agree < threshold:
                        continue
                    hi, lo = max(did, odid), min(did, odid)
                    if (hi, lo) in seen:
                        continue
                    seen.add((hi, lo))
                    a.append(hi)
                    b.append(lo)
                    est.append(float(round6(agree)))
            return _pairs_table(a, b, est)

        # the same pair can also be double-found across BATCHES (band
        # collisions in two different tasks) — a final exchange dedups
        from docstrange_ray.shuffle import grouped_blocks

        pairs = ds.map_batches(scan, batch_format="pyarrow", batch_size=batch_size)
        return grouped_blocks(
            pairs,
            ["doc_id_a", "doc_id_b"],
            lambda df: df.drop_duplicates(["doc_id_a", "doc_id_b"]),
            batch_format="pandas",
        )

    def stats(self) -> dict:
        per = ray.get([s.stats.remote() for s in self.shards])
        return {
            "n_shards": self.n_shards,
            "buckets": sum(p["buckets"] for p in per),
            "entries": sum(p["entries"] for p in per),
        }

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def _pairs_table(a, b, est) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(a, type=pa.int64()),
            pa.array(b, type=pa.int64()),
            pa.array(est, type=pa.float64()),
        ],
        names=["doc_id_a", "doc_id_b", "est_jaccard"],
    )
