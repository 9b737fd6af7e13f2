"""Sharded HNSW approximate nearest neighbor (Malkov & Yashunin 2016,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs", IEEE TPAMI).

Completes the ANN family (brute / LSH / IVF / IVF-PQ — ``ops/ann.py``)
with the graph-based index modern vector stores default to. From
scratch on numpy + heapq; no external ANN library exists in this
environment and none is used.

Distributed shape — the standard SHARDED-HNSW deployment pattern
(how FAISS/Vespa/ES actually run HNSW on a cluster, since HNSW
construction is inherently sequential per graph):

  1. ONE hash exchange shards vectors by ``md5(vec_id) % P`` (content-
     independent, so shards are balanced regardless of embedding
     distribution).
  2. Each shard task builds its OWN in-memory HNSW graph (insertion
     order = vec_id order after an in-shard sort — deterministic at any
     parallelism) and answers the broadcast query matrix locally:
     per-shard top-k candidates.
  3. One coalesced final merges P×k candidates per query by
     (score DESC, vec_id ASC).

  Recall is governed by ``ef`` exactly as in single-node HNSW — the
  shard union's recall is ≥ any single graph's at equal ef because each
  shard searches a smaller graph. For a standing index (repeated query
  batches), the same graphs would live in an actor pool keyed by shard
  (build once in ``__init__``); the one-shot query shape here rebuilds
  per run, which is the right trade for batch pipelines and keeps the
  op fully deterministic and resumable.

Determinism: node levels come from the md5 of the vec_id (the engine's
deterministic-sampler discipline, not RNG state), neighbor selections
tie-break on node id, and the merge orders (score DESC, vec_id ASC) —
rerun- and parallelism-identical output, pinned by tests.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6


class HnswGraph:
    """One in-memory HNSW graph over unit-normalized vectors (cosine
    distance = 1 - dot). Pure numpy/heapq; deterministic."""

    def __init__(self, m: int = 8, ef_construction: int = 64):
        self.m = m
        self.m_max0 = 2 * m
        self.ml = 1.0 / math.log(m)
        self.ef_c = ef_construction
        self.vecs: list[np.ndarray] = []
        self.ids: list[int] = []
        # links[node][layer] -> list of neighbor node indices
        self.links: list[list[list[int]]] = []
        self.entry = -1
        self.max_level = -1

    def _level_of(self, ext_id: int) -> int:
        h = int.from_bytes(
            hashlib.md5(f"hnsw:{ext_id}".encode()).digest()[:8], "big"
        )
        u = (float(h) + 0.5) / 2.0**64
        return int(-math.log(u) * self.ml)

    def _dist(self, a: int, q: np.ndarray) -> float:
        return 1.0 - float(self.vecs[a] @ q)

    def _search_layer(
        self, q: np.ndarray, entries: list[int], ef: int, layer: int
    ) -> list[tuple[float, int]]:
        """Best-first beam search on one layer; returns up to ``ef``
        (dist, node) pairs sorted ascending. Ties break on node index
        (pushed into the heaps as the tuple tail)."""
        visited = set(entries)
        cand: list[tuple[float, int]] = []  # min-heap by dist
        best: list[tuple[float, int]] = []  # max-heap (neg dist)
        for e in entries:
            d = self._dist(e, q)
            heapq.heappush(cand, (d, e))
            heapq.heappush(best, (-d, -e))
            if len(best) > ef:
                heapq.heappop(best)
        while cand:
            d, c = heapq.heappop(cand)
            worst = -best[0][0]
            if d > worst:
                break
            for nb in self.links[c][layer]:
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(nb, q)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, -nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, -ni) for nd, ni in best)

    def add(self, ext_id: int, vec: np.ndarray) -> None:
        node = len(self.vecs)
        self.vecs.append(vec)
        self.ids.append(ext_id)
        level = self._level_of(ext_id)
        self.links.append([[] for _ in range(level + 1)])
        if self.entry < 0:
            self.entry = node
            self.max_level = level
            return
        ep = [self.entry]
        # greedy descent above the node's level
        for lay in range(self.max_level, level, -1):
            ep = [self._search_layer(vec, ep, 1, lay)[0][1]]
        # insert with ef_construction from min(level, max_level) down
        for lay in range(min(level, self.max_level), -1, -1):
            found = self._search_layer(vec, ep, self.ef_c, lay)
            m_max = self.m_max0 if lay == 0 else self.m
            nbrs = [n for _, n in found[: self.m]]
            self.links[node][lay] = list(nbrs)
            for nb in nbrs:
                ln = self.links[nb][lay]
                ln.append(node)
                if len(ln) > m_max:
                    # prune to the m_max closest (simple heuristic;
                    # deterministic tie-break on node index)
                    ln.sort(key=lambda x: (self._dist_nodes(nb, x), x))
                    del ln[m_max:]
            ep = [n for _, n in found]
        if level > self.max_level:
            self.max_level = level
            self.entry = node

    def _dist_nodes(self, a: int, b: int) -> float:
        return 1.0 - float(self.vecs[a] @ self.vecs[b])

    def search(self, q: np.ndarray, k: int, ef: int) -> list[tuple[int, float]]:
        """[(ext_id, cosine)] top-k, cosine DESC then ext_id ASC."""
        if self.entry < 0:
            return []
        ep = [self.entry]
        for lay in range(self.max_level, 0, -1):
            ep = [self._search_layer(q, ep, 1, lay)[0][1]]
        found = self._search_layer(q, ep, max(ef, k), 0)
        out = [(self.ids[n], 1.0 - d) for d, n in found[:k]]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def hnsw_topk(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    ef: int = 64,
    num_shards: int = 8,
    num_partitions: int | None = None,
):
    """Sharded-HNSW cosine top-k: Dataset[(query_id, vec_id, score)]
    with score rounded to 6 dp, (score DESC, vec_id ASC) per query."""
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))

    def shard_tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_pylist()
        shard = [
            int.from_bytes(hashlib.md5(f"shard:{i}".encode()).digest()[:4], "big")
            % num_shards
            for i in ids
        ]
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    def build_and_search(block: pa.Table) -> pd.DataFrame:
        qids, qm = ray.get(qref)
        df = block.to_pandas()
        out_q, out_v, out_s = [], [], []
        for _, grp in df.groupby("shard", sort=False):
            grp = grp.sort_values("vec_id")  # deterministic insertion order
            ids = grp["vec_id"].to_numpy(np.int64)
            mat = _normalize(
                np.stack([np.asarray(v, np.float64) for v in grp["embedding"]])
            )
            g = HnswGraph(m=m, ef_construction=max(ef, 2 * m))
            for i, vid in enumerate(ids):
                g.add(int(vid), mat[i])
            for qi in range(qm.shape[0]):
                for vid, cos in g.search(qm[qi], k, ef):
                    out_q.append(int(qids[qi]))
                    out_v.append(vid)
                    out_s.append(cos)
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "vec_id": pd.Series(out_v, dtype="int64"),
                "score": pd.Series(out_s, dtype="float64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "score", "vec_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        top["score"] = round6(top["score"].to_numpy(), 6)
        return top

    tagged = ds.map_batches(shard_tag, batch_format="pyarrow")
    per_shard = grouped_blocks(
        tagged, ["shard"], arrow_out(build_and_search),
        num_partitions=num_partitions,
    )
    return coalesced_blocks(per_shard, merge)
