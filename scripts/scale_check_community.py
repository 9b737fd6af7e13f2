"""Bigger-N scale check for the round-5 block-4 families (VERDICT r4
#6 protocol): label propagation, modularity, walks + skip-gram pairs,
harmonic centrality, HITS, personalized PageRank, leakage-safe split.
Every op is forced onto its JOIN (scale) plan — the 100-TB path — and
per-row cost ratios big/small should stay ~flat (<= ~1); super-linear
growth flags a hidden materialization or a skew hotspot.

Graph fixture: ring-of-cliques (cliques of 10 chained by one bridge
each) — bounded degree (no skew by construction), planted community
structure so LPA/modularity do real work. Split fixture: every 20th
doc is a near-twin of its predecessor.

Usage: python scripts/scale_check_community.py [small] [big]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import logging

import ray.data
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)

from docstrange_ray.shuffle import ensure_hash_shuffle

ensure_hash_shuffle()

ONLY = set(os.environ.get("C5_ONLY", "").split(",")) - {""}
SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


def synth_graph(n_nodes: int):
    """Ring of cliques of 10: node i joins clique i//10; clique c's
    node c*10 bridges to clique (c+1)*10 mod n. Degree <= 10."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst = [], []
        for i in ids:
            c0 = (i // 10) * 10
            for j in range(int(i) + 1, min(c0 + 10, n_nodes)):
                src.append(int(i))
                dst.append(j)
            if i == c0:  # bridge to next clique head
                nxt = (c0 + 10) % n_nodes
                if nxt != c0:
                    src.append(int(i))
                    dst.append(int(nxt))
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return ray.data.range(n_nodes).map_batches(build, batch_format="pyarrow")


def synth_docs(n: int):
    """Every 20th doc repeats its predecessor's text (planted twins)."""
    import hashlib as _hl

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = []
        for i in ids:
            base = i - 1 if i % 20 == 0 and i > 0 else i
            tag = _hl.md5(str(int(base)).encode()).hexdigest()
            texts.append(
                f"doc {tag[:8]} body {tag[8:16]} words {tag[16:24]} "
                f"tail {tag[24:32]}"
            )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def _want(key: str) -> bool:
    return not ONLY or key in ONLY


def timed(name, n, fn):
    t0 = time.time()
    out = fn()
    cnt = out.count() if hasattr(out, "schema") else len(out)
    el = time.time() - t0
    print(f"{name} n={n}: {el:.1f}s rows_out={cnt} us/row={1e6*el/n:.2f}",
          flush=True)
    return el


def run(n: int) -> dict:
    from docstrange_ray.ops.community import (
        harmonic_centrality,
        label_propagation,
        modularity_stats,
        walk_skipgram_pairs,
    )
    from docstrange_ray.ops.graph import hits, pagerank
    from docstrange_ray.ops.sampling import leakage_safe_split

    res = {}
    g = synth_graph(n).materialize()
    if _want("lpa"):
        res["lpa"] = timed(
            "label_propagation[join]", n,
            lambda: label_propagation(g, rounds=4, plan="join"),
        )
    if _want("modularity"):
        res["modularity"] = timed(
            "modularity_stats[join]", n,
            lambda: modularity_stats(g, rounds=4, plan="join"),
        )
    if _want("walkpairs"):
        res["walkpairs"] = timed(
            "walk_skipgram_pairs[join]", n,
            lambda: walk_skipgram_pairs(g, steps=4, window=2, plan="join"),
        )
    if _want("harmonic"):
        res["harmonic"] = timed(
            "harmonic_centrality[join]", n,
            lambda: harmonic_centrality(g, k_seeds=4, max_hops=3, plan="join"),
        )
    if _want("hits"):
        res["hits"] = timed(
            "hits[join]", n, lambda: hits(g, iterations=3, plan="join")
        )
    if _want("ppr"):
        res["ppr"] = timed(
            "ppr[join]", n,
            lambda: pagerank(g, iterations=5, plan="join",
                             teleport=[0, 10, 20]),
        )
    if _want("biased"):
        from docstrange_ray.ops.community import biased_walks

        res["biased"] = timed(
            "biased_walks[join]", n,
            lambda: biased_walks(g, steps=3, plan="join"),
        )
    if _want("negatives"):
        from docstrange_ray.ops.community import walk_negative_samples

        res["negatives"] = timed(
            "walk_negatives[join]", n,
            lambda: walk_negative_samples(g, steps=3, window=2,
                                          k_neg=2, plan="join"),
        )
    if _want("edgesim"):
        from docstrange_ray.ops.community import edge_structural_sim

        res["edgesim"] = timed(
            "edge_structural_sim[join]", n,
            lambda: edge_structural_sim(g, plan="join"),
        )
    if _want("split"):
        docs = synth_docs(n).materialize()
        res["split"] = timed(
            "leakage_safe_split[join]", n,
            lambda: leakage_safe_split(docs, plan="join"),
        )
    return res


print(f"== small n={SMALL} ==", flush=True)
small = run(SMALL)
print(f"== big n={BIG} ==", flush=True)
big = run(BIG)
print("== per-row cost ratios (big/small, ~1 is linear) ==")
for k in small:
    r = (big[k] / BIG) / (small[k] / SMALL)
    print(f"{k}: {r:.2f}")
ray.shutdown()
