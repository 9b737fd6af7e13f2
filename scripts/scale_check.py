"""Bigger-N scale check for the session-14 ops (the block-12 lesson:
'would this hold at 1000x?' needs an actual bigger-N run — block-level
skew and super-linear stages only show past the usual bench corpus).

Runs each op at two sizes (default 200k and 1M rows) on deterministic
synthetic inputs and reports wall seconds + per-row cost ratio. A
scale-safe op's per-row cost should be ~flat (ratio ~1); super-linear
growth flags a hidden materialization or quadratic stage.

Usage: python scripts/scale_check.py [small] [big]
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

SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


def synth_rows(n: int):
    """(doc_id, source, val) — 20 sources, uniform-ish float vals."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array([f"src{int(i) % 20}" for i in ids]),
                "val": pa.array(
                    ((ids * 2654435761) % (1 << 30)).astype(np.float64) / 1024.0
                ),
            }
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def synth_edges(n: int):
    """Path-heavy graph: chains of length 100 (n/100 components) plus
    one long chain of 10k — the diameter-adversarial shape."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = ids
        dst = np.where((ids + 1) % 100 == 0, ids, ids + 1)  # chain breaks
        lo = ids < 10_000  # one long chain overrides the breaks
        dst = np.where(lo, ids + 1, dst)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def synth_baskets(n: int):
    """~n basket rows, 5 items each, item universe n//50 (support ~avg
    250 per pair-window — frequent triples exist at every size)."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        basket = ids // 5
        item = (basket % 997) * 3 + (ids % 5)  # clustered items -> triples
        return pa.table({"basket": pa.array(basket), "item": pa.array(item)})

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def timed(name, n, fn):
    t0 = time.time()
    out = fn()
    cnt = out.count() if hasattr(out, "schema") else len(out)  # Dataset vs DataFrame
    el = time.time() - t0
    print(f"{name} n={n}: {el:.1f}s rows_out={cnt} us/row={1e6*el/n:.2f}",
          flush=True)
    return el


def run(n: int) -> dict:
    from docstrange_ray.ops.graph import connected_components
    from docstrange_ray.ops.itemsets import frequent_triples
    from docstrange_ray.ops.rankstats import select_quantiles
    from docstrange_ray.ops.sampling import interleave_by_source

    res = {}
    rows = synth_rows(n).materialize()
    res["interleave"] = timed(
        "interleave_by_source", n,
        lambda: interleave_by_source(
            rows, {f"src{i}": 1 + i % 4 for i in range(20)}
        ),
    )
    res["quantiles"] = timed(
        "select_quantiles", n,
        lambda: select_quantiles(rows, "val", ((1, 4), (1, 2), (99, 100))),
    )
    res["components"] = timed(
        "connected_components", n,
        lambda: connected_components(synth_edges(n)),
    )
    res["triples"] = timed(
        "frequent_triples", n,
        lambda: frequent_triples(
            synth_baskets(n), "basket", "item", min_support=2
        ),
    )
    return res


print(f"== scale check {SMALL} vs {BIG} (32 cpus) ==", flush=True)
small = run(SMALL)
big = run(BIG)
for k in small:
    ratio = (big[k] / BIG) / (small[k] / SMALL)
    print(f"{k}: per-row cost ratio big/small = {ratio:.2f}", flush=True)
ray.shutdown()
