"""Bigger-N scale check for the session-16 ops (block-12 lesson):
grouped radix quantiles, grouped exact corr, Pareto skyline, link
prediction, RAKE, chi-square/KS. Per-row cost ratio big/small should
stay ~flat; super-linear growth flags a hidden materialization.

Usage: python scripts/scale_check_s16.py [small] [big]
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

_WORDS = [f"w{i}" for i in range(300)]
_STOPISH = ["the", "of", "and", "a", "in"]


def synth(n: int):
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        val = ((ids * 2654435761) % (1 << 30)).astype(np.float64) / 1024.0
        y = val * 3.0 + (ids % 97).astype(np.float64)
        texts = []
        for i in ids:
            ws = []
            for j in range(24):
                h = (int(i) * 31 + j * 7) % 331
                ws.append(_STOPISH[h % 5] if h % 6 == 0 else _WORDS[h % 300])
            texts.append(" ".join(ws))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": pa.array([f"src{int(i) % 20}" for i in ids]),
                "label": pa.array([f"l{int(i) % 7}" for i in ids]),
                "val": pa.array(val),
                "y": pa.array(y),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def synth_edges(n: int):
    """Chains of 100 + shared hub links every 1000 (wedge-rich)."""
    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = ids
        dst = np.where((ids + 1) % 100 == 0, ids, ids + 1)
        keep = src != dst
        return pa.table({"a": pa.array(np.minimum(src, dst)[keep]),
                         "b": pa.array(np.maximum(src, dst)[keep])})

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")


def timed(name, n, fn):
    t0 = time.time()
    out = fn()
    cnt = out.count() if hasattr(out, "schema") else len(out)
    el = time.time() - t0
    print(f"{name} n={n}: {el:.1f}s rows_out={cnt} us/row={1e6*el/n:.2f}",
          flush=True)
    return el


def run(n: int) -> dict:
    from docstrange_ray.ops.graph import link_predictions
    from docstrange_ray.ops.keywords import rake_keywords
    from docstrange_ray.ops.rankstats import (
        group_corr,
        group_select_quantiles,
        pareto_front,
    )
    from docstrange_ray.ops.stats_tests import chi2_independence, ks_two_sample

    res = {}
    rows = synth(n).materialize()
    res["gsq"] = timed(
        "group_select_quantiles", n,
        lambda: group_select_quantiles(rows, "source", "val"),
    )
    res["gcorr"] = timed(
        "group_corr", n,
        lambda: group_corr(rows, "source", "val", "y"),
    )
    res["pareto"] = timed(
        "pareto_front", n,
        lambda: pareto_front(rows, "val", "y", minimize=(True, False)),
    )
    res["rake"] = timed(
        "rake_keywords", n, lambda: rake_keywords(rows, k=50)
    )
    # chi2's contract is bounded-cardinality columns (source x label);
    # a continuous column must be binned first — see module docstring
    res["chi2"] = timed(
        "chi2_independence", n,
        lambda: chi2_independence(rows, "source", "label"),
    )
    res["ks"] = timed(
        "ks_two_sample", n,
        lambda: ks_two_sample(rows, "val", "source", "src0", "src1"),
    )
    res["linkpred"] = timed(
        "link_predictions", n,
        lambda: link_predictions(synth_edges(n)),
    )
    return res


print(f"== scale check {SMALL} vs {BIG} (32 cpus) ==", flush=True)
small = run(SMALL)
big = run(BIG)
for k in small:
    ratio = (big[k] / BIG) / (small[k] / SMALL)
    print(f"{k}: per-row cost ratio big/small = {ratio:.2f}", flush=True)
ray.shutdown()
