"""Sketch-vs-shuffle demonstration for the heavy-hitter question.

Builds a corpus with a LARGE unique-token tail (the regime the
Misra-Gries plan exists for: most of the vocabulary appears once, so a
full token shuffle ships ~every distinct token) plus a handful of
planted heavy tokens, then answers "tokens covering >= 1% of instances"
two ways:

  * sketch  — ops.sketch.heavy_tokens (MG candidates, <= k+1 rows per
              batch cross the one exchange, exact broadcast verify)
  * shuffle — the naive plan: full distinct-token count exchange
              (top_ngrams machinery at n=1) + threshold filter

and reports wall time, exchanged-row counts, and that the answers are
IDENTICAL. Usage: python scripts/sketch_demo.py [n_docs] [uniq_per_doc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import logging

logging.getLogger("ray.data").setLevel(logging.ERROR)

import pandas as pd
import pyarrow as pa

from docstrange_ray.ops.sketch import heavy_tokens
from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
UNIQ = int(sys.argv[2]) if len(sys.argv) > 2 else 30
HEAVY = ["alpha", "beta", "gamma"]  # planted: ~3% of instances each


def build_corpus() -> pa.Table:
    rng = np.random.RandomState(1234)
    rows = []
    for i in range(N_DOCS):
        # unique hex tail: UNIQ singleton tokens per doc
        words = [f"u{rng.randint(1 << 62):x}" for _ in range(UNIQ)]
        words += [HEAVY[i % len(HEAVY)]] * 1  # heavy stream
        rows.append({"doc_id": i, "text": " ".join(words)})
    return pa.Table.from_pylist(rows)


def naive_heavy(ds, fraction):
    """Full vocabulary shuffle: per-batch distinct counts -> token
    exchange -> threshold filter (needs the total via sentinel)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        words = []
        for t in batch.column("text").to_pylist():
            words.extend((t or "").lower().split())
        vc = pd.Series(words, dtype=object).value_counts()
        return pd.DataFrame(
            {
                "token": np.append(vc.index.to_numpy(dtype=object), ""),
                "n": np.append(vc.to_numpy(dtype=np.int64), np.int64(len(words))),
            }
        )

    counts = grouped_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536),
        ["token"],
        lambda df: df.groupby("token", as_index=False)["n"].sum(),
        batch_format="pandas",
    ).materialize()
    total = counts.map_batches(
        lambda b: b.filter(b.column("token").to_pandas().eq("").to_numpy()),
        batch_format="pyarrow",
    ).take_all()[0]["n"]

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        out = df[(df["token"] != "") & (df["n"] >= fraction * total)]
        return out.rename(columns={"n": "n_occurrences"})

    return counts.map_batches(arrow_out(thresh), batch_format="pandas"), counts


tbl = build_corpus()
ds = ray.data.from_arrow(tbl).repartition(64).materialize()
n_tokens = N_DOCS * (UNIQ + 1)
print(f"corpus: {N_DOCS} docs, ~{n_tokens} token instances, "
      f"~{N_DOCS * UNIQ + len(HEAVY)} distinct tokens (singleton-dominated)")

t0 = time.time()
sketch_res = heavy_tokens(ds, fraction=0.01).to_pandas().sort_values("token")
t_sketch = time.time() - t0

t0 = time.time()
naive_ds, counts = naive_heavy(ds, 0.01)
naive_res = naive_ds.to_pandas().sort_values("token")
t_naive = time.time() - t0
vocab_rows = counts.count()

same = sketch_res.reset_index(drop=True).equals(
    naive_res.reset_index(drop=True)[["token", "n_occurrences"]].reset_index(drop=True)
)
print(f"sketch plan : {t_sketch:6.2f}s  (exchange rows <= k+1 per batch; "
      f"answer rows {len(sketch_res)})")
print(f"shuffle plan: {t_naive:6.2f}s  (vocabulary exchange rows ~{vocab_rows})")
print(f"answers identical: {same}")
print(f"heavy tokens found: {sorted(sketch_res['token'])}")
assert same, "sketch answer must equal the naive GROUP BY"
assert sorted(sketch_res["token"]) == sorted(HEAVY)
ray.shutdown()
