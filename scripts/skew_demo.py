"""Skew demo: the explode plan's reason to exist, measured.

With the pure mock extractor (microseconds per unit) the adaptive plan
correctly stays inline — the explode/shuffle machinery would only add
overhead (bench.py records both). This demo simulates a REAL layout/OCR
backend (cfg.simulated_unit_cost_ms per unit, cost model scaled to
match) on a corpus with the bimodal skew of the fixtures: now a
500-page scan is seconds of work, an inline batch containing several of
them straggles for minutes, and the cost gate flips the auto plan to
split-stream — whose actor pool spreads every page unit across the
cluster.

Usage: python scripts/skew_demo.py [n_docs] [unit_ms]
Prints one JSON line with both wall times and the chosen plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    unit_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    import logging

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from docstrange_ray.config import ExtractConfig
    from docstrange_ray.pipeline import extract_pipeline, resolve_auto_plan
    from docstrange_ray.shuffle import ensure_hash_shuffle
    from docstrange_ray.synth import gen_corpus_table

    ensure_hash_shuffle()
    # cost model scaled to the simulated backend: ~1000 us per unit-ms
    cfg = ExtractConfig(
        simulated_unit_cost_ms=unit_ms,
        cost_per_page=unit_ms * 1000.0,
        cost_per_media_ref=unit_ms * 1000.0,
    )
    tbl = gen_corpus_table(42, 0, n_docs)
    ds = ray.data.from_arrow(tbl)

    auto_choice = resolve_auto_plan(ds, cfg)

    t0 = time.time()
    n_inline = extract_pipeline(ds, cfg=cfg, skew_threshold_units=None).count()
    t_inline = time.time() - t0

    t0 = time.time()
    n_auto = extract_pipeline(ds, cfg=cfg, skew_threshold_units="auto").count()
    t_auto = time.time() - t0
    assert n_inline == n_auto == n_docs

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "simulated_unit_cost_ms": unit_ms,
                "auto_plan_choice": "split" if auto_choice == "auto" else "inline",
                "inline_plan_sec": round(t_inline, 1),
                "auto_plan_sec": round(t_auto, 1),
                "speedup": round(t_inline / t_auto, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
