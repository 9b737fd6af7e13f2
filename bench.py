#!/usr/bin/env python
"""Benchmark harness.

Headline: end-to-end document-extraction throughput (the BASELINE.json
metric) over a deterministic synthetic interleaved corpus sized off the
sf tier, plus representative per-operator timings over the driver
testdata tables.

Prints ONE JSON line:
    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 then 32) on the same pre-generated corpus and reports both
throughputs + scaling efficiency — the sandbox protocol for the
N-vs-4N-nodes criterion (BASELINE.md §3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SEED = 42
# Bench corpus = 40x the documents-table row count (sf0.1 -> 200k docs):
# large enough that scalable compute dominates the per-run fixed costs
# (session + read planning + plan-sample, ~2.5s) even at 32 CPUs — the
# N-vs-4N scaling-efficiency measurement needs the fixed share small at
# BOTH parallelism levels.
BENCH_DOCS_PER_SF_DOC = 40


CORPUS_VERSION = 3  # bump when synth population mix changes (cache key)


def probe_seconds() -> float:
    """Min-of-3 reps of scripts/noise_probe.py's fixed single-thread
    workload (after one UNTIMED warm-up rep) — recorded into the bench
    JSON so every datapoint carries its own interference reading
    (round-3 protocol: only compare bench numbers whose probe values
    are within ~1.5x; quiet floor ~0.16 s on this host).

    The warm-up is load-bearing: after any idle period (e.g. the 45 s
    acceptance-loop sleep in quiet_bench) the FIRST rep on this host
    reads 10-15x the floor from CPU-frequency ramp / cache cold start —
    measured 2.37 s cold vs 0.215 s for the very next rep — which is a
    local artifact, not cross-VM steal. Round-4 discovery; earlier
    single-rep probe readings in the 1.5-2.5 band are suspect for
    exactly this reason. Min-of-3 then estimates steal, the thing the
    protocol actually gates on."""
    import hashlib

    import numpy as np

    a = np.arange(8_000_000, dtype=np.float64)

    def one_rep() -> float:
        t0 = time.perf_counter()
        for _ in range(5):
            _ = a * 1.0000001 + 3.0
            hashlib.md5(b"x" * 4_000_000).hexdigest()
        return time.perf_counter() - t0

    one_rep()  # warm-up, untimed
    return round(min(one_rep() for _ in range(3)), 3)


def multicore_probe_seconds(n_procs: int = 8) -> dict:
    """Concurrent-capacity probe: run ``n_procs`` copies of the fixed
    single-thread workload in separate PROCESSES and report the
    slowest per-process time plus the /proc/stat sys+steal tick deltas.

    Round-4 discovery: the single-thread probe can sit AT the quiet
    floor while 16 concurrent processes starve 20-50x (measured:
    user 8.5 CPU-s vs sys 448 + steal 220 CPU-s during one 42 s burst —
    the lock-holder-preemption signature of an oversubscribed
    hypervisor). Scaling legs are only interpretable when BOTH probes
    are clean: single-thread <= ~2x floor AND multicore max_proc <=
    ~3x the single-proc floor (~0.35 s for the 2-rep workload)."""
    import subprocess

    code = (
        "import hashlib, numpy as np, time\n"
        "a = np.arange(8_000_000, dtype=np.float64)\n"
        "_ = a * 1.0000001 + 3.0; hashlib.md5(b'x' * 4_000_000).hexdigest()\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(2):\n"
        "    _ = a * 1.0000001 + 3.0\n"
        "    hashlib.md5(b'x' * 4_000_000).hexdigest()\n"
        "print(time.perf_counter() - t0)\n"
    )

    def stat_ticks():
        parts = open("/proc/stat").readline().split()[1:9]
        vals = [int(x) for x in parts]
        return vals[2], vals[7]  # sys, steal

    def burst():
        s0, st0 = stat_ticks()
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen([sys.executable, "-c", code],
                             stdout=subprocess.PIPE)
            for _ in range(n_procs)
        ]
        times = [float(p.communicate()[0]) for p in procs]
        wall = time.perf_counter() - t0
        s1, st1 = stat_ticks()
        return {
            "n_procs": n_procs,
            "wall": round(wall, 2),
            "per_proc_min": round(min(times), 3),
            "per_proc_max": round(max(times), 3),
            "sys_ticks": s1 - s0,
            "steal_ticks": st1 - st0,
        }

    # First burst after an idle period always pays a spawn-storm
    # artifact (page-cache/frequency cold start — measured 36.9 s wall
    # for a burst whose immediate repeat took 1.8 s); it is a warm-up,
    # not a steal measurement. Report the second burst, keep the first
    # for the record.
    warm = burst()
    out = burst()
    out["warmup_wall"] = warm["wall"]
    out["warmup_per_proc_max"] = warm["per_proc_max"]
    return out


# Per-operator queries run in FRESH Ray sessions (one subprocess per
# group): a single 31-op session accumulates object-store pressure and
# idle actor-pool workers that amplify host interference on later ops
# (VERDICT r3: q1_pricing/events_hourly/ann_topk inflated 3-5x with no
# code change). Groups keep the session count bounded (~4 x 3 s session
# overhead) while bounding cross-op accumulation to a group.
OP_GROUPS: list[list[str]] = [
    [
        "real_format_extract",
        "token_count",
        "top_ngrams",
        "tfidf_terms",
        "gopher_filter",
        "c4_clean",
        "heavy_tokens",
        "bm25_search",
        "bpe_merges",
        "unigram_vocab",
        "wp_merges",
        "jsonl_roundtrip",
        "source_interleave",
        "rake_keywords",
        "plsa_doc_topics",
        "customer_scd2",
        "textrank_keywords",
        "kn_perplexity",
    ],
    [
        "exact_dedup",
        "incremental_dedup",
        "minhash_near_dups",
        "jaccard_join_pairs",
        "simhash_pairs",
        "winnow_pairs",
        "near_dup_keep_best",
        "dup_spans",
        "cdc_dup_chunks",
        "pair_edit_distance",
        "edit_dup_pairs",
        "dup_positions_exact",
        "streaming_dedup_pairs",
        "image_near_dups",
        "audio_fp_dups",
        "entity_matches",
        "doc_title_links",
        "cosine_pairs_exact",
    ],
    [
        "pack_offsets",
        "nb_classify",
        "source_mix",
        "semantic_dedup",
        "ann_topk",
        "pq_ann_topk",
        "margin_mined_pairs",
        "curated_docs",
        "ccnet_buckets",
        "embedding_decontam",
        "knn_classify",
        "pca_project",
        "price_quantile_select",
        "returnflag_price_quantiles",
        "kmeans_clusters",
        "kmeans_exact_assignments",
        "kcenter_coreset_exact",
        "hnsw_ann_topk",
    ],
    [
        "q1_pricing",
        "events_hourly",
        "events_sliding",
        "events_last_order",
        "user_sessions",
        "user_running_total",
        "global_doc_rank",
        "quality_classifier",
        "blocklist_tags",
        "source_zscore",
        "compression_stats",
        "knn_classify_ivf",
        "copurchase_triangles",
        "copurchase_reach",
        "copurchase_components",
        "frequent_part_triples",
        "part_link_predictions",
        "lang_source_chi2",
        "price_qty_frontier",
        "returnflag_price_regression",
        "source_length_mwu",
        "copurchase_cheapest",
        "copurchase_assortativity",
        "copurchase_communities",
        "copurchase_communities_weighted",
        "copurchase_modularity_weighted",
        "copurchase_modularity",
        "copurchase_walk_pairs",
        "copurchase_centrality",
        "copurchase_ppr",
        "purchase_hits",
        "leakage_safe_split",
        "copurchase_neighbor_feats",
        "part_rules",
        "event_transitions",
        "tfidf_cosine_pairs",
        "copurchase_biased_walks",
        "copurchase_edge_sim",
        "copurchase_walk_negatives",
    ],
]


def run_ops_group(sf_dir: str, num_cpus: int, group_idx: int) -> dict:
    """One fresh-session subprocess: time each op in OP_GROUPS[group_idx]."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()
    import __ray_entry__ as entrymod

    # UNTIMED session warmup: spawn the worker pool and spin up the
    # hash-shuffle aggregator actors so the group's FIRST op is charged
    # for its own work, not the session spin-up (~7-20 s observed — it
    # made exact_dedup read 26.7 s in a clean window where its warm
    # cost is 3.8 s)
    warm = ray.data.range(4096).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).repartition(8, keys=["id"])
    warm.count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in OP_GROUPS[group_idx]:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.time() - t0, 3)
        del res
    ray.shutdown()
    return timings


def corpus_dir(n_docs: int) -> str:
    return f"/tmp/dsray_bench_corpus/v{CORPUS_VERSION}-seed{SEED}-n{n_docs}"


def ensure_corpus(n_docs: int) -> str:
    """Generate (once) and cache the bench corpus as partitioned parquet.
    Untimed: corpus synthesis stands in for the pre-existing Lance
    corpus, not for pipeline work. Runs in a SUBPROCESS with its own Ray
    session — generating hundreds of blocks inside the measuring session
    leaves hundreds of idle workers behind and skews every later
    timing."""
    path = corpus_dir(n_docs)
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    script = f"""
import shutil, ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from docstrange_ray.synth import synth_dataset
shutil.rmtree({path!r}, ignore_errors=True)
synth_dataset({n_docs}, seed={SEED}, parallelism=min(256, max(32, {n_docs} // 500))).write_parquet({path!r})
open({marker!r}, "w").write(str({n_docs}))
ray.shutdown()
"""
    subprocess.run(
        [sys.executable, "-c", script],
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return path


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    probe_headline = probe_seconds()
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from docstrange_ray.io import read_corpus
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()

    import pyarrow.parquet as pq

    from docstrange_ray.pipeline import extract_pipeline

    n_sf_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_docs = n_sf_docs * BENCH_DOCS_PER_SF_DOC
    cpath = ensure_corpus(n_docs)

    # warm the page cache (untimed) so we measure compute+shuffle, not cold I/O
    read_corpus(cpath).count()

    timings: dict[str, float] = {}

    # --- headline: full extraction pipeline ---
    t0 = time.time()
    out = extract_pipeline(read_corpus(cpath))
    n_out = out.count()
    headline = time.time() - t0
    assert n_out == n_docs, (n_out, n_docs)
    timings["extract_pipeline"] = round(headline, 3)

    # --- forced explode plan on a 50k-doc slice: documents the heavy-tail
    # machinery (explode -> actor pool -> doc_id exchange -> columnar
    # reassembly) cost transparently; the auto plan elides it when the
    # cost gate finds no straggler-class documents ---
    t0 = time.time()
    n_slice = min(50000, n_docs)
    # materialize the slice: extract_pipeline scans its input twice and
    # a bare .limit() over a parallel read can yield a different row
    # subset per scan (docs duplicated or dropped across the branches —
    # observed live; see the input contract in extract_pipeline)
    slice_ds = read_corpus(cpath).limit(n_slice).materialize()
    out = extract_pipeline(slice_ds, skew_threshold_units=16)
    n_exploded = out.count()
    assert n_exploded == n_slice, (n_exploded, n_slice)
    timings["extract_forced_explode_50k"] = round(time.time() - t0, 3)

    # --- production sink: the resumable partitioned job (manifests +
    # atomic parquet), plus the resume no-op — regressions in the sink
    # path are visible per round, not just the streaming headline ---
    import shutil

    from docstrange_ray.pipeline import run_extract_job

    job_dir = "/tmp/dsray_bench_job"
    shutil.rmtree(job_dir, ignore_errors=True)
    fp = f"bench-{n_docs}"
    t0 = time.time()
    man = run_extract_job(read_corpus(cpath), job_dir, fp, num_partitions=64)
    timings["run_extract_job"] = round(time.time() - t0, 3)
    assert sum(m["n_docs"] for m in man) == n_docs
    t0 = time.time()
    rerun = run_extract_job(read_corpus(cpath), job_dir, fp, num_partitions=64)
    assert rerun == [], f"resume rewrote {len(rerun)} partitions"
    timings["run_extract_job_resume_noop"] = round(time.time() - t0, 3)

    # the headline session ends here; per-op groups run in FRESH
    # sessions (see OP_GROUPS) so a long session's accumulated state
    # can't contaminate later ops
    ray.shutdown()

    probes: dict[str, float] = {"headline": probe_headline}
    for gi in range(len(OP_GROUPS)):
        probes[f"group{gi}"] = probe_seconds()
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(num_cpus), GRAFT_SF_DIR=sf_dir
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--ops-group", str(gi)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        timings.update(json.loads(out.strip().splitlines()[-1]))

    result = {
        "metric": "end-to-end extraction seconds (headline) + per-op seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 2),
        "probes": probes,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    return result


def run_headline_only(sf_dir: str, num_cpus: int, n_docs: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from docstrange_ray.io import read_corpus
    from docstrange_ray.pipeline import extract_pipeline
    from docstrange_ray.shuffle import ensure_hash_shuffle

    ensure_hash_shuffle()
    cpath = ensure_corpus(n_docs)
    read_corpus(cpath).count()  # warm page cache (untimed)
    t0 = time.time()
    n_out = extract_pipeline(read_corpus(cpath)).count()
    headline = time.time() - t0
    assert n_out == n_docs, (n_out, n_docs)
    ray.shutdown()
    return {
        "value": round(headline, 3),
        "n_docs": n_docs,
        "num_cpus": num_cpus,
        "docs_per_sec": round(n_docs / headline, 2),
    }


# Scaling pair: N=4 vs 4N=16 of the host's 32 hardware threads. The
# 8-vs-32 pair contends with Ray's own daemons (raylet/GCS/object
# store) at full allocation; 4 -> 16 measures the ENGINE's scaling on
# hardware that actually provides 4x the compute (a Ray-free
# multiprocessing.Pool control of the same extraction kernel scales
# 4 -> 16 at ~1.0 efficiency on this host, so the pair is clean).
SCALING_LO = 4
SCALING_HI = 16
# Each level runs twice (fresh process each time); the MINIMUM is
# reported — this sandbox VM shows +-10% run-to-run interference from
# the shared host, and min-of-2 is the standard noise floor estimate.
# min-of-N per leg: the min is the capability estimator on a shared
# host whose interference arrives in multi-minute bursts (BASELINE.md
# §4b variance notes) — 3 repeats gives each leg a chance to land in a
# gap without changing what is measured. GRAFT_SCALING_REPEATS
# overrides (large-corpus runs amortize bursts by duration instead).
SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", 3))


def run_scaling(sf_dir: str, lo: int = SCALING_LO, hi: int = SCALING_HI) -> dict:
    """Same corpus, fresh headline-only processes at two parallelism
    levels — the sandbox protocol for the N-vs-4N-nodes criterion
    (BASELINE.md §3)."""
    import pyarrow.parquet as pq

    n_sf_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    # GRAFT_SCALING_DOCS overrides the corpus size: a larger corpus
    # shrinks the fixed-cost share (session init + read planning +
    # plan sample, ~2.5 s) at the high-parallelism leg and integrates
    # over more of this host's interference bursts (scripts/noise_probe)
    n_docs = int(
        os.environ.get("GRAFT_SCALING_DOCS", n_sf_docs * BENCH_DOCS_PER_SF_DOC)
    )
    ensure_corpus(n_docs)
    results = {}
    for ncpu in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_N_DOCS=str(n_docs),
        )
        best = None
        for _ in range(SCALING_REPEATS):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "sf": sf_dir,
        "n_docs": n_docs,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": results[lo]["docs_per_sec"],
        f"docs_per_sec_{hi}": results[hi]["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    elif "--ops-group" in sys.argv:
        gi = int(sys.argv[sys.argv.index("--ops-group") + 1])
        print(json.dumps(run_ops_group(sf_dir, ncpu, gi)))
    elif "--headline-only" in sys.argv:
        n_docs = int(os.environ["GRAFT_N_DOCS"])
        print(json.dumps(run_headline_only(sf_dir, ncpu, n_docs)))
    else:
        print(json.dumps(run_bench(sf_dir, ncpu)))
