"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS). Selects raw-corpus documents whose hashed-n-gram distribution
matches a small TARGET distribution: the standard pretraining-data
curation step for "make the crawl look like Wikipedia/books".

Method (faithful to the paper's hashed generative model):
1. Features: word unigrams AND bigrams hashed into ``m`` buckets.
2. Fit two bucket multinomials with add-one smoothing: p_raw from the
   whole corpus, p_target from the target subset (here: a designated
   ``source`` value — the driver corpus's stand-in for "trusted set").
3. Per-document importance log-weight: sum over token occurrences of
   lambda_b = ln p_target(b) − ln p_raw(b).
4. Sample k documents WITHOUT replacement via Gumbel top-k on the
   log-weights — with DETERMINISTIC md5-derived Gumbel noise (a pure
   function of doc_id, the engine-wide sampler discipline), so the
   selection is reproducible across processes, batchings and cluster
   sizes.

Scale shape
-----------
- Bucket hashing is per DISTINCT token (factorize) with one md5 per
  distinct string; bucket = first 8 md5 hex digits mod m (the repo's
  SQL-parity hash, so counts are SQL-oracleable).
- Count pass: per-block np.bincount partials (sparse rows) -> ONE
  bounded exchange over <= m buckets. m is corpus-INDEPENDENT (paper
  uses 10k), so the driver-side lambda table is O(m) at any scale.
- Scoring: broadcast the dense m-float lambda vector once (``ray.put``)
  and segment-sum per doc — shuffle-free scan.
- Selection: per-block Gumbel top-k candidates (n_blocks x k rows) ->
  one coalesced final — the ``weighted_sample`` shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.numerics import round6
from docstrange_ray.shuffle import adaptive_final, arrow_out, coalesced_blocks


def _bucket_of_distinct(tokens: np.ndarray, m: int) -> np.ndarray:
    """md5-hash each DISTINCT token string to a bucket in [0, m):
    int(md5(tok)[:8 hex], 16) % m — matches the SQL idiom
    ``('0x' || substr(md5(tok), 1, 8))::UBIGINT % m``."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:4], "big"
            )
            % m
            for t in tokens
        ),
        np.int64,
        count=len(tokens),
    )


def _doc_buckets(texts: list, m: int):
    """Per-batch hashed unigram+bigram bucket ids.

    Returns (bucket_ids, doc_of): flat occurrence arrays. Bigram token
    string is 'w1 w2' (space-joined), mirroring the SQL oracle."""
    word_lists = [(t or "").lower().split() for t in texts]
    uni = [w for ws in word_lists for w in ws]
    bi = [
        f"{ws[i]} {ws[i + 1]}"
        for ws in word_lists
        for i in range(len(ws) - 1)
    ]
    n_uni = np.fromiter((len(ws) for ws in word_lists), np.int64,
                        count=len(word_lists))
    n_bi = np.maximum(n_uni - 1, 0)
    flat = np.asarray(uni + bi, dtype=object)
    doc_of = np.concatenate(
        [
            np.repeat(np.arange(len(word_lists)), n_uni),
            np.repeat(np.arange(len(word_lists)), n_bi),
        ]
    ) if len(flat) else np.zeros(0, np.int64)
    if len(flat) == 0:
        return np.zeros(0, np.int64), doc_of
    codes, uniques = pd.factorize(flat)
    buckets = _bucket_of_distinct(np.asarray(uniques, dtype=object), m)[codes]
    return buckets, doc_of


def bucket_counts(ds, m: int = 4096, target_source: str = "src0"):
    """(bucket, raw_c, tgt_c) over hashed unigram+bigram occurrences:
    raw counts from every document, target counts from documents whose
    ``source`` equals ``target_source``. Exact int64, ONE bounded
    exchange over <= m buckets — SQL-oracleable."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        buckets, doc_of = _doc_buckets(texts, m)
        if len(buckets) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype=np.int64),
                 "raw_c": pd.Series([], dtype=np.int64),
                 "tgt_c": pd.Series([], dtype=np.int64)}
            )
        raw = np.bincount(buckets, minlength=m)
        is_tgt = np.fromiter((s == target_source for s in srcs), bool,
                             count=len(srcs))
        tgt = np.bincount(buckets[is_tgt[doc_of]], minlength=m)
        nz = np.nonzero(raw)[0]
        return pd.DataFrame(
            {"bucket": nz.astype(np.int64),
             "raw_c": raw[nz].astype(np.int64),
             "tgt_c": tgt[nz].astype(np.int64)}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)[["raw_c", "tgt_c"]].sum()

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow",
                              batch_size=8192)
    return adaptive_final(partials, combine, ["bucket"])


LAMBDA_UNITS = 10**8  # per-bucket log-ratio quantization (1e-8 units)


def _lambda_vector(counts: pd.DataFrame, m: int) -> np.ndarray:
    """Dense per-bucket log-ratio lambda_b = ln p_tgt(b) − ln p_raw(b)
    with add-one smoothing (buckets unseen in either side included via
    the +m denominator term), QUANTIZED to int64 ``LAMBDA_UNITS``
    units. Integer quantization makes the per-document sum
    reduction-order-independent and bit-exactly SQL-mirrorable
    (``CAST(ROUND(lam * 1e8) AS BIGINT)``); ``math.log`` (not np.log's
    SIMD variant) is used because it is pinned bit-equal to DuckDB's
    ``LN`` on this platform (the Adamic-Adar lesson, NOTES_r4). The m
    log calls run once on the driver — O(m), corpus-independent."""
    import math

    raw = np.zeros(m, dtype=np.int64)
    tgt = np.zeros(m, dtype=np.int64)
    b = counts["bucket"].to_numpy(np.int64)
    raw[b] = counts["raw_c"].to_numpy(np.int64)
    tgt[b] = counts["tgt_c"].to_numpy(np.int64)
    R, T = int(raw.sum()), int(tgt.sum())
    lam = np.empty(m, dtype=np.int64)
    for i in range(m):
        v = (math.log(tgt[i] + 1.0) - math.log(T + m)) - (
            math.log(raw[i] + 1.0) - math.log(R + m)
        )
        lam[i] = int(math.copysign(math.floor(abs(v * LAMBDA_UNITS) + 0.5), v))
    return lam


def dsir_logweights(ds, m: int = 4096, target_source: str = "src0",
                    counts: pd.DataFrame | None = None):
    """(doc_id, logw): per-document DSIR importance log-weight.
    ``counts`` (from :func:`bucket_counts`) may be precomputed; the
    m-int quantized lambda vector broadcasts once and scoring is a
    shuffle-free scan summing EXACT int64 units per document (order-
    independent), emitted as ``round6(sum / 1e8)`` — the float chain
    the ``dsir_weights`` SQL oracle mirrors step-for-step."""
    import ray

    if counts is None:
        counts = pd.DataFrame(bucket_counts(ds, m, target_source).take_all())
    lam_ref = ray.put(_lambda_vector(counts, m))

    def score(batch: pa.Table) -> pd.DataFrame:
        import ray as _ray

        lam = _ray.get(lam_ref)
        texts = batch.column("text").to_pylist()
        buckets, doc_of = _doc_buckets(texts, m)
        units = np.zeros(len(texts), dtype=np.int64)
        if len(buckets):
            np.add.at(units, doc_of, lam[buckets])
        return pd.DataFrame(
            {"doc_id": batch.column("doc_id").to_pylist(),
             "logw": round6(units.astype(np.float64) / LAMBDA_UNITS, 6)}
        )

    return ds.map_batches(arrow_out(score), batch_format="pyarrow",
                          batch_size=8192)


def _gumbel_of_ids(ids: list) -> np.ndarray:
    """Deterministic standard-Gumbel noise per id: g = -ln(-ln(u)) with
    u the md5-derived uniform in (0,1) of the id (the weighted_sample
    discipline; u is clipped away from {0,1} by the 2^-64 grid).
    ``math.log`` per id (not np.log's SIMD variant): pinned bit-equal
    to DuckDB LN, so the dsir_selected oracle mirrors the key chain
    exactly; the md5 already dominates the per-id cost."""
    import math

    out = np.empty(len(ids), dtype=np.float64)
    for j, i in enumerate(ids):
        h = int.from_bytes(
            hashlib.md5(str(i).encode("utf-8")).digest()[:8], "big"
        )
        u = (float(h) + 0.5) / 2.0**64
        out[j] = -math.log(-math.log(u))
    return out


def dsir_select(ds, k: int, m: int = 4096, target_source: str = "src0"):
    """Gumbel top-k selection on the DSIR log-weights — equivalent to
    sampling k docs without replacement with probability proportional
    to the importance weights (Gumbel-max), fully deterministic here
    because the noise is a pure function of doc_id.

    Returns (doc_id, logw, key) for the k selected docs, key DESC.
    Shuffle-free: per-block top-k candidates -> one coalesced final."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = pd.DataFrame(bucket_counts(ds, m, target_source).take_all())
    scored = dsir_logweights(ds, m, target_source, counts=counts)
    # recompute the unrounded key per block from logw (6 dp) + gumbel:
    # rounding logw before the key keeps Ray and any re-derivation in
    # agreement (the 6 dp grid is the op's published weight).

    def candidates(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        logw = np.asarray(batch.column("logw"), dtype=np.float64)
        key = logw + _gumbel_of_ids(ids)
        df = pd.DataFrame({"doc_id": ids, "logw": logw, "key": key})
        return df.sort_values(["key", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(["key", "doc_id"], ascending=[False, True],
                             kind="mergesort").head(k)
        out = top.reset_index(drop=True)
        out["key"] = round6(out["key"].to_numpy(), 6)
        return out

    parts = scored.map_batches(arrow_out(candidates), batch_format="pyarrow",
                               batch_size=None)
    return coalesced_blocks(parts, final)
