"""Mergeable-sketch operators: bounded-memory approximations whose
communication volume is independent of the key cardinality, closed with
an exact verify pass so the emitted answer is EXACT.

``heavy_tokens`` is the canonical shape (Misra-Gries summaries, the
mergeable-summary construction of Agarwal et al., "Mergeable Summaries",
PODS 2012 — public literature): at 100 TB a token-frequency question
over an unbounded vocabulary cannot afford a full token shuffle, but a
k-counter sketch per batch ships O(k) rows regardless of batch token
count, and the MG merge guarantee (any token with global count
> n/(k+1) survives with lower bound >= count - n/(k+1)) makes the small
candidate set provably complete for the asked threshold. A second,
shuffle-free broadcast pass counts ONLY the candidates exactly, so the
final answer equals the naive GROUP BY — which is exactly what the
DuckDB oracle runs.

Contrast with ``textstats.top_ngrams``: that op hash-shuffles one
partial row per distinct gram per batch (right when a ranked top-k of
the whole distribution is wanted); this one never shuffles the
vocabulary at all (right when only the few heavy keys matter).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.ops.textstats import word_counts

# str.split() never yields an empty string, so "" is a safe sentinel
# token for carrying per-batch word totals through the same columns.
_TOTAL = ""


def _mg_compress(vc: pd.Series, k: int) -> pd.Series:
    """Misra-Gries compression of an EXACT count histogram to <= k
    counters: subtract the (k+1)-th largest count from the top k and
    drop non-positive remainders. Per-input error <= total/(k+1)."""
    if len(vc) <= k:
        return vc
    vc = vc.sort_values(ascending=False, kind="mergesort")
    d = int(vc.iloc[k])
    kept = vc.head(k) - d
    return kept[kept > 0]


def _hll_registers(values: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (2^p uint8) for a batch of DISTINCT string
    values: md5 per distinct value (process-stable, like every hash in
    this repo), top p bits pick the register, rho = leading-zero count
    of the remaining 64-p bits + 1; registers take the elementwise max."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    import hashlib

    digest = b"".join(
        hashlib.md5(str(v).encode("utf-8")).digest()[:8] for v in values
    )
    h = np.frombuffer(digest, dtype=">u8").astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rho = leading zeros of `rest` + 1, capped at 64 - p + 1 by sentinel
    rho = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        rho[mask] += shift
        with np.errstate(over="ignore"):
            v[mask] <<= np.uint64(shift)
    rho += 1
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct(ds, value_col: str, group_key: str, p: int = 14):
    """Approximate COUNT(DISTINCT value_col) per group via HyperLogLog.

    Scale shape: each batch reduces to one 2^p-byte register array per
    group seen (16 KiB at p=14 — independent of batch cardinality), the
    bounded register partials coalesce, and merge = elementwise max, an
    associative/commutative reduction — so the estimate is IDENTICAL at
    any batching or parallelism (pinned by test), with standard error
    ~1.04/sqrt(2^p) (~0.8% at p=14) vs the exact count. Use
    ``relational.event_user_reach`` when exactness is required and the
    pair shuffle is affordable; this op is the one-pass, shuffle-free
    alternative for 100-TB cardinality dashboards.
    Returns Dataset[(group_key, n_distinct_approx)].
    """
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        groups, regs = [], []
        for g, sub in df.groupby(group_key, sort=False):
            vals = pd.unique(sub[value_col].astype(str))
            groups.append(g)
            regs.append(_hll_registers(vals, p).tobytes())
        return pd.DataFrame({group_key: groups, "regs": regs})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for g, sub in df.groupby(group_key, sort=True):
            merged = np.zeros(1 << p, dtype=np.uint8)
            for b in sub["regs"]:
                np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
            out_g.append(g)
            out_n.append(_hll_estimate(merged))
        return pd.DataFrame(
            {group_key: out_g, "n_distinct_approx": np.asarray(out_n, dtype=np.int64)}
        )

    partials = ds.map_batches(
        arrow_out(partial), batch_format="pyarrow", batch_size=65536
    )
    return coalesced_blocks(partials, combine)


def heavy_tokens(ds, fraction: float = 0.01, k: int | None = None):
    """Exact corpus tokens occurring in >= ``fraction`` of all token
    instances, computed WITHOUT a vocabulary shuffle.

    Phase 1 (candidates): each batch builds an exact word histogram and
    MG-compresses it to k counters (k defaults to max(ceil(2/fraction),
    64), so the merged sketch error n/(k+1) < fraction*n/2 and no true
    heavy hitter can be pruned). Sketch rows (<= k+1 per batch,
    including a "" sentinel carrying the batch word total) merge by
    token — the only exchange in the op, and it moves sketch rows, not
    the vocabulary. Candidates = tokens with merged lower bound >=
    (fraction - 1/(k+1)) * n.

    Phase 2 (exact verify): the bounded candidate list broadcasts via
    ``ray.put``; each batch emits exact counts restricted to it plus its
    word total; a bounded coalesced combine applies the HAVING
    count >= fraction * n with the fraction as an exact decimal
    rational (cross-multiplied Python ints — boundary counts cannot
    diverge from the oracle's DECIMAL threshold).
    Returns Dataset[(token, n_occurrences)].
    """
    import ray

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks, grouped_blocks

    if not 0 < fraction < 1:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    if k is None:
        k = max(int(np.ceil(2.0 / fraction)), 64)
    if (k + 1) * fraction <= 1:
        # completeness precondition: the merged-sketch error bound
        # n/(k+1) must be BELOW the asked threshold fraction*n, or true
        # heavy hitters can be compressed away before the verify pass
        raise ValueError(
            f"k={k} too small for fraction={fraction}: need 1/(k+1) < fraction "
            f"(k >= {int(np.ceil(1.0 / fraction))})"
        )
    # the decimal the caller WROTE (str(0.07) == '0.07'), as an exact
    # rational — mirrors how the SQL literal is parsed as DECIMAL
    _frac = Fraction(str(fraction))

    def mg_partial(batch: pa.Table) -> pd.DataFrame:
        full = word_counts(batch.column("text").to_pylist())
        vc = _mg_compress(full, k)
        return pd.DataFrame(
            {
                "token": np.append(vc.index.to_numpy(dtype=object), _TOTAL),
                "lb": np.append(
                    vc.to_numpy(dtype=np.int64), np.int64(full.sum())
                ),
            }
        )

    merged = grouped_blocks(
        ds.map_batches(arrow_out(mg_partial), batch_format="pyarrow", batch_size=65536),
        ["token"],
        lambda df: df.groupby("token", as_index=False)["lb"].sum(),
        batch_format="pandas",
    )

    def pick_candidates(df: pd.DataFrame) -> pa.Table:
        n = int(df.loc[df["token"] == _TOTAL, "lb"].sum())
        floor = (fraction - 1.0 / (k + 1)) * n
        cand = df[(df["token"] != _TOTAL) & (df["lb"] >= floor)]
        # explicit Arrow type: an EMPTY object column would otherwise
        # enter Ray as a null-typed schema and degrade downstream
        return pa.Table.from_arrays(
            [pa.array(cand["token"].tolist(), type=pa.string())], names=["token"]
        )

    candidates = [
        r["token"] for r in coalesced_blocks(merged, pick_candidates).take_all()
    ]
    cand_ref = ray.put(frozenset(candidates))

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        full = word_counts(batch.column("text").to_pylist())
        vc = full[full.index.isin(cand)]
        return pd.DataFrame(
            {
                "token": np.append(vc.index.to_numpy(dtype=object), _TOTAL),
                "n_occurrences": np.append(
                    vc.to_numpy(dtype=np.int64), np.int64(full.sum())
                ),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["n_occurrences"].sum()
        n = int(g.loc[g["token"] == _TOTAL, "n_occurrences"].sum())
        # exact-rational HAVING: `count >= fraction * n` in binary
        # floats can disagree with the oracle's DECIMAL threshold at
        # exact-boundary counts (0.07 * 100 = 7.000000000000001), so
        # compare with the decimal fraction cross-multiplied in exact
        # Python ints — identical to DECIMAL * BIGINT in SQL
        p, q = _frac.numerator, _frac.denominator
        mask = [
            t != _TOTAL and int(c) * q >= p * n
            for t, c in zip(g["token"], g["n_occurrences"])
        ]
        out = g[np.asarray(mask, dtype=bool)]
        # explicit Arrow schema so an all-filtered (empty) result keeps
        # (token: string, n_occurrences: int64) instead of null types
        return pa.Table.from_arrays(
            [
                pa.array(out["token"].tolist(), type=pa.string()),
                pa.array(out["n_occurrences"].tolist(), type=pa.int64()),
            ],
            names=["token", "n_occurrences"],
        )

    exact = ds.map_batches(
        arrow_out(exact_partial), batch_format="pyarrow", batch_size=65536
    )
    return coalesced_blocks(exact, final)


# ---------------------------------------------------------------------------
# Approximate quantiles: MRL-style compactor hierarchy (Manku et al.,
# SIGMOD 1998; the KLL refinement is Karnin et al., FOCS 2016 — public
# literature). Level h holds items of weight 2^h; a level over capacity
# sorts and keeps alternating elements (offset flips per compaction, the
# standard derandomization), pushing the survivors one level up.
# ---------------------------------------------------------------------------


def _mrl_compress(levels: list[np.ndarray], k: int, counters: list[int]) -> None:
    """In-place compaction cascade: any level above ``k`` items halves
    into the next level. Deterministic (counter-driven offset), so a
    given ingest order always yields the same sketch."""
    h = 0
    while h < len(levels):
        if len(levels[h]) > k:
            vals = np.sort(levels[h], kind="mergesort")
            while len(counters) <= h:
                counters.append(0)
            off = counters[h] & 1
            counters[h] += 1
            survivors = vals[off::2]
            levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 == len(levels):
                levels.append(np.empty(0, dtype=np.float64))
            levels[h + 1] = np.concatenate([levels[h + 1], survivors])
        h += 1


def _mrl_from_values(vals: np.ndarray, k: int) -> list[np.ndarray]:
    levels = [np.asarray(vals, dtype=np.float64)]
    _mrl_compress(levels, k, [0])
    return levels


def _mrl_merge(a: list[np.ndarray], b: list[np.ndarray], k: int) -> list[np.ndarray]:
    n = max(len(a), len(b))
    merged = []
    for h in range(n):
        xs = a[h] if h < len(a) else np.empty(0, dtype=np.float64)
        ys = b[h] if h < len(b) else np.empty(0, dtype=np.float64)
        merged.append(np.concatenate([xs, ys]))
    _mrl_compress(merged, k, [0] * len(merged))
    return merged


def _mrl_quantiles(levels: list[np.ndarray], qs: tuple) -> list[float]:
    """quantile_disc semantics over the weighted sketch items: smallest
    value whose cumulative weight reaches ceil(q * total_weight)."""
    vals = np.concatenate([lv for lv in levels if len(lv)]) if any(
        len(lv) for lv in levels
    ) else np.empty(0, dtype=np.float64)
    if len(vals) == 0:
        return [float("nan")] * len(qs)
    wts = np.concatenate(
        [np.full(len(lv), 1 << h, dtype=np.int64) for h, lv in enumerate(levels) if len(lv)]
    )
    order = np.argsort(vals, kind="mergesort")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = []
    for q in qs:
        target = int(np.ceil(q * total)) if q > 0 else 1
        out.append(float(vals[np.searchsorted(cum, max(target, 1))]))
    return out


def approx_quantiles(
    ds,
    value_col: str,
    group_key: str,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = 200,
):
    """Approximate per-group quantiles via a mergeable MRL compactor
    sketch — the unbounded-value-cardinality replacement for
    ``rankstats.group_quantiles`` (whose exact value-count histogram
    exchange assumes a bounded distinct-value space: right for integer
    lengths, wrong for e.g. continuous scores at 100 TB).

    Scale shape: each batch reduces every group it sees to O(k log n/k)
    sketch items serialized as ONE binary row, partials coalesce
    bounded, and merge is level-wise concat + compaction. Rank error is
    O(log(n/k)/k) (~1-2% at k=200; pinned by test vs exact quantiles).
    Returns Dataset[(group_key, n, q50, q90, q99)] for the default qs.
    """
    import pickle

    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if k < 8:
        raise ValueError(f"k must be >= 8, got {k}")

    # int(round(...)): int(0.29 * 100) truncates to 28 (binary floats)
    qcols = [f"q{int(round(q * 100))}" for q in qs]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        groups, blobs, ns = [], [], []
        for g, sub in df.groupby(group_key, sort=False):
            vals = sub[value_col].to_numpy(dtype=np.float64)
            groups.append(g)
            blobs.append(pickle.dumps(_mrl_from_values(vals, k)))
            ns.append(np.int64(len(vals)))
        return pd.DataFrame({group_key: groups, "sketch": blobs, "n": ns})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_key, sort=True):
            merged: list[np.ndarray] = []
            for b in sub["sketch"]:
                merged = _mrl_merge(merged, pickle.loads(b), k)
            quants = _mrl_quantiles(merged, qs)
            rows.append(
                {group_key: g, "n": np.int64(sub["n"].sum()), **dict(zip(qcols, quants))}
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(arrow_out(partial), batch_format="pyarrow", batch_size=65536)
    return coalesced_blocks(parts, combine)


def _cm_bucket(j: int, token: str, w: int) -> int:
    """Row-j Count-Min bucket of a token: md5(f"{j}|{token}") prefix
    mod w — the repo's SQL-parity hash idiom, so the full sketch is
    exactly reproducible in the DuckDB oracle."""
    import hashlib

    return (
        int.from_bytes(
            hashlib.md5(f"{j}|{token}".encode("utf-8")).digest()[:4], "big"
        )
        % w
    )


def countmin_estimates(
    ds, query_tokens: list[str], d: int = 4, w: int = 2048
):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) estimates of the
    corpus frequencies of ``query_tokens``: (token, est) with the
    one-sided guarantee est >= true count and
    est <= true + e/w * N with probability 1 - (1/2)^d-ish per row.

    Scale shape: each block emits its d x w int64 count matrix as ONE
    binary-blob row (d*w*8 bytes, corpus-independent); the coalesced
    final sums the matrices elementwise — mergeability is the whole
    point of the sketch. No token ever crosses an exchange; the
    communication volume is O(blocks * d * w) regardless of vocabulary
    size. Deterministic (md5-derived row hashes), hence SQL-oracleable
    EXACTLY — the oracle replicates the sketch math, not just the true
    counts."""
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if d < 1 or w < 8:
        raise ValueError(f"need d >= 1, w >= 8; got d={d}, w={w}")

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = word_counts(batch.column("text").to_pylist())
        M = np.zeros((d, w), dtype=np.int64)
        toks = vc.index.to_numpy(dtype=object)
        cnts = vc.to_numpy(dtype=np.int64)
        for j in range(d):
            buckets = np.fromiter(
                (_cm_bucket(j, t, w) for t in toks), np.int64, count=len(toks)
            )
            np.add.at(M[j], buckets, cnts)
        return pd.DataFrame({"sketch": [M.tobytes()]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        M = np.zeros((d, w), dtype=np.int64)
        for b in df["sketch"]:
            M += np.frombuffer(b, dtype=np.int64).reshape(d, w)
        ests = [
            int(min(M[j, _cm_bucket(j, t, w)] for j in range(d)))
            for t in query_tokens
        ]
        return pd.DataFrame(
            {"token": list(query_tokens),
             "est": np.asarray(ests, dtype=np.int64)}
        )

    parts = ds.map_batches(
        arrow_out(partial), batch_format="pyarrow", batch_size=65536
    )
    return coalesced_blocks(parts, combine)
