"""Grouped order statistics: per-group top-k and exact distributed
quantiles.

Both are wide-operator shapes a 100-TB curation pipeline needs
constantly ("best k documents per domain", "p99 document length per
source") and both are implemented hot-key-safe by PARTIAL REDUCTION
before the one group-key exchange:

  * ``group_topk`` — each batch locally keeps its k best rows per group,
    so a group with a billion rows ships ``n_batches x k`` candidate
    rows through the shuffle, never the group;
  * ``group_quantiles`` — each batch reduces to ``(group, value, count)``
    rows, so the exchange carries the per-batch DISTINCT-value
    histogram, never the rows. Quantiles over the merged histogram are
    EXACT (no sketch error) whenever the per-group distinct-value count
    is bounded (lengths, token counts, scores in fixed units — the
    curation-stat case). For unbounded continuous values use a sketch
    (see ops/sketch.py) — the exact path's exchange grows with distinct
    values, and the docstring contract is explicit about it.

The reference has no grouped analytics at all (SURVEY §2.5: its
aggregations are per-document, driver-side); these follow the partial
-reduce discipline of relational.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from docstrange_ray.shuffle import arrow_out, grouped_blocks


def group_topk(
    ds,
    group_key: str,
    order_key: str,
    k: int,
    id_key: str = "doc_id",
    descending: bool = True,
    num_partitions: int | None = None,
):
    """Top-``k`` rows per group by ``order_key`` (ties broken by
    ``id_key`` ascending — deterministic across cluster sizes).

    SQL equivalent:
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) <= k``.

    Returns Dataset[(group_key, id_key, order_key, rank)] with rank
    1-based within each group.
    """
    cols = [group_key, id_key, order_key]

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas()
        return (
            df.sort_values([order_key, id_key], ascending=[not descending, True])
            .groupby(group_key, as_index=False, sort=False)
            .head(k)
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values([order_key, id_key], ascending=[not descending, True])
            .groupby(group_key, as_index=False, sort=False)
            .head(k)
            .sort_values([group_key, order_key, id_key], ascending=[True, not descending, True])
        )
        out["rank"] = out.groupby(group_key, sort=False).cumcount() + 1
        return out[[group_key, id_key, order_key, "rank"]]

    candidates = ds.map_batches(arrow_out(local), batch_format="pyarrow")
    return grouped_blocks(
        candidates, [group_key], final, num_partitions, batch_format="pandas"
    )


# quantiles as exact rationals (num, den) so the rank position
# ceil(q * n) is computed in INTEGER arithmetic — no float boundary can
# flip which row a percentile lands on (DuckDB's quantile_disc picks the
# value at 1-indexed position max(1, ceil(q*n)); parity pinned in tests)
DEFAULT_QUANTILES: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100))


def _q_label(num: int, den: int) -> str:
    # (1,2) -> 'p50'; (9,10) -> 'p90'; (99,100) -> 'p99'
    return f"p{100 * num // den}"


def group_quantiles(
    ds,
    group_key: str,
    value_key: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
    num_partitions: int | None = None,
):
    """EXACT per-group discrete quantiles via a value-count histogram
    exchange: per-batch partial reduce to ``(group, value, count)``, ONE
    group-key shuffle, block-local merge + cumulative-count rank lookup.

    Exactness contract: results equal DuckDB ``quantile_disc`` (value at
    1-indexed sorted position ``max(1, ceil(q*n))``), with the position
    computed as ``ceil(num*n/den)`` in integer arithmetic. The exchange
    carries per-group distinct values, so this is the right plan for
    discrete-ish value domains (lengths, counts, integer-unit scores);
    a continuous high-cardinality column degrades toward shipping the
    data and should use a mergeable sketch instead.

    Returns Dataset[(group_key, n, p50, p90, p99)] (labels from
    ``quantiles``).
    """
    labels = [_q_label(n, d) for n, d in quantiles]

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([group_key, value_key]).to_pandas()
        g = df.groupby([group_key, value_key], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([group_key, value_key], as_index=False)["cnt"].sum()
        merged = merged.sort_values([group_key, value_key])
        rows = []
        for gval, sub in merged.groupby(group_key, sort=True):
            counts = sub["cnt"].to_numpy()
            values = sub[value_key].to_numpy()
            cum = counts.cumsum()
            n = int(cum[-1])
            row = {group_key: gval, "n": n}
            for (qn, qd), lab in zip(quantiles, labels):
                pos = max(1, -(-qn * n // qd))  # ceil(qn*n/qd), 1-indexed
                # first histogram bin whose cumulative count reaches pos
                idx = int((cum >= pos).argmax())
                row[lab] = values[idx]
            rows.append(row)
        return pd.DataFrame(rows, columns=[group_key, "n", *labels])

    partials = ds.map_batches(arrow_out(local), batch_format="pyarrow")
    return grouped_blocks(
        partials, [group_key], final, num_partitions, batch_format="pandas"
    )


def robust_outliers(
    ds,
    group_key: str,
    value_key: str,
    id_col: str = "doc_id",
    mad_mult: float = 2.0,
    num_partitions: int | None = None,
):
    """Per-group robust outlier detection: rows with
    ``|value - median| > mad_mult * MAD`` where both the median and the
    MAD (median absolute deviation) are EXACT ``quantile_disc`` medians
    — the standard robust alternative to mean/stddev outlier rules,
    immune to the outliers it hunts.

    Scale shape: two value-count histogram exchanges (the
    :func:`group_quantiles` plan — partials carry per-group DISTINCT
    values, never rows) compute medians then MADs; the bounded
    per-group (median, MAD) table broadcasts via ``ray.put``; the final
    outlier scan is shuffle-free. Exchange cost is independent of row
    count for discrete value domains.
    Returns Dataset[(id_col, group_key, value_key)] — the outliers.
    """
    import numpy as np
    import ray

    if mad_mult <= 0:
        raise ValueError(f"mad_mult must be positive, got {mad_mult}")

    med_rows = group_quantiles(
        ds, group_key, value_key, quantiles=((1, 2),), num_partitions=num_partitions
    ).take_all()
    med = {r[group_key]: r["p50"] for r in med_rows}
    med_ref = ray.put(med)

    def dev(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(med_ref)
        df = batch.select([group_key, value_key]).to_pandas()
        base = df[group_key].map(m)
        return pd.DataFrame(
            {
                group_key: df[group_key],
                "dev": (df[value_key] - base).abs(),
            }
        )

    dev_ds = ds.map_batches(arrow_out(dev), batch_format="pyarrow")
    mad_rows = group_quantiles(
        dev_ds, group_key, "dev", quantiles=((1, 2),), num_partitions=num_partitions
    ).take_all()
    bounds = {
        r[group_key]: (med[r[group_key]], r["p50"]) for r in mad_rows
    }
    bounds_ref = ray.put(bounds)

    def pick(batch: pa.Table) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        df = batch.select([id_col, group_key, value_key]).to_pandas()
        meds = df[group_key].map(lambda g: b[g][0])
        mads = df[group_key].map(lambda g: b[g][1])
        mask = (df[value_key] - meds).abs() > mad_mult * mads
        return df[np.asarray(mask)].reset_index(drop=True)

    return ds.map_batches(arrow_out(pick), batch_format="pyarrow")


def group_zscore(ds, group_col: str = "source", value_col: str = "n_chars",
                 id_col: str = "doc_id", num_partitions=None):
    """Per-group z-score standardization (feature normalization before
    mixing quality signals across sources): two shuffle-free scans
    around one CONSTANT-SIZE reduce.

    Scan 1 pre-reduces each batch to per-group (n, sum, sumsq) rows —
    the exchange input is n_batches x n_groups rows regardless of
    corpus size; a coalesced combine folds them into one moments row
    per group (population sigma). The tiny moments table broadcasts
    via ``ray.put`` and scan 2 emits ``z = (x - mu) / sigma`` round6'd
    (sigma == 0 -> z = 0: a constant feature carries no signal).

    Returns Dataset[(id_col, group_col, value_col, z)].
    """
    import ray

    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pa.Table.from_arrays(
            [batch.column(group_col), batch.column(value_col)],
            names=["g", "v"],
        ).to_pandas()
        out = df.groupby("g", sort=False)["v"].agg(
            n="count", s="sum", ss=lambda x: float((x.astype(float) ** 2).sum())
        ).reset_index()
        out["s"] = out["s"].astype(float)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g", as_index=False)[["n", "s", "ss"]].sum()

    moments = coalesced_blocks(
        ds.map_batches(arrow_out(partial), batch_format="pyarrow"), combine
    ).take_all()  # one row per group — bounded by group cardinality
    stats = {}
    for r in moments:
        n, s, ss = float(r["n"]), float(r["s"]), float(r["ss"])
        mu = s / n
        var = max(ss / n - mu * mu, 0.0)
        stats[r["g"]] = (mu, var ** 0.5)
    ref = ray.put(stats)

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        groups = batch.column(group_col).to_pylist()
        vals = np.asarray(batch.column(value_col), dtype=np.float64)
        mus = np.array([st[g][0] for g in groups])
        sigmas = np.array([st[g][1] for g in groups])
        z = np.where(sigmas > 0, (vals - mus) / np.where(sigmas > 0, sigmas, 1.0), 0.0)
        return pa.Table.from_arrays(
            [batch.column(id_col), batch.column(group_col),
             batch.column(value_col),
             pa.array(round6(z), type=pa.float64())],
            names=[id_col, group_col, value_col, "z"],
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed radix selection: exact GLOBAL quantiles for unbounded domains
# ---------------------------------------------------------------------------

_INT64_MIN = -(1 << 63)


def order_keys(vals: np.ndarray) -> np.ndarray:
    """Order-preserving int64 key for a numeric array: integer dtypes map
    identically; float64 maps via the IEEE-754 bit trick (positive floats
    keep their bit pattern; negative floats take ``~bits + INT64_MIN``,
    which reverses their descending bit order and places them below every
    positive) so int64 key order == float total order. NaNs are NOT
    representable in a total order with quantile semantics — filter them
    upstream (``select_quantiles`` does)."""
    if np.issubdtype(vals.dtype, np.integer):
        return vals.astype(np.int64, copy=False)
    bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.int64)
    out = bits.copy()
    neg = bits < 0
    # (~bits) is in [0, 2^63-1] for negative bits; + INT64_MIN stays in range
    out[neg] = ~bits[neg] + np.int64(_INT64_MIN)
    return out


def key_to_value(key: int, float_domain: bool) -> float | int:
    """Inverse of :func:`order_keys` for one resolved key."""
    if not float_domain:
        return int(key)
    bits = key if key >= 0 else ~(key + (1 << 63))
    return float(np.array([bits], dtype=np.int64).view(np.float64)[0])


def _narrow_bracket(
    s: dict, buckets: np.ndarray, cnts: np.ndarray, lo: int, hi: int, w: int
) -> None:
    """One radix-selection narrowing step, shared by the global and
    per-group loops: walk the bucket histogram's cumulative counts to
    the bucket containing the residual rank, rebase the rank, and
    shrink [lo, hi] to that bucket. The invariant
    ``1 <= rank <= count(lo..hi)`` guarantees the argmax hits."""
    cum = cnts.cumsum()
    t = int((cum >= s["rank"]).argmax())
    bucket_id = int(buckets[t])
    s["rank"] -= int(cum[t - 1]) if t else 0
    s["lo"] = lo + bucket_id * w
    s["hi"] = min(hi, s["lo"] + w - 1)


def select_quantiles(
    ds,
    value_col: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
    float_domain: bool = True,
    n_buckets: int = 4096,
    num_partitions: int | None = None,
):
    """EXACT global quantiles over an UNBOUNDED-cardinality numeric column
    by distributed radix selection — the plan :func:`group_quantiles`'s
    docstring cedes: its histogram exchange carries every distinct value,
    which degrades to shipping the data on continuous domains (prices,
    scores, durations). This op never shuffles AT ALL:

      1. one projection scan maps the column to order-preserving int64
         keys (:func:`order_keys`) and materializes that single column
         (8 bytes/row in the object store — the only state kept);
      2. per round, one counting scan histograms every still-unresolved
         quantile's [lo, hi] range into ``n_buckets`` equal-width key
         buckets (per-batch bincount partials, nonzero entries only,
         combined via ``adaptive_final``);
      3. the driver walks each histogram's cumulative counts to the
         bucket containing rank ``max(1, ceil(q*n))`` (integer
         arithmetic — DuckDB ``quantile_disc`` parity, same contract as
         ``group_quantiles``), narrows [lo, hi] to it, and rebases the
         rank; a width-1 bucket IS the answer (the invariant
         ``1 <= rank <= count(lo..hi)`` guarantees the resolved key
         exists in the data).

    Driver state is O(active_quantiles x n_buckets) counts per round and
    the round count is ceil(64 / log2(n_buckets)) <= 6 — independent of
    corpus size, so the plan holds unchanged at 100 TB (the keyed column
    spills to the object store; every scan streams). Nulls/NaNs are
    dropped before keying (SQL aggregate semantics).

    Returns a pandas DataFrame [(label, n, value)] — O(#quantiles) rows,
    legitimately driver-sized. ``float_domain`` selects the key
    transform and the emitted value dtype; it must match the column.
    """
    import pyarrow.compute as pc

    from docstrange_ray.shuffle import adaptive_final

    def project(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        col = col.filter(
            pc.and_kleene(pc.is_valid(col), pc.invert(pc.is_nan(col)))
            if pa.types.is_floating(col.type)
            else pc.is_valid(col)
        )
        vals = np.asarray(col.to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(order_keys(vals), pa.int64())})

    keyed = ds.map_batches(project, batch_format="pyarrow").materialize()
    n = keyed.count()
    labels = [_q_label(qn, qd) for qn, qd in quantiles]
    if n == 0:
        return pd.DataFrame(columns=["label", "n", "value"])
    from ray.data.aggregate import Max, Min

    bounds = keyed.aggregate(Min("k"), Max("k"))
    searches = {
        i: {
            "lo": int(bounds["min(k)"]),
            "hi": int(bounds["max(k)"]),
            "rank": max(1, -(-qn * n // qd)),  # ceil(qn*n/qd), 1-indexed
        }
        for i, (qn, qd) in enumerate(quantiles)
    }

    while True:
        active = {
            i: (s["lo"], s["hi"], -(-(s["hi"] - s["lo"] + 1) // n_buckets))
            for i, s in searches.items()
            if s["lo"] < s["hi"]
        }
        if not active:
            break
        spec = sorted(active.items())  # closure-captured, O(#quantiles)

        def count_scan(batch: pa.Table, _spec=spec) -> pd.DataFrame:
            k = np.asarray(batch.column("k").to_numpy(zero_copy_only=False))
            sids, buckets, cnts = [], [], []
            for sid, (lo, hi, w) in _spec:
                inr = k[(k >= lo) & (k <= hi)]
                if not len(inr):
                    continue
                # wrapping int64 subtraction viewed as uint64 = the exact
                # unsigned difference even when keys span both int64 signs
                # (float domains use nearly the full key range)
                diff = (inr - np.int64(lo)).view(np.uint64)
                bc = np.bincount((diff // np.uint64(w)).astype(np.int64))
                nz = np.flatnonzero(bc)
                sids.extend([sid] * len(nz))
                buckets.extend(nz.tolist())
                cnts.extend(bc[nz].tolist())
            return pd.DataFrame(
                {
                    "sid": pd.Series(sids, dtype="int32"),
                    "bucket": pd.Series(buckets, dtype="int64"),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

        partials = keyed.map_batches(
            arrow_out(count_scan), batch_format="pyarrow"
        )
        merged = adaptive_final(
            partials,
            lambda df: df.groupby(["sid", "bucket"], as_index=False)["cnt"].sum(),
            keys=["sid", "bucket"],
            num_partitions=num_partitions,
        ).to_pandas()
        for sid, (lo, hi, w) in spec:
            sub = merged[merged["sid"] == sid].sort_values("bucket")
            _narrow_bracket(
                searches[sid],
                sub["bucket"].to_numpy(),
                sub["cnt"].to_numpy(),
                lo,
                hi,
                w,
            )

    return pd.DataFrame(
        {
            "label": labels,
            "n": np.int64(n),
            "value": [
                key_to_value(searches[i]["lo"], float_domain)
                for i in range(len(quantiles))
            ],
        }
    )


def winsorize(
    ds,
    value_col: str,
    lower=(1, 100),
    upper=(99, 100),
    float_domain: bool = True,
    num_partitions: int | None = None,
):
    """Winsorize a numeric column at exact global quantiles: values are
    clipped to [q_lower, q_upper] computed by :func:`select_quantiles`
    (scan-only radix selection — no shuffle), then one clip scan emits
    the bounded column. The standard robust-stats pretreatment before
    means/regressions on heavy-tailed data (prices, durations); SQL
    equivalent: LEAST(GREATEST(x, q_lo), q_hi).

    Returns Dataset[input columns + <value_col>_w] (clipped copy; the
    raw column is preserved for auditability)."""
    import pyarrow.compute as pc

    q = select_quantiles(
        ds,
        value_col,
        quantiles=(lower, upper),
        float_domain=float_domain,
        num_partitions=num_partitions,
    )
    if len(q) < 2:  # empty / all-null column: nothing to clip against
        def copy_col(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                f"{value_col}_w", batch.column(value_col)
            )

        return ds.map_batches(copy_col, batch_format="pyarrow")
    lo, hi = float(q["value"].iloc[0]), float(q["value"].iloc[1])
    if not float_domain:
        lo, hi = int(lo), int(hi)

    def clip(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        clipped = pc.min_element_wise(
            pc.max_element_wise(col, pa.scalar(lo, col.type)),
            pa.scalar(hi, col.type),
        )
        return batch.append_column(f"{value_col}_w", clipped)

    return ds.map_batches(clip, batch_format="pyarrow")


def group_select_quantiles(
    ds,
    group_key: str,
    value_col: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
    float_domain: bool = True,
    n_buckets: int = 4096,
    num_partitions: int | None = None,
):
    """EXACT per-GROUP quantiles over an unbounded-cardinality numeric
    column — the per-group twin of :func:`select_quantiles`, filling the
    remaining quadrant of the quantile matrix:

    ======================  =======================  =====================
    value domain            global                   per group
    ======================  =======================  =====================
    discrete (bounded)      group_quantiles(1 grp)   group_quantiles
    continuous (unbounded)  select_quantiles         THIS OP
    ======================  =======================  =====================

    Plan (radix selection, simultaneously for every (group, quantile)
    target): one projection scan keys the column order-preservingly
    (:func:`order_keys`) into a materialized (group, key) table; one
    bounded aggregate gets per-group (n, min, max); then <= 6 counting
    scans histogram every still-active target's [lo, hi] bracket into
    ``n_buckets`` equal-width key buckets and the driver narrows each
    bracket to the bucket containing rank ceil(q*n) (DuckDB
    ``quantile_disc`` parity, same integer-arithmetic contract as
    ``group_quantiles``). NO per-key shuffle ever happens — the exchange
    per round is the nonzero (group, quantile, bucket) counts, bounded
    by ``n_groups x n_quantiles x n_buckets`` regardless of corpus size,
    and a hot group costs exactly what a cold one does (counting is
    scan-local). Intended for BOUNDED group domains (sources, languages,
    flags — the curation case); driver state is
    O(n_groups x n_quantiles) brackets. Null groups and null/NaN values
    are dropped (SQL aggregate semantics).

    Returns a pandas DataFrame [(group_key, label, n, value)] —
    O(n_groups x n_quantiles) rows, legitimately driver-sized.
    """
    import pyarrow.compute as pc

    from docstrange_ray.shuffle import adaptive_final, arrow_out

    labels = [_q_label(qn, qd) for qn, qd in quantiles]

    def project(batch: pa.Table) -> pa.Table:
        tbl = batch.select([group_key, value_col])
        col = tbl.column(value_col)
        ok = pc.is_valid(col)
        if pa.types.is_floating(col.type):
            ok = pc.and_kleene(ok, pc.invert(pc.is_nan(col)))
        ok = pc.and_kleene(ok, pc.is_valid(tbl.column(group_key)))
        tbl = tbl.filter(ok)
        vals = np.asarray(tbl.column(value_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "g": tbl.column(group_key),
                "k": pa.array(order_keys(vals), pa.int64()),
            }
        )

    keyed = ds.map_batches(project, batch_format="pyarrow").materialize()

    def bounds_partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("g", as_index=False)["k"].agg(["size", "min", "max"])
        return agg.rename(columns={"size": "n", "min": "mn", "max": "mx"})

    def bounds_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g", as_index=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )

    bounds = adaptive_final(
        keyed.map_batches(arrow_out(bounds_partial), batch_format="pandas"),
        bounds_final,
        keys=["g"],
        num_partitions=num_partitions,
    ).to_pandas()
    if not len(bounds):
        return pd.DataFrame(columns=[group_key, "label", "n", "value"])

    # searches[(group, qi)] = bracket + residual rank within it
    searches: dict = {}
    for _, row in bounds.iterrows():
        for qi, (qn, qd) in enumerate(quantiles):
            searches[(row["g"], qi)] = {
                "lo": int(row["mn"]),
                "hi": int(row["mx"]),
                "rank": max(1, -(-qn * int(row["n"]) // qd)),
                "n": int(row["n"]),
            }

    while True:
        active = [
            (g, qi, s["lo"], s["hi"], -(-(s["hi"] - s["lo"] + 1) // n_buckets))
            for (g, qi), s in searches.items()
            if s["lo"] < s["hi"]
        ]
        if not active:
            break
        spec = sorted(active, key=lambda t: (str(t[0]), t[1]))

        def count_scan(batch: pa.Table, _spec=spec) -> pd.DataFrame:
            gv = batch.column("g").to_pandas().to_numpy()
            k = np.asarray(batch.column("k").to_numpy(zero_copy_only=False))
            # one mask per distinct group in the spec, reused across its
            # quantile targets (n_groups masks per batch, not n_targets)
            gmasks: dict = {}
            gs, qis, buckets, cnts = [], [], [], []
            for g, qi, lo, hi, w in _spec:
                m = gmasks.get(g)
                if m is None:
                    m = gmasks[g] = gv == g
                inr = k[m & (k >= lo) & (k <= hi)]
                if not len(inr):
                    continue
                # wrapping int64 subtraction viewed as uint64 (see
                # select_quantiles — float keys span both int64 signs)
                diff = (inr - np.int64(lo)).view(np.uint64)
                bc = np.bincount((diff // np.uint64(w)).astype(np.int64))
                nz = np.flatnonzero(bc)
                gs.extend([g] * len(nz))
                qis.extend([qi] * len(nz))
                buckets.extend(nz.tolist())
                cnts.extend(bc[nz].tolist())
            return pd.DataFrame(
                {
                    "g": gs,
                    "qi": pd.Series(qis, dtype="int32"),
                    "bucket": pd.Series(buckets, dtype="int64"),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

        partials = keyed.map_batches(arrow_out(count_scan), batch_format="pyarrow")
        merged = adaptive_final(
            partials,
            lambda df: df.groupby(["g", "qi", "bucket"], as_index=False)["cnt"].sum(),
            keys=["g", "qi", "bucket"],
            num_partitions=num_partitions,
        ).to_pandas()
        for g, qi, lo, hi, w in spec:
            sub = merged[(merged["g"] == g) & (merged["qi"] == qi)].sort_values(
                "bucket"
            )
            _narrow_bracket(
                searches[(g, qi)],
                sub["bucket"].to_numpy(),
                sub["cnt"].to_numpy(),
                lo,
                hi,
                w,
            )

    out_g, out_lab, out_n, out_v = [], [], [], []
    for _, row in bounds.sort_values("g").iterrows():
        for qi, lab in enumerate(labels):
            s = searches[(row["g"], qi)]
            out_g.append(row["g"])
            out_lab.append(lab)
            out_n.append(s["n"])
            out_v.append(key_to_value(s["lo"], float_domain))
    return pd.DataFrame(
        {
            group_key: out_g,
            "label": out_lab,
            "n": pd.Series(out_n, dtype="int64"),
            "value": out_v,
        }
    )


def _exact_sums(x: np.ndarray, y: np.ndarray):
    """Exact integer moment sums (Σx, Σy, Σxy, Σx², Σy²) over int64
    arrays: chunk length sized so every int64 chunk dot is PROVABLY
    under 2^62 (chunk * max_abs_product bounds the accumulator);
    values whose single product already reaches 2^62 (|v| ~ 2^31)
    fall back to Python bignums for the whole block — exactness
    first. Shared by group_corr / group_regression."""
    mx = int(np.abs(x).max(initial=0))
    my = int(np.abs(y).max(initial=0))
    maxprod = max(mx * mx, my * my, mx * my, 1)
    if maxprod >= 1 << 62:
        xi = [int(v) for v in x]
        yi = [int(v) for v in y]
        return (
            sum(xi),
            sum(yi),
            sum(a * b for a, b in zip(xi, yi)),
            sum(a * a for a in xi),
            sum(b * b for b in yi),
        )
    chunk = max(1, min(65536, (1 << 62) // maxprod))
    sx = sy = sxy = sxx = syy = 0
    for i in range(0, len(x), chunk):
        cx, cy = x[i : i + chunk], y[i : i + chunk]
        sx += int(cx.sum())
        sy += int(cy.sum())
        sxy += int(np.dot(cx, cy))
        sxx += int(np.dot(cx, cx))
        syy += int(np.dot(cy, cy))
    return sx, sy, sxy, sxx, syy


def group_corr(
    ds,
    group_key: str,
    x_col: str,
    y_col: str,
    x_to_int=None,
    y_to_int=None,
    num_partitions: int | None = None,
):
    """EXACT per-group Pearson correlation from ONE sufficient-statistics
    scan: each block reduces to a single row of integer moment sums per
    group — (n, Σx, Σy, Σxy, Σx², Σy²) — so the exchange carries
    ``n_blocks x n_groups`` rows at any corpus size and nothing float
    crosses it (the fixed-point-PageRank discipline: integer sums are
    reduction-order-independent, so the distributed result is BIT-equal
    to the SQL oracle's by construction).

    Exactness machinery: inputs are mapped to exact int64 units first
    (``x_to_int`` / ``y_to_int``, default round-to-int — use a cents
    transform for currency). Squared sums overflow int64 at corpus
    scale, so per-block dots are accumulated CHUNKED (4096-row int64
    dots, each bounded well under 2^63, combined in Python bignums) and
    the sums cross the exchange as DECIMAL STRINGS; the driver-side
    final re-parses and combines them exactly. The only floats ever
    produced are the final mirrored chain
    ``float(nΣxy-ΣxΣy) / (sqrt(float(nΣx²-Σx²)) * sqrt(float(nΣy²-Σy²)))``
    — IEEE round-to-nearest conversions and exact sqrt, reproducible in
    SQL as the same CAST/SQRT expression — rounded half-away to 6dp.

    Degenerate groups (n < 2 or zero variance in either column) are
    dropped (SQL ``corr`` would yield NULL).

    Returns a pandas DataFrame [(group_key, n, corr)] — O(n_groups)
    rows, legitimately driver-sized.
    """
    from docstrange_ray.numerics import round6, to_int_units
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if x_to_int is None:
        x_to_int = to_int_units()  # half-away: SQL ROUND mirror on ties
    if y_to_int is None:
        y_to_int = to_int_units()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([group_key, x_col, y_col]).to_pandas()
        df = df.dropna()
        rows = []
        for gval, sub in df.groupby(group_key, sort=False):
            x = x_to_int(sub[x_col].to_numpy())
            y = y_to_int(sub[y_col].to_numpy())
            sx, sy, sxy, sxx, syy = _exact_sums(x, y)
            rows.append(
                {
                    group_key: gval,
                    "n": np.int64(len(x)),
                    "sx": str(sx),
                    "sy": str(sy),
                    "sxy": str(sxy),
                    "sxx": str(sxx),
                    "syy": str(syy),
                }
            )
        return pd.DataFrame(
            rows,
            columns=[group_key, "n", "sx", "sy", "sxy", "sxx", "syy"],
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        import math

        out = []
        for gval, sub in df.groupby(group_key, sort=True):
            n = int(sub["n"].sum())
            sx = sum(int(v) for v in sub["sx"])
            sy = sum(int(v) for v in sub["sy"])
            sxy = sum(int(v) for v in sub["sxy"])
            sxx = sum(int(v) for v in sub["sxx"])
            syy = sum(int(v) for v in sub["syy"])
            denx = n * sxx - sx * sx
            deny = n * syy - sy * sy
            if n < 2 or denx <= 0 or deny <= 0:
                continue
            corr = float(n * sxy - sx * sy) / (
                math.sqrt(float(denx)) * math.sqrt(float(deny))
            )
            out.append(
                {group_key: gval, "n": np.int64(n), "corr": float(round6(corr))}
            )
        return pd.DataFrame(out, columns=[group_key, "n", "corr"])

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow")
    out = coalesced_blocks(partials, final).to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        return pd.DataFrame(columns=[group_key, "n", "corr"])
    return out


def group_regression(
    ds,
    group_key: str,
    x_col: str,
    y_col: str,
    x_to_int=None,
    y_to_int=None,
    num_partitions: int | None = None,
):
    """EXACT per-group simple (ordinary-least-squares) linear
    regression — slope and intercept of y on x — from the same ONE
    integer sufficient-statistics scan as :func:`group_corr`: per-block
    (n, Σx, Σy, Σxy, Σx²) bignum partials cross the exchange as
    decimal strings, so the distributed reduction is order-independent
    and BIT-equal to the SQL mirror by construction.

    Float chain (mirrored verbatim in the oracle — HUGEINT sums, then):
      slope     = CAST(nΣxy − ΣxΣy AS DOUBLE) / CAST(nΣx² − Σx² AS DOUBLE)
      intercept = (CAST(Σy AS DOUBLE) − slope·CAST(Σx AS DOUBLE)) / n
    both rounded half-away to 6dp. Groups with n < 2 or zero x-variance
    are dropped (SQL regr_slope would yield NULL).

    Returns pandas [(group_key, n, slope, intercept)] — O(n_groups)
    rows, legitimately driver-sized.
    """
    from docstrange_ray.numerics import round6, to_int_units
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if x_to_int is None:
        x_to_int = to_int_units()
    if y_to_int is None:
        y_to_int = to_int_units()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([group_key, x_col, y_col]).to_pandas()
        df = df.dropna()
        rows = []
        for gval, sub in df.groupby(group_key, sort=False):
            x = x_to_int(sub[x_col].to_numpy())
            y = y_to_int(sub[y_col].to_numpy())
            sx, sy, sxy, sxx, _syy = _exact_sums(x, y)
            rows.append(
                {
                    group_key: gval,
                    "n": np.int64(len(x)),
                    "sx": str(sx),
                    "sy": str(sy),
                    "sxy": str(sxy),
                    "sxx": str(sxx),
                }
            )
        return pd.DataFrame(
            rows, columns=[group_key, "n", "sx", "sy", "sxy", "sxx"]
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gval, sub in df.groupby(group_key, sort=True):
            n = int(sub["n"].sum())
            sx = sum(int(v) for v in sub["sx"])
            sy = sum(int(v) for v in sub["sy"])
            sxy = sum(int(v) for v in sub["sxy"])
            sxx = sum(int(v) for v in sub["sxx"])
            den = n * sxx - sx * sx
            if n < 2 or den <= 0:
                continue
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
            out.append(
                {
                    group_key: gval,
                    "n": np.int64(n),
                    "slope": float(round6(slope)),
                    "intercept": float(round6(intercept)),
                }
            )
        return pd.DataFrame(out, columns=[group_key, "n", "slope", "intercept"])

    partials = ds.map_batches(arrow_out(partial), batch_format="pyarrow")
    out = coalesced_blocks(partials, final).to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        return pd.DataFrame(columns=[group_key, "n", "slope", "intercept"])
    return out


def pareto_front(
    ds,
    x_col: str,
    y_col: str,
    x_to_int=None,
    y_to_int=None,
    minimize=(True, True),
    num_partitions: int | None = None,
):
    """2-D Pareto frontier (skyline): the DISTINCT (x, y) points not
    dominated by any other point (p dominates q iff p <= q in both
    objectives after direction normalization and p < q in at least
    one), plus the row count at each surviving point.

    Why this distributes well: the skyline operator admits a PERFECT
    local pre-reduce — a point dominated inside one block is dominated
    by a point that also reaches the final, so per-block skyline
    filtering is lossless (Börzsönyi, Kossmann & Stocker 2001, "The
    Skyline Operator"). For independently-distributed objectives the
    expected survivor count is O(ln n) per block, so the ONE coalesced
    final sees ~n_blocks x ln(block) candidate points regardless of
    corpus size; a pathological fully-anti-correlated input degrades
    toward shipping the distinct frontier itself, which is the answer's
    own size. Counts merge additively across blocks because a globally
    surviving point survives in EVERY block it appears in.

    All comparisons run on exact int64 objective units (``x_to_int`` /
    ``y_to_int``, default round-to-int) — no float order anywhere, so
    SQL NOT EXISTS oracles agree bit-for-bit. ``minimize=(bool, bool)``
    sets each objective's direction via sign flip. Nulls dropped.

    Returns a pandas DataFrame [(x, y, cnt)] sorted by x — frontier-
    sized, legitimately driver-sized for real objective domains.
    """
    from docstrange_ray.numerics import to_int_units
    from docstrange_ray.shuffle import arrow_out, coalesced_blocks

    if x_to_int is None:
        x_to_int = to_int_units()  # half-away: SQL ROUND mirror on ties
    if y_to_int is None:
        y_to_int = to_int_units()
    sx = 1 if minimize[0] else -1
    sy = 1 if minimize[1] else -1

    def _skyline(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized minimize-both skyline over distinct points."""
        df = df.sort_values(["x", "y"]).reset_index(drop=True)
        first_of_x = ~df["x"].duplicated()
        cand = df[first_of_x].reset_index(drop=True)
        # survive iff y strictly below every smaller-x point's min y
        prev_min = np.minimum.accumulate(cand["y"].to_numpy())
        keep = np.ones(len(cand), dtype=bool)
        keep[1:] = cand["y"].to_numpy()[1:] < prev_min[:-1]
        return cand[keep]

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([x_col, y_col]).to_pandas().dropna()
        pts = pd.DataFrame(
            {
                "x": sx * x_to_int(df[x_col].to_numpy()),
                "y": sy * y_to_int(df[y_col].to_numpy()),
            }
        )
        g = pts.groupby(["x", "y"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        sky = _skyline(g[["x", "y"]])
        return sky.merge(g, on=["x", "y"], how="left")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y"], as_index=False)["cnt"].sum()
        sky = _skyline(g[["x", "y"]])
        out = sky.merge(g, on=["x", "y"], how="left")
        out["x"] = sx * out["x"]
        out["y"] = sy * out["y"]
        return out.sort_values("x").reset_index(drop=True)

    out = coalesced_blocks(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"), final
    ).to_pandas()
    if out.empty:  # empty materialized Datasets lose their schema
        return pd.DataFrame(columns=["x", "y", "cnt"])
    return out


def group_mode(
    ds,
    group_key: str,
    value_key: str,
    num_partitions: int | None = None,
):
    """Per-group MODE (most frequent value; ties broken value-ascending
    — a total order, so the winner is deterministic across cluster
    sizes). Pre-reduced: per-block (group, value, cnt) partials before
    ONE group-key exchange — a group with a billion rows ships its
    per-block distinct-value histogram, never rows.

    SQL equivalent: ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY cnt DESC, v) = 1`` over grouped counts.

    Returns Dataset[(group_key, mode, mode_cnt, n)].
    """
    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([group_key, value_key]).to_pandas().dropna()
        g = df.groupby([group_key, value_key], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([group_key, value_key], as_index=False)["cnt"].sum()
        merged = merged.sort_values(
            [group_key, "cnt", value_key], ascending=[True, False, True]
        )
        tot = merged.groupby(group_key)["cnt"].sum()
        top = merged.groupby(group_key, as_index=False).head(1)
        return pd.DataFrame(
            {
                group_key: top[group_key].to_numpy(),
                "mode": top[value_key].to_numpy(),
                "mode_cnt": top["cnt"].to_numpy().astype(np.int64),
                "n": tot.loc[top[group_key]].to_numpy().astype(np.int64),
            }
        )

    return grouped_blocks(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        [group_key],
        final,
        num_partitions,
        batch_format="pandas",
    )


def group_entropy(
    ds,
    group_key: str,
    value_key: str,
    num_partitions: int | None = None,
):
    """Per-group Shannon entropy (nats) of a bounded-cardinality value
    column — the composition-diversity diagnostic ("how mixed is each
    source's language distribution?"). Same pre-reduced histogram
    exchange as :func:`group_mode`; each value's term
    ``(c/n) * ln(n/c)`` is quantized to a micro-unit integer
    ``floor(1e6 * term + 0.5)`` BEFORE summation (order-independent
    ints; Python/libm and DuckDB evaluate the mirrored float chain
    bit-identically — pinned over a 6k-point grid in tests), so
    ``entropy_micro`` is bit-equal to SQL.

    Returns Dataset[(group_key, n, n_values, entropy_micro)].
    """
    import math

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([group_key, value_key]).to_pandas().dropna()
        g = df.groupby([group_key, value_key], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([group_key, value_key], as_index=False)["cnt"].sum()
        rows = []
        for gval, sub in merged.groupby(group_key, sort=True):
            cnts = [int(c) for c in sub["cnt"]]
            n = sum(cnts)
            h = sum(
                math.floor(1_000_000.0 * (c / n) * math.log(n / c) + 0.5)
                for c in cnts
            )
            rows.append(
                {
                    group_key: gval,
                    "n": np.int64(n),
                    "n_values": np.int64(len(cnts)),
                    "entropy_micro": np.int64(h),
                }
            )
        return pd.DataFrame(
            rows, columns=[group_key, "n", "n_values", "entropy_micro"]
        )

    return grouped_blocks(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        [group_key],
        final,
        num_partitions,
        batch_format="pandas",
    )


def weighted_select_quantiles(
    ds,
    value_col: str,
    weight_col: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
    float_domain: bool = True,
    n_buckets: int = 4096,
    num_partitions: int | None = None,
):
    """EXACT global WEIGHTED quantiles by the same never-shuffles radix
    selection as :func:`select_quantiles`, with bucket COUNTS replaced
    by bucket WEIGHT SUMS: the q-quantile is the smallest
    positive-weight value whose cumulative weight w(x <= v) crosses
    ``T = ceil(qn * W / qd)`` (all int64 — the crossing test
    ``qd * cumw >= qn * W`` is exact cross-multiplication, mirrored
    verbatim by a SQL window cumsum). Weights must be positive int64
    (rows with w <= 0 or null are dropped, like SQL aggregate nulls);
    int64 bound: W = sum(w) < 2^63 / max(qd).

    Same scale contract as the unweighted op: one 16-byte-per-row
    projection materialization, <= 6 counting scans, driver state
    O(#quantiles x n_buckets). Returns pandas
    [(label, w_total, value)].
    """
    import pyarrow.compute as pc

    from docstrange_ray.shuffle import adaptive_final, arrow_out

    def project(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        wcol = batch.column(weight_col).cast(pa.int64())
        ok = pc.and_kleene(
            pc.and_kleene(pc.is_valid(col), pc.is_valid(wcol)),
            pc.greater(wcol, pa.scalar(0, pa.int64())),
        )
        if pa.types.is_floating(col.type):
            ok = pc.and_kleene(ok, pc.invert(pc.is_nan(col)))
        col = col.filter(ok)
        wcol = wcol.filter(ok)
        vals = np.asarray(col.to_numpy(zero_copy_only=False))
        return pa.table(
            {"k": pa.array(order_keys(vals), pa.int64()),
             "w": wcol}
        )

    keyed = ds.map_batches(project, batch_format="pyarrow").materialize()
    labels = [_q_label(qn, qd) for qn, qd in quantiles]
    wtot = keyed.sum("w") or 0
    if wtot == 0:
        return pd.DataFrame(columns=["label", "w_total", "value"])
    from ray.data.aggregate import Max, Min

    bounds = keyed.aggregate(Min("k"), Max("k"))
    searches = {
        i: {
            "lo": int(bounds["min(k)"]),
            "hi": int(bounds["max(k)"]),
            "rank": max(1, -(-qn * int(wtot) // qd)),  # ceil(qn*W/qd)
        }
        for i, (qn, qd) in enumerate(quantiles)
    }

    while True:
        active = {
            i: (s["lo"], s["hi"], -(-(s["hi"] - s["lo"] + 1) // n_buckets))
            for i, s in searches.items()
            if s["lo"] < s["hi"]
        }
        if not active:
            break
        spec = sorted(active.items())

        def weight_scan(batch: pa.Table, _spec=spec) -> pd.DataFrame:
            k = np.asarray(batch.column("k").to_numpy(zero_copy_only=False))
            wv = np.asarray(batch.column("w").to_numpy(zero_copy_only=False))
            sids, buckets, cnts = [], [], []
            for sid, (lo, hi, w) in _spec:
                m = (k >= lo) & (k <= hi)
                if not m.any():
                    continue
                inr = k[m]
                inw = wv[m].astype(np.int64)
                diff = (inr - np.int64(lo)).view(np.uint64)
                idx = (diff // np.uint64(w)).astype(np.int64)
                # int64 scatter-add (np.bincount sums in float64, which
                # silently loses exactness past 2^53 total weight)
                bci = np.zeros(int(idx.max()) + 1, dtype=np.int64)
                np.add.at(bci, idx, inw)
                nz = np.flatnonzero(bci)
                sids.extend([sid] * len(nz))
                buckets.extend(nz.tolist())
                cnts.extend(bci[nz].tolist())
            return pd.DataFrame(
                {
                    "sid": pd.Series(sids, dtype="int32"),
                    "bucket": pd.Series(buckets, dtype="int64"),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

        partials = keyed.map_batches(
            arrow_out(weight_scan), batch_format="pyarrow"
        )
        merged = adaptive_final(
            partials,
            lambda df: df.groupby(["sid", "bucket"], as_index=False)["cnt"].sum(),
            keys=["sid", "bucket"],
            num_partitions=num_partitions,
        ).to_pandas()
        for sid, (lo, hi, w) in spec:
            sub = merged[merged["sid"] == sid].sort_values("bucket")
            _narrow_bracket(
                searches[sid],
                sub["bucket"].to_numpy(),
                sub["cnt"].to_numpy(),
                lo,
                hi,
                w,
            )

    return pd.DataFrame(
        {
            "label": labels,
            "w_total": np.int64(int(wtot)),
            "value": [
                key_to_value(searches[i]["lo"], float_domain)
                for i in range(len(quantiles))
            ],
        }
    )
