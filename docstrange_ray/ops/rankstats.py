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
