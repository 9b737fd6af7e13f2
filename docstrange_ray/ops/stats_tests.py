"""Distributed statistical tests over bounded-cardinality columns:
chi-square independence and two-sample Kolmogorov-Smirnov.

Both are one-pre-reduced-exchange shapes (the contingency table /
value histogram is what crosses the wire, never rows) and both keep
every reduction in EXACT INTEGERS so the distributed result is
bit-equal to a SQL oracle by construction (the fixed-point-PageRank
discipline):

  * chi-square: each cell's term (O - E)^2 / E with E = row*col/n is
    the rational (O*n - row*col)^2 / (n*row*col); it is quantized to a
    micro-unit integer with FLOOR division BEFORE the sum (quantize-
    before-reduce — float term sums would be order-dependent). The
    <= 1e-6-per-cell quantization is a documented, deterministic bias,
    irrelevant at test-statistic magnitudes.
  * KS: D = max_v |F_a(v) - F_b(v)| compared by CROSS-MULTIPLICATION
    (|cum_a*n_b - cum_b*n_a| over the common denominator n_a*n_b) so
    the argmax is exact integer arithmetic; only the final reported
    statistic is a (mirrored, rounded) float.

Cardinality contract: the exchange carries the DISTINCT value/cell
histogram (group_quantiles' contract) — right for label/category/
length-like domains; continuous domains should be binned first.

The reference has no statistics module at all; this family serves the
corpus-curation questions ("is quality independent of source?", "did
the length distribution drift between snapshots?") that a 100-TB
pipeline answers before retraining.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CHI2_SCALE = 1_000_000


def contingency_counts(ds, col_a: str, col_b: str, num_partitions=None):
    """Dataset[(a, b, cnt)] — the pre-reduced contingency exchange:
    per-block pair counts before ONE hash exchange."""
    from docstrange_ray.shuffle import adaptive_final, arrow_out

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([col_a, col_b]).to_pandas().dropna()
        out = df.groupby([col_a, col_b], as_index=False).size()
        return out.rename(columns={"size": "cnt", col_a: "a", col_b: "b"})

    return adaptive_final(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        lambda df: df.groupby(["a", "b"], as_index=False)["cnt"].sum(),
        keys=["a", "b"],
        num_partitions=num_partitions,
    )


def chi2_independence(ds, col_a: str, col_b: str, num_partitions=None):
    """Pearson chi-square test of independence between two bounded-
    cardinality columns. Returns a one-row DataFrame
    [(n, rows, cols, dof, chi2_micro)] where ``chi2_micro`` is the
    exact integer Σ_cells floor(1e6 * (O*n - row*col)^2 / (n*row*col))
    — see module docstring for why the quantization happens per cell.
    """
    ct = contingency_counts(ds, col_a, col_b, num_partitions).to_pandas()
    if ct.empty:
        return pd.DataFrame(
            columns=["n", "rows", "cols", "dof", "chi2_micro"]
        )
    ra = ct.groupby("a")["cnt"].sum().to_dict()
    cb = ct.groupby("b")["cnt"].sum().to_dict()
    n = int(ct["cnt"].sum())
    # observed-cell lookup built ONCE (O(cells)), not re-filtered per
    # row category; every a x b combination contributes, including
    # zero-observed cells
    obs = ct.set_index(["a", "b"])["cnt"].to_dict()
    chi2_micro = 0
    for av, rtot in ra.items():
        rt = int(rtot)
        for bv, ctot in cb.items():
            o = int(obs.get((av, bv), 0))
            ctt = int(ctot)
            num = o * n - rt * ctt
            chi2_micro += (CHI2_SCALE * num * num) // (n * rt * ctt)
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "rows": pd.Series([len(ra)], dtype="int64"),
            "cols": pd.Series([len(cb)], dtype="int64"),
            "dof": pd.Series([(len(ra) - 1) * (len(cb) - 1)], dtype="int64"),
            "chi2_micro": pd.Series([chi2_micro], dtype="int64"),
        }
    )


def ks_two_sample(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    num_partitions=None,
):
    """Two-sample Kolmogorov-Smirnov distance between ``value_col``'s
    distributions under two group labels. ONE pre-reduced exchange of
    (value, cnt_a, cnt_b); the final sorts the merged histogram once
    and takes D = max |cum_a*n_b - cum_b*n_a| / (n_a*n_b) with the max
    found in exact integers. Returns a one-row DataFrame
    [(n_a, n_b, d_num, d)] — ``d_num`` the exact integer numerator,
    ``d`` the mirrored 6dp float.
    """
    from docstrange_ray.numerics import round6
    from docstrange_ray.shuffle import adaptive_final, arrow_out, coalesced_blocks

    def local(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([value_col, group_col]).to_pandas().dropna()
        df = df[df[group_col].isin([group_a, group_b])]
        g = df.groupby([value_col, group_col], as_index=False).size()
        out = pd.DataFrame(
            {
                "v": g[value_col],
                "ca": np.where(g[group_col] == group_a, g["size"], 0),
                "cb": np.where(g[group_col] == group_b, g["size"], 0),
            }
        )
        return out.groupby("v", as_index=False)[["ca", "cb"]].sum()

    hist = adaptive_final(
        ds.map_batches(arrow_out(local), batch_format="pyarrow"),
        lambda df: df.groupby("v", as_index=False)[["ca", "cb"]].sum(),
        keys=["v"],
        num_partitions=num_partitions,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        na = int(df["ca"].sum())
        nb = int(df["cb"].sum())
        if na == 0 or nb == 0:
            return pd.DataFrame(columns=["n_a", "n_b", "d_num", "d"])
        # exact: |cum_a*n_b - cum_b*n_a|, common denominator n_a*n_b.
        # object dtype keeps the products in Python bignums (1e12-scale
        # cumsums x counts overflow int64 at corpus scale).
        ca = df["ca"].to_numpy(dtype=object).cumsum()
        cbm = df["cb"].to_numpy(dtype=object).cumsum()
        diffs = np.abs(ca * nb - cbm * na)
        d_num = int(max(diffs))
        if d_num >= 1 << 63:
            # the exact-integer witness column is int64-bounded (as is
            # the BIGINT oracle): past ~3e9 rows PER GROUP, report the
            # statistic from a quantile-binned or sampled column instead
            raise ValueError(
                f"ks_two_sample: exact D numerator {d_num} exceeds "
                "int64 (group sizes ~> 3e9); bin or sample the column"
            )
        # mirror SQL's evaluation exactly: CAST num AS DOUBLE, CAST den
        # AS DOUBLE, divide — two RN conversions, not Python's single
        # correctly-rounded bignum division (differs past 2^53)
        return pd.DataFrame(
            {
                "n_a": pd.Series([na], dtype="int64"),
                "n_b": pd.Series([nb], dtype="int64"),
                "d_num": pd.Series([d_num], dtype="int64"),
                "d": [float(round6(float(d_num) / float(na * nb)))],
            }
        )

    out = coalesced_blocks(hist, final).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["n_a", "n_b", "d_num", "d"])
    return out
